"""
Analytic FLOP counts for the DepthPro forward pass
==================================================

Exact multiply-add counts (x2 for FLOPs) of every matmul/conv in the
architecture, used to report MFU against the accelerator's peak in
BASELINE.md and the bench detail. Elementwise work (norms, gelu, softmax)
is excluded — on the MXU roofline it is bandwidth, not FLOPs.
"""

from __future__ import annotations

__all__ = ["vit_flops", "depthpro_flops", "V5E_PEAK_BF16"]

# TPU v5e peak dense bf16 throughput (per chip).
V5E_PEAK_BF16 = 197e12


def vit_flops(cfg, n_images: int) -> float:
    """One ViT forward over n_images tiles of cfg.img_size."""
    T = cfg.num_patches + 1
    D = cfg.embed_dim
    hidden = int(D * cfg.mlp_ratio)
    patch_macs = cfg.num_patches * D * 3 * cfg.patch_size ** 2
    per_block = (
        T * D * 3 * D          # qkv
        + 2 * T * T * (D // cfg.num_heads) * cfg.num_heads  # qk^T + pv
        + T * D * D            # attn out proj
        + 2 * T * D * hidden   # fc1 + fc2
    )
    return 2.0 * n_images * (patch_macs + cfg.depth * per_block)


def depthpro_flops(cfg, batch: int) -> float:
    """Full DepthPro forward (encoder upsample stack + decoder + heads)."""
    enc = cfg.encoder
    grid = cfg.tile_size // enc.patch_size
    D = enc.embed_dim
    dd = cfg.decoder_features
    dims = cfg.dims_encoder
    S = cfg.img_size
    g0 = 4 * grid          # merged fine / hook grid
    n_tiles = 25 + 9 + 1

    total = vit_flops(enc, batch * n_tiles)         # patch encoder
    total += vit_flops(enc, batch)                  # image encoder
    if cfg.use_fov_head and cfg.use_fov_encoder:
        total += vit_flops(enc, batch)              # fov encoder

    def conv(px, cin, cout, k=3):
        return 2.0 * batch * px * cin * cout * k * k

    def deconv(out_px, cin, cout):                  # 2x2/s2: 1 tap per output
        return 2.0 * batch * out_px * cin * cout

    # encoder upsample stack
    total += conv(g0 ** 2, D, dims[0], 1)                      # latent0 proj
    total += deconv((2 * g0) ** 2, dims[0], dd)
    total += deconv((4 * g0) ** 2, dd, dd)
    total += deconv((8 * g0) ** 2, dd, dd)
    total += conv(g0 ** 2, D, dims[0], 1)                      # latent1 proj
    total += deconv((2 * g0) ** 2, dims[0], dims[0])
    total += deconv((4 * g0) ** 2, dims[0], dims[0])
    total += conv(g0 ** 2, D, dims[1], 1)                      # fine
    total += deconv((2 * g0) ** 2, dims[1], dims[1])
    total += conv((g0 // 2) ** 2, D, dims[2], 1)               # mid
    total += deconv(g0 ** 2, dims[2], dims[2])
    total += conv(grid ** 2, D, dims[3], 1)                    # coarse
    total += deconv((2 * grid) ** 2, dims[3], dims[3])
    total += deconv((2 * grid) ** 2, D, dims[3])               # lowres
    total += conv((2 * grid) ** 2, 2 * dims[3], dims[3], 1)    # fuse

    # decoder projections (conv_0 is identity)
    lv = {1: (4 * g0) ** 2, 2: (2 * g0) ** 2, 3: g0 ** 2,
          4: (g0 // 2) ** 2}
    chan = {1: dims[0], 2: dims[1], 3: dims[2], 4: dims[3]}
    for i in range(1, 5):
        total += conv(lv[i], chan[i], dd)
    # fusion blocks: resnets (2 convs each) + deconv + 1x1 out
    px = {4: lv[4], 3: lv[3], 2: lv[2], 1: lv[1], 0: (8 * g0) ** 2}
    for i in (4, 3, 2, 1, 0):
        n_res = 2 if i == 4 else 4   # fusion_4 has no skip resnet applied
        total += n_res * conv(px[i], dd, dd)
        out_px = px[i - 1] if i > 0 else px[0]
        if i > 0:
            total += deconv(out_px, dd, dd)
        total += conv(out_px if i > 0 else px[0], dd, dd, 1)   # out_conv

    # depth head
    head_in = px[0]
    total += conv(head_in, dd, dd // 2)
    total += deconv(4 * head_in, dd // 2, dd // 2)
    total += conv(4 * head_in, dd // 2, 32)
    total += conv(4 * head_in, 32, 1, 1)

    if cfg.use_fov_head:
        import math
        total += conv((2 * grid) ** 2 // 4, dd, dd // 2)       # downsample s2
        if cfg.use_fov_encoder:
            T = enc.num_patches + 1
            total += 2.0 * batch * T * D * (dd // 2)           # neck linear
        total += conv(grid ** 2 // 4, dd // 2, math.ceil(dd / 4))
        total += conv(grid ** 2 // 16, math.ceil(dd / 4), math.ceil(dd / 8))
        k = grid // 4
        total += 2.0 * batch * math.ceil(dd / 8) * k * k
    return total
