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


# --------------------------------------------------------------------------
# SBS stage roofline (VERDICT r2 #5): a bytes-and-vector-ops model of the
# stereo program (ops/stereo.py), so "is N ms/frame good?" has an answer and
# kernel optimization has a stop condition.

# TPU v5e HBM bandwidth (per chip).
V5E_HBM_BW = 819e9
# Effective VPU throughput for elementwise f32 multiply-add work, and the
# slowdown factor for transcendentals (exp). Calibrated on the axon v5e with
# scripts/calibrate_vpu.py (a fused multiply-add chain and an exp chain over
# an HBM-resident tensor, extrapolated to compute-bound occupancy).
V5E_VPU_F32 = 3.9e12
TRANSCENDENTAL_COST = 8.0


def sbs_roofline(height: int, width: int, params=None) -> dict:
    """Per-frame speed-of-light estimate for the SBS program.

    Each stage is modeled as max(bytes / HBM_BW, vector_ops / VPU): minimal
    HBM traffic = read inputs once + write outputs once at f32 (what a
    perfectly fused kernel chain would move), and the irreducible VPU work
    of its filter taps. MXU work (tap-matmul resizes) is negligible here
    (<1% of V5E_PEAK_BF16) and is folded into the bytes term.

    Returns {"ms": total, "stages": {name: (bytes, vops, ms)}}.
    """
    from vsc_tpu.config.stereo_params import StereoParams
    params = params or StereoParams()

    from vsc_tpu.ops.stereo import sbs_shapes
    s = sbs_shapes(height, width, params)
    H, W = height, width
    SW = s["stretched_w"]
    UH, UW = s["up_h"], s["up_w"]
    CW = s["crop_w"]
    F = 4.0  # f32 bytes

    px_in = H * W
    px_st = H * SW
    px_up = UH * UW

    stages: dict[str, tuple[float, float]] = {}

    # 1. lanczos4 stretch (rgb+depth) + quantize; separable 8-tap resample:
    #    bytes = read in + write out; vops ~ 8 madds/px/axis (W axis only
    #    changes) for 4 channels
    stages["stretch"] = ((px_in + px_st) * 4 * F, px_st * 8 * 4)
    # 2. depth min-max normalize (reduce + rescale)
    stages["normalize"] = (px_st * 2 * F, px_st * 3)
    # 3. supersample rgb (3ch) + depth bilinear (2-tap per axis)
    if params.super_sampling > 1.0:
        stages["supersample"] = ((px_st + px_up) * 4 * F, px_up * 4 * 4)
    # 4. edge softening: separable gaussian k taps x 2 passes on depth
    if params.edge_softness > 0:
        k = max(5, min(int(params.edge_softness * 6) | 1, 31))
        stages["soften"] = (px_up * 2 * F, px_up * 2 * k)
    if params.depth_gamma != 1.0:
        stages["gamma"] = (px_up * 2 * F,
                           px_up * 2 * TRANSCENDENTAL_COST)
    # 6. forward warp: read rgb planes + depth once, write 2 eyes + 2 masks.
    #    vops: each output pixel tests the disparity candidates that can
    #    land on it — the kernel's predicated shift groups make this
    #    content-dependent; the bound assumes ~1/4 of the max_disparity
    #    shift range is live per block on scene-like depth.
    disp_px = params.max_disparity * (UW / SW if params.super_sampling > 1.0
                                      else 1.0)
    live_shifts = max(4.0, disp_px / 4.0)
    stages["warp"] = ((4 + 8) * px_up * F, 2 * px_up * live_shifts * 6)
    # 7. postprocess per eye x2: quarter-res pyramid estimate (read img+mask,
    #    write quarter) + fused bilateral/dilate/fill/polish (read eye, mask,
    #    quarter estimate; write eye).
    pp_bytes = 2 * ((4 + 1) * px_up + px_up / 16) * F \
        + 2 * ((4 + 1 + 3.0 / 16) * px_up + 3 * px_up) * F
    vops = 0.0
    if params.artifact_smoothing > 0:
        d = max(5, min(int(params.artifact_smoothing * 4), 15))
        r = d // 2
        taps = 3.14159 * r * r  # disc
        # per tap: 3ch diff+abs-sum (4), exp (8), 4 madds -> ~16 slots
        vops += 2 * px_up * taps * (8 + TRANSCENDENTAL_COST)
    vops += 2 * px_up * 9 * 2          # dilate3x3 + hole predication
    vops += 2 * px_up * 3 * 4 * 3      # 3 frontier fill sweeps, 4-nb, 3ch
    stages["postprocess"] = (pp_bytes, vops)
    # 9-10. crop+unsharp+area downscale (fused finish): read cropped eyes,
    #    write 2 x [H, W, 3]; vops: 5-tap separable blur x2 + sharpen.
    fin_px = UH * CW
    stages["finish"] = (2 * (fin_px + H * W) * 3 * F,
                        2 * fin_px * 3 * (10 + 3))
    # SBS pack to u8
    stages["pack"] = (2 * H * W * 3 * (F + 1), 0.0)

    out = {}
    total_ms = 0.0
    for name, (nbytes, nvops) in stages.items():
        ms = 1000.0 * max(nbytes / V5E_HBM_BW, nvops / V5E_VPU_F32)
        out[name] = {"bytes": nbytes, "vops": nvops, "ms": round(ms, 3)}
        total_ms += ms
    return {"ms": round(total_ms, 2), "stages": out}
