"""
DepthPro monocular depth estimator (Flax) — architecture-exact
==============================================================

TPU-native replacement for the reference's opaque ONNX DepthPro model
(/root/reference/depth_map_generator.py:39-40, 303-324: 1536x1536 fp16 bs=1
ONNX via onnxruntime). We own the architecture, so inference is batched,
bf16, and pjit-shardable (TP over ViT heads/MLP, DP over frames).

The module graph mirrors Apple ml-depth-pro ("Depth Pro: Sharp Monocular
Metric Depth in Less Than a Second") tensor-for-tensor so the official
``depth_pro.pt`` checkpoint maps 1:1 (see models/convert.py). Structure:

  input [B, 1536, 1536, 3] in [-1, 1]
    ├── scale pyramid 1536 / 768 / 384 (bilinear, torch align_corners=False
    │     semantics: an exact 2-tap average — see _downscale2tap)
    ├── overlapping 384^2 tiles: 5x5 @ stride 288 | 3x3 @ stride 192 | 1x1,
    │     all 35 tiles batched through ONE shared "patch" ViT-L/16 pass;
    │     blocks 5 and 11 are hooked for the two high-res latent maps
    ├── whole-image "image" ViT on the 384 downsample (global context)
    ├── tile features mosaicked back with overlap trim (96^2 fine, 48^2 mid,
    │     24^2 coarse, 96^2 hooks)
    ├── encoder upsample stack (learned ConvTranspose 2x2/s2 chains):
    │     hook5 -> 768^2 @256 | hook11 -> 384^2 @256 | fine -> 192^2 @512 |
    │     mid -> 96^2 @1024 | coarse -> 48^2 @1024 | image -> 48^2 @1024,
    │     coarse+image fused by a 1x1 conv
    ├── multires conv decoder: 3x3 projections to 256 + five feature-fusion
    │     blocks (pre-activation residual units, deconv upsampling),
    │     coarse -> fine, output 768^2 @256
    ├── depth head: conv -> deconv(-> 1536^2) -> conv -> relu -> 1x1 -> relu
    │     output: canonical inverse depth ("nearness": larger = closer —
    │     exactly what the stereo warp expects and what the saved depth maps
    │     hold after min-max normalization, depth_map_generator.py:217-230)
    └── FOV head: a third ViT on the 384 downsample + the projected global
          feature -> horizontal field of view (deg) for metric depth.

The tiling is pure slice/concat (static shapes), every ConvTranspose is a
2x2/stride-2 non-overlapping deconv (MXU-dense), and the 35-tile batch rides
the batch axis — a B-frame call runs the ViT on 35*B tiles in one pass
instead of the reference's 35 sequential windows inside ONNX.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from vsc_tpu.models.vit import ViT, ViTConfig

__all__ = ["DepthProConfig", "DepthPro", "preprocess_frames"]


@dataclasses.dataclass(frozen=True)
class DepthProConfig:
    img_size: int = 1536
    tile_size: int = 384
    encoder: ViTConfig = ViTConfig()
    # patch-encoder blocks tapped for the high-res latents: hook_block_ids[0]
    # feeds the 3-deconv chain (768^2), hook_block_ids[1] the 2-deconv chain
    # (384^2) — Apple's (5, 11) for the 24-block ViT-L.
    hook_block_ids: tuple[int, int] = (5, 11)
    # fusion/decoder width (Apple decoder_features / HF fusion_hidden_size)
    decoder_features: int = 256
    # encoder feature dims [latent, fine, mid, coarse] (Apple
    # encoder_feature_dims = (256, 512, 1024, 1024))
    dims_encoder: tuple[int, int, int, int] = (256, 512, 1024, 1024)
    use_fov_head: bool = True
    # Apple's full model runs a third ViT for the FOV branch; without it the
    # FOV head works from the decoder's global feature alone.
    use_fov_encoder: bool = True
    dtype: Any = jnp.float32

    def __post_init__(self):
        # Tiling invariants: the 5x5 fine tiles at stride 0.75*tile must
        # cover the input exactly (img = 4*tile), and the overlap-trim
        # arithmetic needs the per-tile token grid divisible by 8
        # (fine trim = grid/8, mid trim = grid/4); grid/4 also sizes the
        # FOV head's final valid conv.
        if self.img_size != 4 * self.tile_size:
            raise ValueError(
                f"img_size ({self.img_size}) must be 4 * tile_size "
                f"({self.tile_size})")
        grid = self.tile_size // self.encoder.patch_size
        if grid * self.encoder.patch_size != self.tile_size or grid % 8 != 0:
            raise ValueError(
                f"tile_size/patch_size token grid ({grid}) must be a "
                "multiple of 8")

    @property
    def grid(self) -> int:
        return self.tile_size // self.encoder.patch_size

    @staticmethod
    def tiny() -> "DepthProConfig":
        """Small config with identical topology for tests: 64^2 input,
        16^2 tiles (8x8 tokens), shallow ViT."""
        return DepthProConfig(
            img_size=64,
            tile_size=16,
            encoder=ViTConfig(img_size=16, patch_size=2, embed_dim=32,
                              depth=4, num_heads=2),
            hook_block_ids=(0, 2),
            decoder_features=16,
            dims_encoder=(16, 24, 32, 32),
        )


def preprocess_frames(rgb_u8):
    """uint8 [B, H, W, 3] RGB -> model input in [-1, 1]
    (x / 127.5 - 1, the DepthPro normalization the reference applies on the
    host, depth_map_generator.py:94). Runs on device."""
    return rgb_u8.astype(jnp.float32) / 127.5 - 1.0


def _downscale2tap(x, factor: int):
    """torch F.interpolate(scale_factor=1/factor, mode='bilinear',
    align_corners=False) for even integer factors: each output center lands
    exactly between two input pixels (src = i*f + (f-1)/2), so the resample
    is a 2-tap average with stride f — strided slices, no gathers."""
    f = factor
    x = (x[:, f // 2 - 1::f] + x[:, f // 2::f]) * 0.5
    x = (x[:, :, f // 2 - 1::f] + x[:, :, f // 2::f]) * 0.5
    return x


def _tile(images, tile: int, stride: int):
    """Split [B, S, S, C] into overlapping tiles -> [B, n, n, tile, tile, C]."""
    B, S, _, C = images.shape
    n = (S - tile) // stride + 1
    rows = []
    for i in range(n):
        cols = []
        for j in range(n):
            cols.append(images[:, i * stride:i * stride + tile,
                               j * stride:j * stride + tile, :])
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # [B, n, n, tile, tile, C]


def _mosaic(feats, n: int, trim: int):
    """Inverse of _tile in feature space: [B, n, n, t, t, C] -> [B, G, G, C],
    trimming `trim` overlap rows/cols from interior tile edges (the merge
    padding of the original model)."""
    t = feats.shape[3]
    rows = []
    for i in range(n):
        cols = []
        for j in range(n):
            f = feats[:, i, j]
            y0, y1 = (0 if i == 0 else trim), (t if i == n - 1 else t - trim)
            x0, x1 = (0 if j == 0 else trim), (t if j == n - 1 else t - trim)
            cols.append(f[:, y0:y1, x0:x1, :])
        rows.append(jnp.concatenate(cols, axis=2))
    return jnp.concatenate(rows, axis=1)


def _tokens_to_map(tokens, grid: int):
    """[N, 1+T, D] -> [N, grid, grid, D] (cls dropped)."""
    return tokens[:, 1:, :].reshape(tokens.shape[0], grid, grid, -1)


# --------------------------------------------------------------------------
# building blocks (torch-equivalent conv semantics)


class ConvT2x2(nn.Module):
    """ConvTranspose2d(kernel=2, stride=2, padding=0): non-overlapping
    learned 2x upsample. The kernel parameter is stored [2, 2, in, out]
    (torch's [in, out, 2, 2] transposed at conversion); the op is a regular
    conv over the 2x-dilated input with the kernel spatially flipped, which
    XLA lowers to the conv backward-data path.

    NOTE: a matmul + depth-to-space reformulation (each output pixel
    depends on exactly ONE input pixel) measures ~2x faster standalone
    (scripts/profile_deconv.py) but 1.5-2x SLOWER in the full model — the
    [B,H,W,2,2,O] interleave temporaries defeat XLA's fusion of the
    surrounding convs. Measured both ways on v5e; keep the conv form."""
    features: int
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, kernel_only: bool = False):
        I = x.shape[-1]
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (2, 2, I, self.features), jnp.float32)
        if kernel_only:
            # expose the parameter for chain composition (ProjUpsample)
            # without computing; x supplies only the channel count.
            # Composition math assumes bias-free maps, and returning here
            # would leave a use_bias instance's params tree without its
            # 'bias' leaf (checkpoint-shape mismatch).
            assert not self.use_bias, "kernel_only requires use_bias=False"
            return k
        import os
        from vsc_tpu.ops.deconv_pallas import (deconv2x2_pallas,
                                               deconv2x2_supported)
        # Pallas path (r3): the lhs-dilated conv lowering measured ~5% of
        # bandwidth roofline; the kernel interleaves in VMEM instead.
        # MEASURED SLOWER on the axon TPU v5 (depth 152.2 -> 168.1 ms/frame,
        # /tmp/bench_r3d): Mosaic lowers the [W, 2, O] -> [2W, O] column
        # interleave as per-element sublane/lane shuffles — the third deconv
        # reformulation to lose to XLA's conv path in-context (see ProjUpsample
        # and the ConvT2x2 docstring). Default OFF; VSC_TPU_PALLAS_DECONV=1
        # opts in. Same SPMD gating as the attention kernel: single-device
        # TPU programs (a pallas_call is not partitionable under pjit).
        use_pallas = (os.environ.get("VSC_TPU_PALLAS_DECONV", "0") == "1"
                      and jax.default_backend() == "tpu"
                      and jax.device_count() == 1
                      and deconv2x2_supported(x, self.features))
        if use_pallas:
            b = (self.param("bias", nn.initializers.zeros_init(),
                            (self.features,), jnp.float32)
                 if self.use_bias else None)
            return deconv2x2_pallas(x.astype(self.dtype), k, b)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), k[::-1, ::-1].astype(self.dtype),
            window_strides=(1, 1), padding=((1, 1), (1, 1)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros_init(),
                           (self.features,), jnp.float32)
            y = y + b.astype(self.dtype)
        return y


def _conv(features, kernel, name, *, stride=1, use_bias=True,
          dtype=jnp.float32):
    """Conv2d with torch padding semantics (pad k//2 on both sides)."""
    pad = kernel // 2
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=((pad, pad), (pad, pad)), use_bias=use_bias,
                   dtype=dtype, param_dtype=jnp.float32, name=name)


def _compose_deconv2x2(kernels):
    """Compose a chain of bias-free 2x2/s2 ConvTranspose kernels (each
    [2, 2, Cin, Cout]) into the single equivalent 2^n x 2^n / s2^n kernel.

    Non-overlapping stride-2 deconvs are linear maps where out[2i+a, 2j+b]
    depends on in[i, j] alone, so chaining k layers gives
    out[2^k i + u, 2^k j + v] = in[i, j] @ K[u, v] with
    K[2a+p, 2b+q] = sum_m A[a, b, :, m] B[p, q, m, :] — an exact algebraic
    identity, applied at trace time (the per-layer parameters stay separate
    so checkpoints map 1:1)."""
    k = kernels[0]
    for nxt in kernels[1:]:
        f = k.shape[0]
        # [f,f,C,M] x [2,2,M,O] -> [2f,2f,C,O] at index (2a+p, 2b+q)
        k = jnp.einsum("abcm,pqmo->apbqco", k, nxt)
        k = k.reshape(2 * f, 2 * f, k.shape[4], k.shape[5])
    return k


class ProjUpsample(nn.Module):
    """Apple's _create_project_upsample_block: 1x1 conv projection followed
    by n_upsample ConvTranspose 2x2/s2 layers, all bias-free.

    `mosaic` (optional): a spatial rearrangement applied AFTER the 1x1
    projection. A 1x1 conv is per-pixel, so it commutes with the tile
    mosaic exactly — projecting the per-tile token maps first and
    mosaicking the PROJECTED features moves the mosaic's slice/concat
    relayout from 1024 channels to dim_int (4x fewer bytes for the hook
    latents), with identical math and the identical parameter tree.
    Measured perf-neutral on the axon v5e (depth 151.9 -> 151.8 ms/frame,
    r4) — XLA was already fusing the mosaic cheaply — kept for the smaller
    intermediate footprint.

    The composed single 2^n-factor deconv (one [Cin, f*f*Cout] matmul per
    input pixel + one depth-to-space) MEASURED SLOWER than the plain chain
    on the axon TPU v5 (+0.9 ms/frame depth, r3 bisect /tmp/b_nofuse):
    the 6-D depth-to-space transpose with tiny minor dims loses more to
    tiling than the chain's intermediates cost, matching the round-2
    finding that standalone-deconv rewrites lose in-context. Default OFF;
    VSC_TPU_FUSED_UPSAMPLE=1 opts in."""
    dim_out: int
    n_upsample: int
    dim_int: int | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mosaic=None):
        import os
        dim_int = self.dim_int if self.dim_int is not None else self.dim_out
        x = _conv(dim_int, 1, "proj", use_bias=False, dtype=self.dtype)(x)
        if mosaic is not None:
            x = mosaic(x)
        fuse = (self.n_upsample >= 2
                and os.environ.get("VSC_TPU_FUSED_UPSAMPLE", "0") == "1")
        if not fuse:
            for i in range(self.n_upsample):
                x = ConvT2x2(self.dim_out, use_bias=False, dtype=self.dtype,
                             name=f"deconv{i}")(x)
            return x
        kernels = []
        cin = x.shape[-1]
        for i in range(self.n_upsample):
            mod = ConvT2x2(self.dim_out, use_bias=False, dtype=self.dtype,
                           name=f"deconv{i}")
            kernels.append(mod(jnp.zeros((1, 1, 1, cin), x.dtype),
                               kernel_only=True))
            cin = self.dim_out
        kc = _compose_deconv2x2(kernels).astype(self.dtype)  # [f,f,C,O]
        f = 2 ** self.n_upsample
        B, H, W, C = x.shape
        O = self.dim_out
        w = kc.transpose(2, 0, 1, 3).reshape(C, f * f * O)   # [C, (u,v,O)]
        y = jnp.einsum("bhwc,cd->bhwd", x, w,
                       preferred_element_type=self.dtype)
        y = y.reshape(B, H, W, f, f, O)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(B, H * f, W * f, O)
        return y


class PreActResidual(nn.Module):
    """DPT pre-activation residual unit: x + conv(relu(conv(relu(x))))."""
    dim: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = _conv(self.dim, 3, "conv1", dtype=self.dtype)(h)
        h = nn.relu(h)
        h = _conv(self.dim, 3, "conv2", dtype=self.dtype)(h)
        return x + h


class FeatureFusion(nn.Module):
    """Apple FeatureFusionBlock2d: optional skip merge through a residual
    unit, refinement residual unit, 2x deconv (except the finest level),
    1x1 output projection."""
    dim: int
    deconv: bool
    dtype: Any

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            x = x + PreActResidual(self.dim, self.dtype, name="resnet1")(skip)
        x = PreActResidual(self.dim, self.dtype, name="resnet2")(x)
        if self.deconv:
            x = ConvT2x2(self.dim, use_bias=False, dtype=self.dtype,
                         name="deconv")(x)
        return _conv(self.dim, 1, "out_conv", dtype=self.dtype)(x)


# --------------------------------------------------------------------------
# encoder / decoder / fov


class DepthProEncoder(nn.Module):
    """Multi-scale tiling ViT encoder + learned upsample stack. Returns the
    five feature maps finest-first:
      [latent0 @S/2, latent1 @S/4, fine @S/8, mid @S/16, global @S/32]
    with channels [decoder_features, dims[0], dims[1], dims[2], dims[3]]."""
    cfg: DepthProConfig

    @nn.compact
    def __call__(self, images):
        cfg = self.cfg
        B, S, _, _ = images.shape
        tile = cfg.tile_size
        grid = cfg.grid
        dt = cfg.dtype

        # ---- scale pyramid (each scale resampled from the original)
        x_full = images.astype(dt)
        x_half = _downscale2tap(x_full, 2)
        x_quar = _downscale2tap(x_full, 4)          # == tile resolution

        # ---- overlapping tiles, all batched through one ViT pass
        n_f = (S - tile) // (3 * tile // 4) + 1     # stride 0.75*tile -> 5
        n_m = (S // 2 - tile) // (tile // 2) + 1    # stride 0.5*tile  -> 3
        tiles_f = _tile(x_full, tile, 3 * tile // 4)
        tiles_m = _tile(x_half, tile, tile // 2)

        flat_f = tiles_f.reshape(B * n_f * n_f, tile, tile, 3)
        flat_m = tiles_m.reshape(B * n_m * n_m, tile, tile, 3)
        all_tiles = jnp.concatenate([flat_f, flat_m, x_quar], axis=0)

        nf2, nm2 = B * n_f * n_f, B * n_m * n_m
        # hook_batch=nf2: only the fine tiles' hook rows are consumed below,
        # so the mid/coarse rows are dropped at the hook site (exact — a
        # slice of the residual stream; frees ~30% of each hook tensor's HBM
        # liveness across the remaining transformer blocks).
        patch_vit = ViT(cfg.encoder, hook_block_ids=cfg.hook_block_ids,
                        hook_batch=nf2, name="patch_encoder")
        tokens, hooks = patch_vit(all_tiles)
        trim_f = (grid - 3 * grid // 4) // 2        # merge padding (fine)
        trim_m = (grid - grid // 2) // 2            # merge padding (mid)

        # Tile maps stay PER-TILE here; the mosaic (slice/concat relayout of
        # the overlap-trimmed tiles) runs inside each ProjUpsample AFTER its
        # 1x1 projection — a per-pixel op commutes with the rearrangement,
        # so the relayout moves from D=1024 channels to the projected width
        # (4x fewer bytes for the 256-wide hook latents), identical math.
        def fine_maps(tok):
            return _tokens_to_map(tok[:nf2], grid)      # [B*25, G, G, .]

        def mosaic_fine(m):
            m = m.reshape(B, n_f, n_f, grid, grid, m.shape[-1])
            return _mosaic(m, n_f, trim_f)              # [B, 4G, 4G, .]

        def mosaic_mid(m):
            m = m.reshape(B, n_m, n_m, grid, grid, m.shape[-1])
            return _mosaic(m, n_m, trim_m)              # [B, 2G, 2G, .]

        maps_fine = fine_maps(tokens)
        maps_h0 = fine_maps(hooks[cfg.hook_block_ids[0]])
        maps_h1 = fine_maps(hooks[cfg.hook_block_ids[1]])
        maps_mid = _tokens_to_map(tokens[nf2:nf2 + nm2], grid)
        feat_coarse = _tokens_to_map(tokens[nf2 + nm2:], grid)

        # ---- global context from the separate image encoder
        img_tokens, _ = ViT(cfg.encoder, name="image_encoder")(x_quar)
        feat_global = _tokens_to_map(img_tokens, grid)

        # ---- learned upsample stack (Apple encoder.upsample_* naming)
        dims = cfg.dims_encoder
        latent0 = ProjUpsample(cfg.decoder_features, 3, dim_int=dims[0],
                               dtype=dt, name="upsample_latent0")(
                                   maps_h0, mosaic=mosaic_fine)
        latent1 = ProjUpsample(dims[0], 2, dtype=dt,
                               name="upsample_latent1")(
                                   maps_h1, mosaic=mosaic_fine)
        fine = ProjUpsample(dims[1], 1, dtype=dt, name="upsample0")(
            maps_fine, mosaic=mosaic_fine)
        mid = ProjUpsample(dims[2], 1, dtype=dt, name="upsample1")(
            maps_mid, mosaic=mosaic_mid)
        coarse = ProjUpsample(dims[3], 1, dtype=dt,
                              name="upsample2")(feat_coarse)
        glob = ConvT2x2(dims[3], use_bias=True, dtype=dt,
                        name="upsample_lowres")(feat_global)
        glob = _conv(dims[3], 1, "fuse_lowres", dtype=dt)(
            jnp.concatenate([coarse, glob], axis=-1))

        return [latent0, latent1, fine, mid, glob]


class MultiresConvDecoder(nn.Module):
    """Apple MultiresConvDecoder: per-level projections to decoder width
    (identity at the finest level whose channels already match) + a
    coarse-to-fine feature-fusion cascade. Returns (features @S/2,
    projected_global @S/32) — the latter feeds the FOV head."""
    cfg: DepthProConfig

    @nn.compact
    def __call__(self, encodings):
        cfg = self.cfg
        dd = cfg.decoder_features
        dt = cfg.dtype
        # conv_0 is the identity (latent0 channels == decoder width)
        projected = [encodings[0]]
        for i, enc in enumerate(encodings[1:], start=1):
            projected.append(
                _conv(dd, 3, f"conv_{i}", use_bias=False, dtype=dt)(enc))

        x = FeatureFusion(dd, deconv=True, dtype=dt,
                          name="fusion_4")(projected[4])
        for i in (3, 2, 1):
            x = FeatureFusion(dd, deconv=True, dtype=dt,
                              name=f"fusion_{i}")(x, projected[i])
        x = FeatureFusion(dd, deconv=False, dtype=dt,
                          name="fusion_0")(x, projected[0])
        return x, projected[4]


class FOVNetwork(nn.Module):
    """Apple FOVNetwork: a third ViT on the 384 downsample (optional) added
    to the strided-down global decoder feature, then a conv funnel to a
    single horizontal-FOV scalar (degrees, no activation)."""
    cfg: DepthProConfig

    @nn.compact
    def __call__(self, images, global_feature):
        cfg = self.cfg
        dd = cfg.decoder_features
        dt = cfg.dtype
        grid = cfg.grid

        # downsample the global feature 2*grid -> grid
        x = _conv(dd // 2, 3, "downsample_conv", stride=2,
                  dtype=dt)(global_feature)
        x = nn.relu(x)

        if cfg.use_fov_encoder:
            x_quar = _downscale2tap(images.astype(dt), 4)
            tokens, _ = ViT(cfg.encoder, name="encoder_vit")(x_quar)
            tokens = nn.Dense(dd // 2, dtype=dt, param_dtype=jnp.float32,
                              name="encoder_linear")(tokens)
            x = _tokens_to_map(tokens, grid) + x

        h = _conv(math.ceil(dd / 4), 3, "head_conv0", stride=2, dtype=dt)(x)
        h = nn.relu(h)
        h = _conv(math.ceil(dd / 8), 3, "head_conv1", stride=2, dtype=dt)(h)
        h = nn.relu(h)
        # final valid conv collapses the remaining grid/4 map to a scalar
        k = grid // 4
        h = nn.Conv(1, (k, k), padding="VALID", dtype=dt,
                    param_dtype=jnp.float32, name="head_out")(h)
        return h.reshape(h.shape[0]).astype(jnp.float32)  # [B] degrees


class DepthPro(nn.Module):
    cfg: DepthProConfig = DepthProConfig()

    @nn.compact
    def __call__(self, images):
        """images: [B, S, S, 3] in [-1, 1] (S = cfg.img_size).

        Returns dict with:
          canonical_inverse_depth: [B, S, S]  (relative nearness)
          fov_deg: [B] predicted horizontal field of view (if enabled)
          inverse_depth: metric inverse depth (canonical * W / f_px)
        """
        cfg = self.cfg
        dd = cfg.decoder_features
        dt = cfg.dtype
        S = images.shape[1]

        encodings = DepthProEncoder(cfg, name="encoder")(images)
        feats, glob = MultiresConvDecoder(cfg, name="decoder")(encodings)

        # ---- depth head (Apple head.0/.1/.2/.4)
        h = _conv(dd // 2, 3, "head_conv1", dtype=dt)(feats)
        h = ConvT2x2(dd // 2, use_bias=True, dtype=dt, name="head_deconv")(h)
        h = _conv(32, 3, "head_conv2", dtype=dt)(h)
        h = nn.relu(h)
        h = _conv(1, 1, "head_out", dtype=dt)(h)
        h = nn.relu(h)
        canonical = h[..., 0].astype(jnp.float32)           # [B, S', S']

        out = {"canonical_inverse_depth": canonical}

        if cfg.use_fov_head:
            fov_deg = FOVNetwork(cfg, name="fov")(images, glob)
            out["fov_deg"] = fov_deg
            # metric inverse depth: canonical scaled by W / f_px with
            # f_px = 0.5 * W / tan(fov/2)  =>  W / f_px = 2 tan(fov/2)
            tan_half = jnp.tan(jnp.deg2rad(fov_deg) / 2.0)
            out["inverse_depth"] = canonical * (2.0 * tan_half)[:, None, None]
        else:
            out["inverse_depth"] = canonical
        return out
