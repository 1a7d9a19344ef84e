"""
DepthPro-class monocular depth estimator (Flax)
===============================================

TPU-native replacement for the reference's opaque ONNX DepthPro model
(/root/reference/depth_map_generator.py:39-40: 1536x1536 fp16 bs=1 ONNX via
onnxruntime). We own the architecture, so inference is batched, bf16, and
pjit-shardable (TP over ViT heads/MLP, DP over frames).

Architecture (multi-scale ViT, after Apple's "Depth Pro: Sharp Monocular
Metric Depth in Less Than a Second"):

  input [B, 1536, 1536, 3] in [-1, 1]
    ├── scale pyramid: 1536, 768, 384 (bilinear)
    ├── overlapping 384^2 tiles:  5x5 @ stride 288 | 3x3 @ stride 192 | 1
    │     all 35 tiles batched through ONE shared "patch" ViT-L/16 pass
    │     (intermediate blocks hooked for the finest scale)
    ├── whole-image "image" ViT on the 384 downsample (global context)
    ├── tile features mosaicked back (overlap-trimmed) into feature maps:
    │     fine 96^2, mid 48^2, coarse 24^2 (+ 2 hook maps at 96^2)
    ├── DPT-style fusion decoder: project -> top-down residual fusion with
    │     x2 upsampling: 24 -> 48 -> 96 -> 192 -> 384
    ├── depth head: 384 -> 768 -> 1536, 1 channel, relu
    │     output: canonical inverse depth ("nearness": larger = closer —
    │     exactly what the stereo warp expects and what the saved depth maps
    │     hold after min-max normalization, depth_map_generator.py:217-230)
    └── FOV head on coarse+global features -> field of view (deg), used to
          convert canonical inverse depth to metric depth.

The tiling is pure reshape/slice (static shapes), the mosaic is
concatenation — everything jit- and shard-friendly. The 35-tile batch rides
the batch axis, so a B-frame call runs the ViT on 35*B tiles in one MXU-dense
pass instead of the reference's 35 sequential windows inside ONNX.
"""

from __future__ import annotations

import dataclasses
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
    hook_block_ids: tuple[int, int] = (5, 11)
    decoder_dim: int = 256
    # projection dims for [hook0, hook1, fine, mid, coarse+global]
    dims_encoder: tuple[int, ...] = (256, 256, 512, 1024, 1024)
    use_fov_head: bool = True
    dtype: Any = jnp.float32

    def __post_init__(self):
        # Tiling invariants: the 5x5 fine tiles at stride 0.75*tile must
        # cover the input exactly (img = 4*tile), and the overlap-trim
        # arithmetic needs the per-tile token grid divisible by 8
        # (fine trim = grid/8, mid trim = grid/4).
        if self.img_size != 4 * self.tile_size:
            raise ValueError(
                f"img_size ({self.img_size}) must be 4 * tile_size "
                f"({self.tile_size})")
        grid = self.tile_size // self.encoder.patch_size
        if grid * self.encoder.patch_size != self.tile_size or grid % 8 != 0:
            raise ValueError(
                f"tile_size/patch_size token grid ({grid}) must be a "
                "multiple of 8")

    @staticmethod
    def tiny() -> "DepthProConfig":
        """Small config with identical topology for tests: 96^2 input,
        24^2 tiles (8x8 tokens), shallow ViT."""
        return DepthProConfig(
            img_size=96,
            tile_size=24,
            encoder=ViTConfig(img_size=24, patch_size=3, embed_dim=32,
                              depth=4, num_heads=2),
            hook_block_ids=(0, 2),
            decoder_dim=16,
            dims_encoder=(16, 16, 24, 32, 32),
        )


def preprocess_frames(rgb_u8):
    """uint8 [B, H, W, 3] RGB -> model input in [-1, 1]
    (x / 127.5 - 1, the DepthPro normalization the reference applies on the
    host, depth_map_generator.py:94). Runs on device."""
    return rgb_u8.astype(jnp.float32) / 127.5 - 1.0


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
    trimming `trim` overlap rows/cols from interior tile edges."""
    B = feats.shape[0]
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


class ResidualConvUnit(nn.Module):
    dim: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.dim, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.dim, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv2")(h)
        return x + h


class FusionBlock(nn.Module):
    """DPT feature-fusion: optional skip merge, residual refinement,
    x2 nearest upsample + conv."""
    dim: int
    dtype: Any

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            x = x + ResidualConvUnit(self.dim, self.dtype, name="rcu_skip")(skip)
        x = ResidualConvUnit(self.dim, self.dtype, name="rcu")(x)
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, 2 * H, 2 * W, C), method="nearest")
        return nn.Conv(self.dim, (3, 3), padding="SAME", dtype=self.dtype,
                       param_dtype=jnp.float32, name="out_conv")(x)


class DepthPro(nn.Module):
    cfg: DepthProConfig = DepthProConfig()

    @nn.compact
    def __call__(self, images):
        """images: [B, S, S, 3] in [-1, 1] (S = cfg.img_size).

        Returns dict with:
          canonical_inverse_depth: [B, S, S]  (relative nearness)
          fov_deg: [B] predicted horizontal field of view
          inverse_depth: metric inverse depth (canonical * w / f_px)
        """
        cfg = self.cfg
        B, S, _, _ = images.shape
        tile = cfg.tile_size
        grid = tile // cfg.encoder.patch_size  # tokens per tile side

        # ---- scale pyramid (bilinear, matches the paper's downsampling)
        x_full = images.astype(cfg.dtype)
        x_half = jax.image.resize(x_full, (B, S // 2, S // 2, 3), "bilinear")
        x_quar = jax.image.resize(x_full, (B, tile, tile, 3), "bilinear")

        # ---- overlapping tiles, all batched through one ViT pass
        n_f = (S - tile) // (3 * tile // 4) + 1          # stride = 0.75*tile
        n_m = (S // 2 - tile) // (tile // 2) + 1         # stride = 0.5*tile
        tiles_f = _tile(x_full, tile, 3 * tile // 4)     # [B,nf,nf,t,t,3]
        tiles_m = _tile(x_half, tile, tile // 2)         # [B,nm,nm,t,t,3]

        flat_f = tiles_f.reshape(B * n_f * n_f, tile, tile, 3)
        flat_m = tiles_m.reshape(B * n_m * n_m, tile, tile, 3)
        all_tiles = jnp.concatenate([flat_f, flat_m, x_quar], axis=0)

        patch_vit = ViT(cfg.encoder, hook_block_ids=cfg.hook_block_ids,
                        name="patch_encoder")
        tokens, hooks = patch_vit(all_tiles)

        nf2, nm2 = B * n_f * n_f, B * n_m * n_m
        D = cfg.encoder.embed_dim

        def split_fine(tok):
            m = _tokens_to_map(tok[:nf2], grid)
            m = m.reshape(B, n_f, n_f, grid, grid, D)
            # overlap in feature space: tile grid minus stride grid
            trim = (grid - (3 * grid // 4)) // 2
            return _mosaic(m, n_f, trim)

        feat_fine = split_fine(tokens)                       # [B, Gf, Gf, D]
        hook0 = split_fine(hooks[cfg.hook_block_ids[0]])
        hook1 = split_fine(hooks[cfg.hook_block_ids[1]])

        m_mid = _tokens_to_map(tokens[nf2:nf2 + nm2], grid)
        m_mid = m_mid.reshape(B, n_m, n_m, grid, grid, D)
        feat_mid = _mosaic(m_mid, n_m, (grid - grid // 2) // 2)

        feat_coarse = _tokens_to_map(tokens[nf2 + nm2:], grid)  # [B, g, g, D]

        # ---- global context from the separate image encoder
        img_tokens, _ = ViT(cfg.encoder, name="image_encoder")(x_quar)
        feat_global = _tokens_to_map(img_tokens, grid)

        # ---- project to pyramid dims and lift the hooks to higher res
        dd = cfg.decoder_dim
        dt = cfg.dtype

        def proj(x, dim, name):
            return nn.Conv(dim, (1, 1), dtype=dt, param_dtype=jnp.float32,
                           name=name)(x)

        def up(x, factor, name):
            B_, H_, W_, C_ = x.shape
            x = jax.image.resize(x, (B_, H_ * factor, W_ * factor, C_),
                                 "bilinear")
            return nn.Conv(x.shape[-1], (3, 3), padding="SAME", dtype=dt,
                           param_dtype=jnp.float32, name=name)(x)

        # level resolutions (feature-grid sizes), finest first:
        #   L0: 4*Gq, L1: 2*Gq... with Gq = S/patch/4 etc. Concretely for
        #   1536/16: L0=384? -> we use hook maps upsampled x4 and x2 from 96.
        p0 = up(proj(hook0, cfg.dims_encoder[0], "proj_hook0"), 4, "up_hook0")
        p1 = up(proj(hook1, cfg.dims_encoder[1], "proj_hook1"), 2, "up_hook1")
        p2 = proj(feat_fine, cfg.dims_encoder[2], "proj_fine")
        p3 = proj(feat_mid, cfg.dims_encoder[3], "proj_mid")
        p4 = proj(feat_coarse + feat_global, cfg.dims_encoder[4],
                  "proj_coarse")

        # ---- DPT fusion decoder, coarse -> fine. The deepest level gets a
        # skip-less fusion (upsampling it to the next level's resolution),
        # then each finer level merges as a skip and upsamples again.
        levels = [p4, p3, p2, p1, p0]
        x = FusionBlock(dd, dt, name="fusion_deep")(proj(levels[0], dd, "dec_in"))
        for idx, skip in enumerate(levels[1:]):
            skip_p = proj(skip, dd, f"dec_skip{idx}")
            x = FusionBlock(dd, dt, name=f"fusion{idx}")(x, skip_p)
        # x is now at 2 * (finest level) resolution

        # ---- depth head: refine + resize to the full input resolution
        h = nn.Conv(dd // 2, (3, 3), padding="SAME", dtype=dt,
                    param_dtype=jnp.float32, name="head_conv1")(x)
        if h.shape[1] != S:
            h = jax.image.resize(h, (h.shape[0], S, S, h.shape[-1]),
                                 "bilinear")
        h = nn.Conv(32, (3, 3), padding="SAME", dtype=dt,
                    param_dtype=jnp.float32, name="head_conv2")(h)
        h = nn.relu(h)
        h = nn.Conv(1, (1, 1), dtype=dt, param_dtype=jnp.float32,
                    name="head_out")(h)
        canonical = nn.relu(h[..., 0]).astype(jnp.float32)   # [B, S, S]

        out = {"canonical_inverse_depth": canonical}

        # ---- FOV head (coarse + global features -> degrees)
        if cfg.use_fov_head:
            f = nn.Conv(dd, (3, 3), padding="SAME", dtype=dt,
                        param_dtype=jnp.float32, name="fov_conv")(p4)
            f = nn.relu(f)
            f = jnp.mean(f, axis=(1, 2))
            f = nn.Dense(1, dtype=dt, param_dtype=jnp.float32,
                         name="fov_out")(f)[..., 0]
            fov_deg = 30.0 + 60.0 * nn.sigmoid(f)            # [B], 30..90
            out["fov_deg"] = fov_deg.astype(jnp.float32)
            # metric inverse depth: canonical scaled by W / f_px,
            # f_px = 0.5 * W / tan(fov/2)
            tan_half = jnp.tan(jnp.deg2rad(out["fov_deg"]) / 2.0)
            out["inverse_depth"] = canonical * (2.0 * tan_half)[:, None, None]
        else:
            out["inverse_depth"] = canonical
        return out
