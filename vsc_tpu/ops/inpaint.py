"""
On-device hole filling
======================

Replaces the reference's cv2.inpaint(..., INPAINT_TELEA, radius=3) step
(/root/reference/helper/stereo_core.py:436-457), which forced a host
round-trip per eye per frame.

Telea fills pixels in increasing distance from the hole boundary, each as a
distance-weighted average of already-known pixels in a small neighborhood.
We reproduce that propagation structure on-device with *frontier sweeps*:
each iteration fills every hole pixel with known pixels inside a radius-2
disc (inverse-distance weights) and marks it known — iteration k fills the
band at chamfer distance ~2k, the same fill order Telea's priority queue
produces. Hole interiors beyond the sweeps' reach take a masked push-pull
pyramid estimate, and a few Jacobi passes smooth the filled region the way
Telea's large-neighborhood averaging does.

Cost/quality point (measured against cv2 Telea on warped frames in the fill
harness): radius-2 x 5 sweeps + 4 polish reaches SSIM 0.992 in hole regions
on worst-case noise content — within 0.001 of a radius-3 x 6 configuration
at 2.6x less VPU work. The sweep loop is scan-carried so XLA double-buffers
instead of keeping every sweep's full-resolution intermediates live.

All sweeps are element-wise [B, H, W, C] ops — pure VPU work, XLA-fusable,
no host transfer.
"""

from __future__ import annotations

import math

__all__ = ["pyramid_inpaint"]

def _disc(radius: int):
    return [(dy, dx, 1.0 / math.hypot(dy, dx))
            for dy in range(-radius, radius + 1)
            for dx in range(-radius, radius + 1)
            if (dy, dx) != (0, 0) and dy * dy + dx * dx <= radius * radius + 1]


# Frontier sweeps at radius 2 (propagation reach/cost point, measured in
# round 1); the polish re-average uses cv2.inpaint's radius-3 neighborhood
# (stereo_core.py:457). Measured vs cv2 Telea on worst-case noise: this
# split reaches the same ~2-code-value hole residual as radius-3 sweeps at
# ~60% of the VPU work. Defaults sweeps=3/polish=1: measured SSIM vs the
# oracle on realistic, noise, AND supersampled-geometry content is equal or
# slightly HIGHER than the round-1 5/2 (a second polish pass over-smooths
# relative to Telea; interiors beyond the sweep reach are handled by the
# pyramid estimate identically), at ~45 ms/frame less VPU work in the
# fused kernel at 1080p defaults.
_RADIUS = 2
_POLISH_RADIUS = 3
_OFFSETS = _disc(_RADIUS)
_POLISH_OFFSETS = _disc(_POLISH_RADIUS)


def _avgpool2(x):
    """2x2 average pool via strided slices. (A 6-D reshape-based pool puts
    size-2/size-3 dims in the minor tiled positions on TPU, which pads each
    tile to 8x128 and inflates the buffer ~128x — 30 GB at 1080p
    supersampled shapes.)"""
    import jax.numpy as jnp
    B, H, W, C = x.shape
    Hp, Wp = H + (H & 1), W + (W & 1)
    if (Hp, Wp) != (H, W):
        x = jnp.pad(x, [(0, 0), (0, Hp - H), (0, Wp - W), (0, 0)], mode="edge")
    xh = (x[:, 0::2] + x[:, 1::2]) * 0.5
    return (xh[:, :, 0::2] + xh[:, :, 1::2]) * 0.5


def _upsample2(x, out_h, out_w):
    """Nearest 2x upsample via index gathers (layout-friendly on TPU)."""
    return _upsample_nearest(x, out_h, out_w, 2)


def _upsample_nearest_axes(x, out_h, out_w, factor: int, ah: int, aw: int):
    """Nearest integer-factor upsample over axes (ah, aw):
    out[i] = x[min(i // factor, n-1)]."""
    import jax.numpy as jnp
    import numpy as np
    idx_h = jnp.asarray(np.minimum(np.arange(out_h) // factor,
                                   x.shape[ah] - 1), jnp.int32)
    idx_w = jnp.asarray(np.minimum(np.arange(out_w) // factor,
                                   x.shape[aw] - 1), jnp.int32)
    x = jnp.take(x, idx_h, axis=ah)
    return jnp.take(x, idx_w, axis=aw)


def _upsample_nearest(x, out_h, out_w, factor: int):
    """Nearest upsample over axes (1, 2) — [B, H, W(, C)] layouts."""
    return _upsample_nearest_axes(x, out_h, out_w, factor, 1, 2)


def _pyramid_fill(image, valid, coarse_factor: int = 1,
                  return_coarse: bool = False):
    """Masked push-pull: smooth estimate everywhere, used for hole interiors
    beyond the frontier sweeps.

    coarse_factor > 1 starts the pyramid from a pooled level: the estimate
    only ever fills pixels deeper than the frontier sweeps' reach (>= 10 px
    from any valid pixel), where it is inherently low-frequency, so a
    quarter-resolution pyramid is visually identical at ~1/16 the VPU/HBM
    cost (the dominant prepass of the postprocess stage at supersampled
    1080p).

    return_coarse=True skips the final nearest upsample and returns the
    estimate at 1/coarse_factor resolution (the fused postprocess kernel
    expands it on-chip instead of round-tripping a full-res plane)."""
    import jax.numpy as jnp
    out_h, out_w = image.shape[1], image.shape[2]
    img, msk = image * valid, valid
    for _ in range(max(coarse_factor, 1).bit_length() - 1):
        img, msk = _avgpool2(img), _avgpool2(msk)
    levels = []
    size = max(img.shape[1], img.shape[2])
    while size > 1:
        levels.append((img, msk))
        img, msk = _avgpool2(img), _avgpool2(msk)
        size = (size + 1) // 2
    filled = img / jnp.maximum(msk, 1e-8)
    for img, msk in reversed(levels):
        up = _upsample2(filled, img.shape[1], img.shape[2])
        local = img / jnp.maximum(msk, 1e-8)
        filled = jnp.where(msk > 1e-8, local, up)
    if return_coarse:
        return filled
    if filled.shape[1] != out_h or filled.shape[2] != out_w:
        # nearest, at the pooled factor (polish smooths the blockiness)
        filled = _upsample_nearest(filled, out_h, out_w, coarse_factor)
    return filled


def _avgpool2_hw(x):
    """2x2 average pool over the LAST TWO axes (planar layouts: [..., H, W]).
    Same strided-slice form as _avgpool2 (see its layout note)."""
    import jax.numpy as jnp
    H, W = x.shape[-2], x.shape[-1]
    Hp, Wp = H + (H & 1), W + (W & 1)
    if (Hp, Wp) != (H, W):
        pad = [(0, 0)] * (x.ndim - 2) + [(0, Hp - H), (0, Wp - W)]
        x = jnp.pad(x, pad, mode="edge")
    xh = (x[..., 0::2, :] + x[..., 1::2, :]) * 0.5
    return (xh[..., 0::2] + xh[..., 1::2]) * 0.5


def _pyramid_fill_planar_coarse(eye4, coarse_factor: int = 4,
                                quarter4=None):
    """Planar-u8 form of ``_pyramid_fill(..., return_coarse=True)``: eye4 is
    the warp kernel's [4, B, H, W] uint8 (r, g, b, valid) eye. Returns the
    [3, B, ~H/f, ~W/f] float32 masked push-pull estimate — already in the
    plane-major layout the fused postprocess kernel DMAs, so no channel
    interleave of full-resolution tensors ever happens. Matches
    ``_pyramid_fill(moveaxis(img), valid)`` exactly (same pools, same level
    schedule, same masked combine).

    quarter4: optional precomputed [4, B, H/f, ~W/f] float32 pooled
    (img*valid x3, valid) stack (ops/bilateral_pallas.py emits it from the
    same window as the bilateral) — skips the pool prepass entirely."""
    import os

    import jax
    import jax.numpy as jnp

    def _edge_even(x):
        h, w = x.shape[-2], x.shape[-1]
        if (h | w) & 1:
            pad = [(0, 0)] * (x.ndim - 2) + [(0, h & 1), (0, w & 1)]
            x = jnp.pad(x, pad, mode="edge")
        return x

    n_pre = max(coarse_factor, 1).bit_length() - 1
    if quarter4 is not None:
        n_pre = 0  # prepass already applied by the caller
        eye4 = None
    # The full/half-res pool levels dominate the prepass (7.5 ms/eye as XLA
    # stride-2 shuffles, profile_postprocess_planar.py) — Pallas kernels on
    # TPU; the quarter-res-and-below pyramid stays jnp (tiny tensors).
    use_pallas = (quarter4 is None
                  and (jax.default_backend() == "tpu"
                       or os.environ.get("VSC_TPU_SBS") == "planar")
                  and os.environ.get("VSC_TPU_POOL") != "jnp"
                  and n_pre >= 1
                  and eye4.shape[2] % 2 == 0 and eye4.shape[3] % 2 == 0)
    if quarter4 is not None:
        img, msk = quarter4[:3], quarter4[3]
    elif use_pallas:
        from vsc_tpu.ops.pool_pallas import (avgpool2, avgpool2_eye4,
                                             avgpool4_eye4)
        if (n_pre == 2 and eye4.shape[2] % 4 == 0
                and eye4.shape[3] % 4 == 0):
            # both levels in one kernel when dims allow (the half-res
            # intermediate never reaches HBM); production 1080p geometry
            # (W'=6090) is only even, so it takes the two-level path below
            x = avgpool4_eye4(eye4)                        # [4, B, H/4, W/4]
        else:
            x = avgpool2_eye4(eye4)                        # [4, B, H/2, W/2]
            for _ in range(n_pre - 1):
                x = _edge_even(x)
                K, B, h, w = x.shape
                x = avgpool2(x.reshape(K * B, h, w)).reshape(K, B, h // 2,
                                                             w // 2)
        img, msk = x[:3], x[3]
    else:
        msk = eye4[3].astype(jnp.float32)                  # [B, H, W]
        img = eye4[:3].astype(jnp.float32) * msk           # [3, B, H, W]
        for _ in range(n_pre):
            img, msk = _avgpool2_hw(img), _avgpool2_hw(msk)
    # Deep-pyramid tail as ONE Pallas kernel (r4): the ~12-level down/up
    # ladder is ~50 SERIAL small-tensor XLA ops — latency-bound, ~4-5
    # ms/frame. The top couple of below-quarter levels stay jnp (they are
    # cheap and their large transposes explode Mosaic compile time inside
    # a kernel); everything from ~1/16 resolution down runs on-chip per
    # (eye, frame) with bit-identical levels (ops/pyramid_pallas.py).
    # VSC_TPU_PYR=jnp opts out; VSC_TPU_PYR_KMAX tunes the handoff size.
    # (a bf16 below-quarter pyramid was measured r4: only -0.6 ms/frame —
    # not worth the quality risk to the interior estimate; stays f32)
    if ((jax.default_backend() == "tpu"
         or os.environ.get("VSC_TPU_SBS") == "planar")
            and os.environ.get("VSC_TPU_PYR") != "jnp"):
        from vsc_tpu.ops.pyramid_pallas import pyramid_fill_below
        kmax = int(os.environ.get("VSC_TPU_PYR_KMAX", "384"))
        upper = []
        while max(img.shape[-2], img.shape[-1]) > kmax:
            upper.append((img, msk))
            img, msk = _avgpool2_hw(img), _avgpool2_hw(msk)
        filled = pyramid_fill_below(
            jnp.concatenate([img, msk[None]], axis=0))
        for img_l, msk_l in reversed(upper):
            up = _upsample_nearest_hw(filled, img_l.shape[-2],
                                      img_l.shape[-1], 2)
            local = img_l / jnp.maximum(msk_l, 1e-8)
            filled = jnp.where(msk_l > 1e-8, local, up)
        return filled
    levels = []
    size = max(img.shape[-2], img.shape[-1])
    while size > 1:
        levels.append((img, msk))
        img, msk = _avgpool2_hw(img), _avgpool2_hw(msk)
        size = (size + 1) // 2
    filled = img / jnp.maximum(msk, 1e-8)
    for img, msk in reversed(levels):
        up = _upsample_nearest_hw(filled, img.shape[-2], img.shape[-1], 2)
        local = img / jnp.maximum(msk, 1e-8)
        filled = jnp.where(msk > 1e-8, local, up)
    return filled


def _upsample_nearest_hw(x, out_h, out_w, factor: int):
    """Nearest integer-factor upsample over the last two axes."""
    return _upsample_nearest_axes(x, out_h, out_w, factor,
                                  x.ndim - 2, x.ndim - 1)


def _frontier_sweep(val, known):
    """One fill step: every hole pixel with known pixels inside the disc
    takes their inverse-distance-weighted average and becomes known."""
    import jax.numpy as jnp
    B, H, W, C = val.shape
    R = _RADIUS
    vp = jnp.pad(val, [(0, 0), (R, R), (R, R), (0, 0)], mode="edge")
    kp = jnp.pad(known, [(0, 0), (R, R), (R, R), (0, 0)], mode="constant")
    num = jnp.zeros_like(val)
    den = jnp.zeros_like(known)
    for dy, dx, w in _OFFSETS:
        v = vp[:, R + dy:R + dy + H, R + dx:R + dx + W, :]
        k = kp[:, R + dy:R + dy + H, R + dx:R + dx + W, :]
        num = num + (w * k) * v
        den = den + w * k
    cand = num / jnp.maximum(den, 1e-8)
    reachable = den > 1e-8
    new_val = jnp.where(known > 0, val, jnp.where(reachable, cand, val))
    new_known = jnp.maximum(known, reachable.astype(known.dtype))
    return new_val, new_known


def pyramid_inpaint(image, hole_mask, sweeps: int = 3, polish: int = 1,
                    interior=None):
    """Fill holes in a batched image, Telea-like.

    Args:
      image: [B, H, W, C] float32.
      hole_mask: [B, H, W] float32/bool, 1 where the pixel must be filled.
      sweeps: frontier iterations (reach ~= 2*sweeps px from the boundary;
        wider interiors get the pyramid estimate).
      polish: 3x3 Jacobi smoothing passes over the filled pixels.
      interior: optional precomputed [B, H, W, C] smooth estimate for hole
        interiors beyond the sweeps' reach (default: masked pyramid fill of
        `image`).

    Returns:
      [B, H, W, C] with holes filled; valid pixels bit-identical to input.
    """
    import jax
    import jax.numpy as jnp

    valid = (1.0 - hole_mask.astype(image.dtype))[..., None]   # [B,H,W,1]
    B, H, W, C = image.shape

    # Interior fallback first (constant-time smooth estimate)...
    smooth = interior if interior is not None else _pyramid_fill(image, valid)

    # ...then frontier propagation from the true boundary.
    def sweep_body(carry, _):
        val, known = carry
        return _frontier_sweep(val, known), None

    (val, known), _ = jax.lax.scan(sweep_body, (image * valid, valid),
                                   None, length=sweeps)

    out = jnp.where(valid > 0, image, jnp.where(known > 0, val, smooth))

    # Polish: re-average hole pixels over a radius-3 inverse-distance disc
    # (all neighbors, filled included) — approximates Telea's
    # large-neighborhood averaging (measured: hole-region error vs cv2
    # Telea drops ~20% over a 3x3 Jacobi polish on worst-case noise).
    R = _POLISH_RADIUS
    wsum = sum(w for _, _, w in _POLISH_OFFSETS)

    def polish_body(out, _):
        padded = jnp.pad(out, [(0, 0), (R, R), (R, R), (0, 0)], mode="edge")
        acc = jnp.zeros_like(out)
        for dy, dx, wgt in _POLISH_OFFSETS:
            acc = acc + wgt * padded[:, R + dy:R + dy + H, R + dx:R + dx + W, :]
        return jnp.where(valid > 0, out, acc / wsum), None

    out, _ = jax.lax.scan(polish_body, out, None, length=polish)
    return out
