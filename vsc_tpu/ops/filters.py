"""
Image filters
=============

Gaussian blur, unsharp masking, bilateral filtering, and 3x3 dilation as
batched, jit-friendly jnp ops. Each matches the exact numerics of the
filter the reference pipeline uses:

  - gaussian_blur: kornia.filters.gaussian_blur2d (normalized 1-D gaussian,
    reflect-101 padding) used for depth edge softening
    (/root/reference/helper/stereo_core.py:368-385) and unsharp masking
    (stereo_core.py:414-434).
  - bilateral_filter: cv2.bilateralFilter for uint8 color images — circular
    neighborhood of diameter d, space weights exp(-(dx^2+dy^2)/(2*sigma_s^2)),
    color weights exp(-(|dr|+|dg|+|db|)^2 / (2*sigma_c^2)), reflect-101
    borders (stereo_core.py:387-412).
  - dilate3x3: cv2.dilate with a 3x3 ones kernel, one iteration — used to
    grow the inpainting mask (stereo_core.py:455-456).
"""

from __future__ import annotations

import functools
import math

import numpy as np

__all__ = ["gaussian_blur", "unsharp_mask", "bilateral_filter", "dilate3x3",
           "gaussian_kernel1d"]


@functools.lru_cache(maxsize=64)
def gaussian_kernel1d(ksize: int, sigma: float) -> np.ndarray:
    """Normalized 1-D gaussian over a centered window (kornia semantics:
    x = arange(ksize) - (ksize-1)/2, w = exp(-x^2 / (2 sigma^2)), w /= sum)."""
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2.0
    w = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (w / w.sum()).astype(np.float32)


def _reflect_pad_hw(img, ph: int, pw: int, channel_last: bool):
    """Reflect-101 padding on the two spatial axes."""
    import jax.numpy as jnp
    h_axis = img.ndim - (3 if channel_last else 2)
    pads = [(0, 0)] * img.ndim
    pads[h_axis] = (ph, ph)
    pads[h_axis + 1] = (pw, pw)
    return jnp.pad(img, pads, mode="reflect")


def gaussian_blur(img, ksize: int, sigma: float, channel_last: bool = False,
                  gamma=None):
    """Separable gaussian blur with reflect-101 padding; spatial dims are the
    last two axes (or (-3,-2) with channel_last). On TPU this dispatches to
    the fused Pallas kernel (ops/blur_pallas.py, bit-exact same tap order);
    elsewhere (or with VSC_TPU_BLUR=jnp) a static shift-and-accumulate over
    the (<=31-tap) kernel — pure VPU work with a tiny constant table.

    ``gamma`` applies clip(x, 0.001, 1) ** gamma after the blur (the stereo
    pipeline's depth-gamma stage) — fused into the Pallas kernel's epilogue
    on TPU, an ordinary trailing op on the jnp path."""
    import os

    import jax
    import jax.numpy as jnp

    h_axis = img.ndim - (3 if channel_last else 2)
    choice = os.environ.get("VSC_TPU_BLUR")
    use_pallas = (choice != "jnp"
                  and (choice == "pallas" or jax.default_backend() == "tpu")
                  and img.shape[h_axis] > ksize // 2
                  and img.shape[h_axis + 1] > ksize // 2)
    if use_pallas:
        from vsc_tpu.ops.blur_pallas import gaussian_blur_pallas
        dt = img.dtype
        x = img.astype(jnp.float32)
        if channel_last:
            x = jnp.moveaxis(x, -1, -3)
        out = gaussian_blur_pallas(x, ksize, sigma, gamma=gamma)
        if channel_last:
            out = jnp.moveaxis(out, -3, -1)
        return out.astype(dt)
    w_axis = h_axis + 1
    H, W = img.shape[h_axis], img.shape[w_axis]
    r = ksize // 2
    k = gaussian_kernel1d(ksize, sigma)

    padded = _reflect_pad_hw(img, r, r, channel_last)

    def conv_axis(x, axis, n):
        acc = None
        for t in range(ksize):
            sl = [slice(None)] * x.ndim
            sl[axis] = slice(t, t + n)
            term = float(k[t]) * x[tuple(sl)]
            acc = term if acc is None else acc + term
        return acc

    out = conv_axis(padded, h_axis, H)
    out = conv_axis(out, w_axis, W)
    if gamma is not None:
        out = jnp.clip(out, 0.001, 1.0) ** gamma
    return out


def unsharp_mask(img, strength: float, channel_last: bool = True):
    """img + strength * (img - gaussian5x5(img, sigma=1)), clamped to [0,255]
    (/root/reference/helper/stereo_core.py:414-434)."""
    import jax.numpy as jnp
    blurred = gaussian_blur(img, 5, 1.0, channel_last=channel_last)
    return jnp.clip(img + strength * (img - blurred), 0.0, 255.0)


def bilateral_filter(img, d: int, sigma_color: float, sigma_space: float):
    """cv2.bilateralFilter-compatible bilateral filter on [..., H, W, C]
    float images holding uint8 values (0..255).

    cv2 semantics: radius = d/2; offsets restricted to the disc
    dx^2+dy^2 <= radius^2; space weight exp(-(dx^2+dy^2)/(2 sigma_space^2));
    color weight exp(-(|d0|+|d1|+|d2|)^2 / (2 sigma_color^2)); reflect-101
    borders; normalized per-channel by the summed weights.
    """
    import jax.numpy as jnp

    radius = d // 2
    padded = _reflect_pad_hw(img, radius, radius, channel_last=True)
    H, W = img.shape[-3], img.shape[-2]

    gauss_color = -0.5 / (sigma_color * sigma_color)
    gauss_space = -0.5 / (sigma_space * sigma_space)

    num = jnp.zeros_like(img)
    den = jnp.zeros(img.shape[:-1] + (1,), img.dtype)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            r2 = dx * dx + dy * dy
            if r2 > radius * radius:
                continue
            sw = math.exp(gauss_space * r2)
            shifted = padded[..., radius + dy: radius + dy + H,
                             radius + dx: radius + dx + W, :]
            cdiff = jnp.sum(jnp.abs(shifted - img), axis=-1, keepdims=True)
            wgt = sw * jnp.exp(gauss_color * (cdiff * cdiff))
            num = num + wgt * shifted
            den = den + wgt
    return num / den


def dilate3x3(mask):
    """Binary 3x3 dilation (one iteration) on [..., H, W] masks — max over
    the 8-neighborhood, replicate borders (cv2.dilate BORDER_CONSTANT with
    -inf outside reduces to this for binary masks)."""
    import jax.numpy as jnp
    H, W = mask.shape[-2], mask.shape[-1]
    pads = [(0, 0)] * (mask.ndim - 2) + [(1, 1), (1, 1)]
    padded = jnp.pad(mask, pads, mode="constant", constant_values=0)
    out = mask
    for dy in range(-1, 2):
        for dx in range(-1, 2):
            out = jnp.maximum(out, padded[..., 1 + dy:1 + dy + H, 1 + dx:1 + dx + W])
    return out
