"""
Resampling as matrix multiplication
===================================

All image resizes the stereo pipeline needs, expressed as two dense
matmuls (rows then columns) so they run on the TPU MXU instead of as
gather-heavy interpolation:

  out[b, o, p, c] = sum_h sum_w  Rh[o, h] * img[b, h, w, c] * Rw[p, w]

The weight matrices are built on the host at trace time (shapes are static
under jit) and become XLA constants.

Three kernels, each matching the exact sampling semantics the reference
pipeline depends on:
  - lanczos4:  cv2.resize INTER_LANCZOS4 (pre-stretch of rgb+depth,
               /root/reference/helper/stereo_core.py:253-254)
  - bilinear:  torch F.interpolate(mode='bilinear', align_corners=False)
               == cv2 INTER_LINEAR (super-sampling upscale, stereo_core.py:260-262,
               348-366; depth-map save resize, depth_map_generator.py:217)
  - area:      torch F.interpolate(mode='area') == adaptive average pooling
               (final downscale, stereo_core.py:298-299)

All use half-pixel coordinate mapping src = (dst + 0.5) * scale - 0.5 with
clamped borders (bilinear/lanczos) or integer coverage windows (area).
"""

from __future__ import annotations

import functools

import numpy as np

__all__ = ["resize", "resize_matrix"]


def _lanczos4_weights(src: int, dst: int) -> np.ndarray:
    """Row-resampling matrix for cv2 INTER_LANCZOS4 (8-tap Lanczos, a=4).

    Weights are quantized to cv2's fixed-point grid (1/2048,
    INTER_RESIZE_COEF_BITS=11) — cv2 resizes integer images through short
    coefficients, and matching that grid removes a +-1-code systematic
    difference against the reference's intermediates."""
    scale = src / dst
    mat = np.zeros((dst, src), np.float64)
    for o in range(dst):
        sx = (o + 0.5) * scale - 0.5
        x0 = int(np.floor(sx))
        taps = np.arange(x0 - 3, x0 + 5)
        t = sx - taps
        with np.errstate(invalid="ignore", divide="ignore"):
            w = np.where(
                np.abs(t) < 1e-9, 1.0,
                np.where(np.abs(t) < 4.0,
                         4.0 * np.sin(np.pi * t) * np.sin(np.pi * t / 4.0)
                         / (np.pi * np.pi * t * t),
                         0.0))
        w = w / w.sum()
        w = np.round(w * 2048.0) / 2048.0  # cv2 fixed-point coefficient grid
        np.add.at(mat[o], np.clip(taps, 0, src - 1), w)
    return mat


def _bilinear_weights(src: int, dst: int) -> np.ndarray:
    """Row matrix for half-pixel bilinear (torch align_corners=False / cv2
    INTER_LINEAR)."""
    scale = src / dst
    mat = np.zeros((dst, src), np.float64)
    for o in range(dst):
        sx = (o + 0.5) * scale - 0.5
        x0 = int(np.floor(sx))
        f = sx - x0
        np.add.at(mat[o], [np.clip(x0, 0, src - 1), np.clip(x0 + 1, 0, src - 1)],
                  [1.0 - f, f])
    return mat


def _area_weights(src: int, dst: int) -> np.ndarray:
    """Row matrix for torch mode='area' (adaptive average pooling): output i
    averages src indices [floor(i*src/dst), ceil((i+1)*src/dst))."""
    mat = np.zeros((dst, src), np.float64)
    for o in range(dst):
        start = (o * src) // dst
        end = -((-(o + 1) * src) // dst)  # ceil((o+1)*src/dst)
        mat[o, start:end] = 1.0 / (end - start)
    return mat


_BUILDERS = {
    "lanczos4": _lanczos4_weights,
    "bilinear": _bilinear_weights,
    "area": _area_weights,
}


@functools.lru_cache(maxsize=512)
def resize_matrix(src: int, dst: int, method: str) -> np.ndarray:
    """Cached (dst, src) float32 resampling matrix."""
    if method not in _BUILDERS:
        raise ValueError(f"unknown resize method: {method}")
    return _BUILDERS[method](src, dst).astype(np.float32)


def resize(img, out_h: int, out_w: int, method: str = "bilinear",
           channel_last: bool = False):
    """Resize a float array to (out_h, out_w) via two MXU matmuls.

    Spatial dims are the last two axes, or axes (-3, -2) when
    ``channel_last`` is set (i.e. [..., H, W, C]).
    """
    import jax.numpy as jnp

    h_axis = img.ndim - (3 if channel_last else 2)
    w_axis = h_axis + 1
    in_h, in_w = img.shape[h_axis], img.shape[w_axis]
    if (in_h, in_w) == (out_h, out_w):
        return img

    rh = jnp.asarray(resize_matrix(in_h, out_h, method))
    rw = jnp.asarray(resize_matrix(in_w, out_w, method))

    # rows: contract H; cols: contract W. tensordot keeps things MXU-shaped.
    # HIGHEST precision: resampling weights need full f32 on the MXU — the
    # default bf16 pass costs ~0.5 code values of error per resize, which
    # compounds across the pipeline's five resamplings.
    import jax
    prec = jax.lax.Precision.HIGHEST
    out = jnp.tensordot(rh, img, axes=[[1], [h_axis]], precision=prec)
    out = jnp.moveaxis(out, 0, h_axis)
    out = jnp.tensordot(rw, out, axes=[[1], [w_axis]], precision=prec)
    out = jnp.moveaxis(out, 0, w_axis)
    return out
