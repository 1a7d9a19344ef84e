"""
Resampling kernels
==================

All image resizes the stereo pipeline needs, expressed as **tap gathers**:
for each output coordinate a static table of (source index, weight) pairs —
at most 8 taps (Lanczos4). One gather + a T-term weighted sum per axis:
optimal memory traffic, tiny constant tables (dst x T), no dense matrices.

(The first design used dense resampling matrices on the MXU; at 1080p with
supersampling those matrices reach ~50 MB each and both bloat the compiled
program beyond the TPU relay's payload limit and waste ~100x FLOPs on
zeros. Tap tables are the right shape for the hardware: the VPU does the
multiply-adds, the gather rides the native lane layout.)

Three kernels, each matching the exact sampling semantics the reference
pipeline depends on:
  - lanczos4:  cv2.resize INTER_LANCZOS4 (pre-stretch of rgb+depth,
               /root/reference/helper/stereo_core.py:253-254), weights
               quantized to cv2's 1/2048 fixed-point grid
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

__all__ = ["resize", "resize_taps"]


def _lanczos4_taps(src: int, dst: int):
    scale = src / dst
    idx = np.zeros((dst, 8), np.int32)
    wgt = np.zeros((dst, 8), np.float32)
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
        idx[o] = np.clip(taps, 0, src - 1)
        wgt[o] = w
    return idx, wgt


def _bilinear_taps(src: int, dst: int):
    scale = src / dst
    idx = np.zeros((dst, 2), np.int32)
    wgt = np.zeros((dst, 2), np.float32)
    for o in range(dst):
        sx = (o + 0.5) * scale - 0.5
        x0 = int(np.floor(sx))
        f = sx - x0
        idx[o] = [np.clip(x0, 0, src - 1), np.clip(x0 + 1, 0, src - 1)]
        wgt[o] = [1.0 - f, f]
    return idx, wgt


def _area_taps(src: int, dst: int):
    """Adaptive average pooling: output o averages [floor(o*src/dst),
    ceil((o+1)*src/dst)). Window widths vary by at most one; narrower
    windows zero-pad their trailing taps."""
    starts = [(o * src) // dst for o in range(dst)]
    ends = [-((-(o + 1) * src) // dst) for o in range(dst)]
    T = max(e - s for s, e in zip(starts, ends))
    idx = np.zeros((dst, T), np.int32)
    wgt = np.zeros((dst, T), np.float32)
    for o, (s, e) in enumerate(zip(starts, ends)):
        n = e - s
        idx[o, :n] = np.arange(s, e)
        wgt[o, :n] = 1.0 / n
    return idx, wgt


_BUILDERS = {
    "lanczos4": _lanczos4_taps,
    "bilinear": _bilinear_taps,
    "area": _area_taps,
}


@functools.lru_cache(maxsize=512)
def resize_taps(src: int, dst: int, method: str):
    """Cached (indices [dst, T] int32, weights [dst, T] float32)."""
    if method not in _BUILDERS:
        raise ValueError(f"unknown resize method: {method}")
    return _BUILDERS[method](src, dst)


def _upsample_axis_int(img, axis: int, factor: int):
    """Integer-factor bilinear upsample as a PHASE DECOMPOSITION: for
    out[f*i + p] the 2-tap window and weights depend only on the phase p,
    so each phase is a weighted sum of two shifted views — pure slicing and
    elementwise math, no gathers (measured ~3x faster than the take-based
    path on TPU at supersampling shapes). Numerics identical to the tap
    table: same half-pixel mapping, same clamped borders."""
    import jax.numpy as jnp
    src = img.shape[axis]
    f = factor

    def shifted(delta):
        # in[clip(i + delta, 0, src-1)] along `axis` via pad-edge + slice
        if delta == 0:
            return img
        pads = [(0, 0)] * img.ndim
        sl = [slice(None)] * img.ndim
        if delta < 0:
            pads[axis] = (-delta, 0)
            sl[axis] = slice(0, src)
        else:
            pads[axis] = (0, delta)
            sl[axis] = slice(delta, delta + src)
        return jnp.pad(img, pads, mode="edge")[tuple(sl)]

    phases = []
    for p in range(f):
        sx = (p + 0.5) / f - 0.5
        x0 = int(np.floor(sx))
        w1 = sx - x0
        a = shifted(x0)
        if w1 == 0.0:
            phases.append(a)
        else:
            phases.append((1.0 - w1) * a + w1 * shifted(x0 + 1))
    out = jnp.stack(phases, axis=axis + 1)  # [..., src, f, ...]
    shape = list(img.shape)
    shape[axis] = src * f
    return out.reshape(shape)


def _area_axis_int(img, axis: int, factor: int):
    """Integer-factor area downscale == non-overlapping mean pooling:
    reshape [..., dst, f, ...] and average — no gathers."""
    import jax.numpy as jnp
    src = img.shape[axis]
    shape = list(img.shape)
    shape[axis] = src // factor
    shape.insert(axis + 1, factor)
    return img.reshape(shape).mean(axis=axis + 1)


def _resample_axis(img, axis: int, dst: int, method: str):
    """Per-tap gather + accumulate: peak memory stays O(output), never
    O(output * taps) (a fused gather-reshape materializes the taps factor —
    30 GB at 1080p supersampled shapes)."""
    import jax.numpy as jnp
    src = img.shape[axis]
    if src == dst:
        return img
    if method == "bilinear" and dst % src == 0:
        return _upsample_axis_int(img, axis, dst // src)
    if method == "area" and src % dst == 0:
        return _area_axis_int(img, axis, src // dst)
    idx, wgt = resize_taps(src, dst, method)
    T = idx.shape[1]
    w_shape = [1] * img.ndim
    w_shape[axis] = dst
    out = None
    for t in range(T):
        g = jnp.take(img, jnp.asarray(idx[:, t]), axis=axis)
        w = jnp.asarray(wgt[:, t]).reshape(w_shape)
        term = g * w
        out = term if out is None else out + term
    return out


def resize(img, out_h: int, out_w: int, method: str = "bilinear",
           channel_last: bool = False):
    """Resize a float array to (out_h, out_w).

    Spatial dims are the last two axes, or axes (-3, -2) when
    ``channel_last`` is set (i.e. [..., H, W, C]).
    """
    import os

    import jax
    import jax.numpy as jnp

    h_axis = img.ndim - (3 if channel_last else 2)
    w_axis = h_axis + 1
    H, W = img.shape[h_axis], img.shape[w_axis]
    # Same-integer-factor bilinear upsample of both axes: one banded-matmul
    # Pallas kernel on TPU (the phase-decomposition jnp path pays an XLA
    # interleave relayout, ~7 ms/frame at supersampled-1080p shapes).
    # VSC_TPU_UPSAMPLE=jnp opts out.
    if (method == "bilinear" and H and W and out_h % H == 0
            and out_w % W == 0 and out_h // H == out_w // W and out_h > H
            and os.environ.get("VSC_TPU_UPSAMPLE") != "jnp"
            and jax.default_backend() == "tpu"):
        from vsc_tpu.ops.upsample_pallas import upsample_bilinear_int_pallas
        dt = img.dtype
        x = img.astype(jnp.float32)
        if channel_last:
            x = jnp.moveaxis(x, -1, -3)
        lead = x.shape[:-2]
        out = upsample_bilinear_int_pallas(
            x.reshape((-1,) + x.shape[-2:]), out_h // H)
        out = out.reshape(lead + (out_h, out_w))
        if channel_last:
            out = jnp.moveaxis(out, -3, -1)
        return out.astype(dt)
    img = _resample_axis(img, h_axis, out_h, method)
    img = _resample_axis(img, w_axis, out_w, method)
    return img
