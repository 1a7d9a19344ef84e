"""
2x2 / 4x4 average-pool — Pallas TPU kernels for the inpaint pyramid prepass
===========================================================================

The masked push-pull estimate (ops/inpaint._pyramid_fill_planar_coarse)
opens with two full/half-resolution 2x2 average pools. XLA lowers the
strided odd/even-slice form as lane-stride-2 shuffles of the whole plane —
measured 7.5 ms/eye at supersampled-1080p shapes, more than the fused
postprocess kernel itself. Here each grid cell reads its input tile once
and pools it entirely in VMEM.

Mosaic cannot lower stride-2 selects (`vector.extract_strided_slice`
requires stride 1, value-level strided indexing becomes an unsupported
gather — probed on hardware, scripts/probe_stride2.py). The lowerable
idioms are:

  - second-minor (sublane) axis: reshape [H, W] -> [H/f, f, W] and reduce
    the middle axis — plain VPU adds;
  - minor (lane) axis: transpose, apply the sublane form, transpose back
    (in-kernel 2-D transposes lower cleanly; scripts/probe_stride2b.py).

Both are exact f32 adds, so the results are BIT-EXACT vs the jnp
``_avgpool2_hw`` ladder: summing f values then scaling by the power-of-two
1/f² commutes with the reference's average-of-averages rounding.

Entry points:
  - avgpool2_eye4 / avgpool4_eye4: first level(s), straight off the warp
    kernel's [4, B, H, W] uint8 (r, g, b, valid) stack — color planes are
    multiplied by the valid plane in-kernel (the pyramid pools img*valid
    and valid), so the masked full-res f32 planes never exist in HBM. The
    4x one-shot also keeps the half-res intermediate in VMEM (production
    coarse_factor=4 needs exactly two levels).
  - avgpool2: generic [N, H, W] float32 level.

Reference capability: the coarse estimate feeding hole-fill, matching
/root/reference/helper/stereo_core.py's cv2.inpaint surround statistics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["avgpool2_eye4", "avgpool4_eye4", "avgpool2"]

_TH = 128   # output tile rows
_TW = 512   # output tile cols


def _pool_f(x, f: int):
    """[H, W] f32 -> [H/f, W/f], f x f box sum * (1/f^2); H, W % f == 0."""
    H, W = x.shape
    x = x.reshape(H // f, f, W).sum(axis=1)          # sublane reduce
    x = x.T.reshape(W // f, f, H // f).sum(axis=1)   # lane reduce via T
    return x.T * (1.0 / (f * f))


def _eye4_kernel(x_ref, o_ref, *, f: int):
    msk = x_ref[3, 0].astype(jnp.int32).astype(jnp.float32)
    o_ref[3, 0] = _pool_f(msk, f)
    for k in range(3):
        img = x_ref[k, 0].astype(jnp.int32).astype(jnp.float32) * msk
        o_ref[k, 0] = _pool_f(img, f)


def _f32_kernel(x_ref, o_ref):
    o_ref[0] = _pool_f(x_ref[0], 2)


def _grid_pad(x, h_axis: int, f: int, th: int, tw: int):
    """Zero-pad the last two axes up to f*tile multiples (padded input
    regions feed only output tiles that are trimmed away)."""
    H, W = x.shape[h_axis], x.shape[h_axis + 1]
    nh, nw = pl.cdiv(H, f * th), pl.cdiv(W, f * tw)
    pad = [(0, 0)] * x.ndim
    pad[h_axis] = (0, nh * f * th - H)
    pad[h_axis + 1] = (0, nw * f * tw - W)
    if any(p != (0, 0) for p in pad):
        x = jnp.pad(x, pad)
    return x, nh, nw


def _eye4_pool(eye4, f: int):
    K, B, H, W = eye4.shape
    assert K == 4 and H % f == 0 and W % f == 0
    x, nh, nw = _grid_pad(eye4, 2, f, _TH, _TW)
    out = pl.pallas_call(
        functools.partial(_eye4_kernel, f=f),
        grid=(B, nh, nw),
        in_specs=[pl.BlockSpec((4, 1, f * _TH, f * _TW),
                               lambda b, i, j: (0, b, i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((4, 1, _TH, _TW),
                               lambda b, i, j: (0, b, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, B, nh * _TH, nw * _TW),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(x)
    return out[:, :, :H // f, :W // f]


@jax.jit
def avgpool2_eye4(eye4):
    """[4, B, H, W] uint8 (r, g, b, valid), H and W even ->
    [4, B, H/2, W/2] float32: (pool2(img * valid) x3, pool2(valid))."""
    return _eye4_pool(eye4, 2)


@jax.jit
def avgpool4_eye4(eye4):
    """One-shot two-level pool: [4, B, H, W] uint8 -> [4, B, H/4, W/4]
    float32, bit-exact equal to avgpool2(avgpool2(.)) for integer input
    (all partial sums <= 16*255 are exact f32; power-of-two scaling
    commutes with the average-of-averages rounding)."""
    return _eye4_pool(eye4, 4)


@jax.jit
def avgpool2(planes):
    """[N, H, W] float32, H and W even -> [N, H/2, W/2] float32."""
    N, H, W = planes.shape
    assert H % 2 == 0 and W % 2 == 0
    x, nh, nw = _grid_pad(planes, 1, 2, _TH, _TW)
    out = pl.pallas_call(
        _f32_kernel,
        grid=(N, nh, nw),
        in_specs=[pl.BlockSpec((1, 2 * _TH, 2 * _TW),
                               lambda n, i, j: (n, i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, _TH, _TW),
                               lambda n, i, j: (n, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, nh * _TH, nw * _TW), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(x)
    return out[:, :H // 2, :W // 2]
