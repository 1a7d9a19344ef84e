"""
Fused finish stage — Pallas TPU kernel
======================================

Convergence crop + unsharp mask + integer-ratio area downscale (the stereo
pipeline's stages 8-10 for super-sampled runs, stereo_core.py:275-306) in
one pass: each output block DMAs its (ratio*block + halo) window of the
postprocessed eye from HBM once, sharpens in VMEM, and reduces ratio x ratio
boxes via two small in-VMEM matmuls (banded box matrices built from iota —
MXU work, no strided slicing).

Only used when the supersampling ratio is an exact integer (the reference
default 3.0 is); other ratios take the jnp taps path. Saves the separate
unsharp blur pass + area pass + one full-resolution intermediate round-trip
(~40 ms/frame at 1080p defaults).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["sharpen_downscale"]

OUT_BLOCK_R = 16
OUT_BLOCK_C = 128
_HALO = 4  # unsharp 5x5 radius 2, rounded up for (8,128) DMA alignment


def _kernel(img_ref, out_ref, win_ref, sem, *, ratio: int, strength: float,
            off_r: int, off_c: int, kern):
    """Grid (B, nr, nc). img_ref: [B, Hp, Wp] HBM plane (one channel),
    pre-padded reflect-101 by _HALO*? — see caller. Output [1, BR, BC]."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    IBR = OUT_BLOCK_R * ratio
    IBC = OUT_BLOCK_C * ratio
    WR = IBR + 2 * _HALO
    WC = IBC + 2 * 64  # column halo padded for lane alignment
    r0 = off_r + i * IBR
    c0 = off_c + j * IBC

    copy = pltpu.make_async_copy(
        img_ref.at[b, pl.ds(r0, WR), pl.ds(c0, WC)], win_ref, sem)
    copy.start()
    copy.wait()

    x = win_ref[...]
    # separable 5x5 gaussian sigma=1 (kornia kernel law); the window's halo
    # holds reflect-101 values, so borders match the jnp path.
    # W pass over center columns: col c of bw == window col 64 + c
    bw_conv = None
    for t in range(5):
        term = kern[t] * x[:, 64 - 2 + t:64 - 2 + t + IBC]
        bw_conv = term if bw_conv is None else bw_conv + term
    # V pass down to center rows: row r of blur == window row _HALO + r
    blur = None
    for t in range(5):
        term = kern[t] * bw_conv[_HALO - 2 + t:_HALO - 2 + t + IBR, :]
        blur = term if blur is None else blur + term
    center = x[_HALO:_HALO + IBR, 64:64 + IBC]
    sharp = jnp.clip(center + strength * (center - blur), 0.0, 255.0)

    # ratio:1 box reduce via banded matmuls (built from iota)
    rows_o = jax.lax.broadcasted_iota(jnp.int32, (OUT_BLOCK_R, IBR), 0)
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (OUT_BLOCK_R, IBR), 1)
    bh = ((rows_i // ratio) == rows_o).astype(jnp.float32) / ratio
    cols_i = jax.lax.broadcasted_iota(jnp.int32, (IBC, OUT_BLOCK_C), 0)
    cols_o = jax.lax.broadcasted_iota(jnp.int32, (IBC, OUT_BLOCK_C), 1)
    bw = ((cols_i // ratio) == cols_o).astype(jnp.float32) / ratio

    tmp = jax.lax.dot_general(bh, sharp, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out = jax.lax.dot_general(tmp, bw, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out_ref[0] = out


@functools.partial(jax.jit,
                   static_argnames=("ratio", "strength", "off_r", "off_c",
                                    "out_h", "out_w"))
def sharpen_downscale(plane, ratio: int, strength: float, off_r: int,
                      off_c: int, out_h: int, out_w: int):
    """One channel plane [B, H', W'] (u8-valued float, post-postprocess) ->
    [B, out_h, out_w]: crop window starting at (off_r, off_c), unsharp
    (5x5 sigma=1, reflect borders), then exact ratio:1 box average.

    Requires out_h % OUT_BLOCK_R == 0 handled by grid padding (extra rows
    are computed from padded input and sliced off)."""
    B, H, W = plane.shape
    nr = pl.cdiv(out_h, OUT_BLOCK_R)
    nc = pl.cdiv(out_w, OUT_BLOCK_C)
    # pad: halo on both sides + enough tail for the padded grid
    need_r = off_r + nr * OUT_BLOCK_R * ratio + _HALO
    need_c = off_c + nc * OUT_BLOCK_C * ratio + 64
    padded = jnp.pad(plane, [(0, 0), (_HALO, 0), (64, 0)], mode="reflect")
    pad_r = max(0, need_r + _HALO - padded.shape[1])
    pad_c = max(0, need_c + 64 - padded.shape[2])
    padded = jnp.pad(padded, [(0, 0), (0, pad_r), (0, pad_c)], mode="edge")

    from vsc_tpu.ops.filters import gaussian_kernel1d
    kern = tuple(float(v) for v in gaussian_kernel1d(5, 1.0))

    out = pl.pallas_call(
        functools.partial(_kernel, ratio=ratio, strength=strength,
                          off_r=off_r, off_c=off_c, kern=kern),
        grid=(B, nr, nc),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, OUT_BLOCK_R, OUT_BLOCK_C),
                               lambda b, i, j: (b, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (B, nr * OUT_BLOCK_R, nc * OUT_BLOCK_C), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((OUT_BLOCK_R * ratio + 2 * _HALO,
                        OUT_BLOCK_C * ratio + 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(padded)
    return out[:, :out_h, :out_w]
