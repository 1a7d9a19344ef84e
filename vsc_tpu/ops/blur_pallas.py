"""
Separable gaussian blur — Pallas TPU kernel
===========================================

Both passes of ops.filters.gaussian_blur (rows then cols, reflect-101
borders, kornia tap order — /root/reference/helper/stereo_core.py:368-385)
fused into one VMEM-resident kernel: each grid cell DMAs one haloed
row-block, runs the 1-D tap accumulations for both axes out of VMEM in the
exact same order as the jnp path, and writes the finished block once.

Why: XLA's shift-and-accumulate formulation re-reads the padded operand per
tap from HBM (k=31 edge softening measured 9.6 ms/frame at supersampled
1080p — ~20x the bandwidth bound). Here HBM traffic is one read + one
write; the VPU does the ~2k FMAs/pixel-row directly.

Numerics: identical accumulation order to filters.gaussian_blur, so results
are bit-exact against the jnp path (equivalence-tested in interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vsc_tpu.ops.filters import gaussian_kernel1d

__all__ = ["gaussian_blur_pallas"]

_BLOCK_R = 256


def _kernel(x_ref, o_ref, win_ref, sem, *, taps, r: int, block_r: int,
            w_out: int, win_r: int):
    n = pl.program_id(0)
    i = pl.program_id(1)
    # win_r = block_r + 2r rounded up to the (8,128) sublane tiling — VMEM
    # slices must be 8-row aligned; rows past block_r + 2r are padding.
    pltpu.make_async_copy(
        x_ref.at[n, pl.ds(i * block_r, win_r), :],
        win_ref, sem).start()
    pltpu.make_async_copy(
        x_ref.at[n, pl.ds(i * block_r, win_r), :],
        win_ref, sem).wait()
    win = win_ref[...]
    rows = None
    for t, kt in enumerate(taps):           # rows pass (same order as jnp)
        term = kt * win[t:t + block_r, :]
        rows = term if rows is None else rows + term
    out = None
    for t, kt in enumerate(taps):           # cols pass
        term = kt * rows[:, t:t + w_out]
        out = term if out is None else out + term
    o_ref[0] = out


@functools.partial(jax.jit, static_argnames=("ksize", "sigma"))
def gaussian_blur_pallas(img, ksize: int, sigma: float):
    """Fused separable gaussian blur on [..., H, W] float32 planes.

    Exact drop-in for filters.gaussian_blur(img, ksize, sigma) (channel
    planes folded into the leading axes by the caller).
    """
    *lead, H, W = img.shape
    N = 1
    for d in lead:
        N *= d
    x = img.reshape(N, H, W).astype(jnp.float32)
    r = ksize // 2
    taps = [float(v) for v in gaussian_kernel1d(ksize, sigma)]

    block_r = min(_BLOCK_R, -(-H // 8) * 8)
    nr = pl.cdiv(H, block_r)
    Wo = -(-W // 128) * 128
    Wi = -(-(Wo + 2 * r) // 128) * 128
    win_r = -(-(block_r + 2 * r) // 8) * 8      # 8-row aligned DMA window
    Hp = (nr - 1) * block_r + win_r             # last window stays in bounds

    xp = jnp.pad(x, [(0, 0), (r, r), (r, r)], mode="reflect")
    xp = jnp.pad(xp, [(0, 0), (0, Hp - xp.shape[1]), (0, Wi - xp.shape[2])])

    out = pl.pallas_call(
        functools.partial(_kernel, taps=taps, r=r, block_r=block_r, w_out=Wo,
                          win_r=win_r),
        grid=(N, nr),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, block_r, Wo), lambda n, i: (n, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, nr * block_r, Wo), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((win_r, Wi), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(xp)

    return out[:, :H, :W].reshape(*lead, H, W)
