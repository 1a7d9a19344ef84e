"""
Masked push-pull pyramid — single-kernel Pallas TPU form
========================================================

The below-quarter half of the inpaint interior estimate
(ops/inpaint._pyramid_fill_planar_coarse): ~12 pool levels down to 1x1 and
~12 masked-combine upsample levels back. As a jnp chain those are ~50
SERIAL small-tensor XLA ops — each individually trivial (the whole
below-quarter pyramid touches < 30 MB) but latency-bound end to end:
measured ~4-5 ms/frame of the SBS stage at production supersampled
geometry, second only to the fused postprocess kernel.

Here ONE grid cell = one (eye, frame): the quarter-res (r, g, b, valid)
stack is DMA'd into VMEM once, the ENTIRE down/up pyramid runs on-chip
with static per-level shapes, and the filled quarter estimate is written
once. No intermediate level ever reaches HBM and the ~50-op serial chain
collapses into one kernel launch.

Exactness vs the jnp ladder (ops/inpaint._avgpool2_hw and
_upsample_nearest_hw):
  - pools: edge-pad odd dims (jnp pads mode="edge"), sum 2x2, scale by the
    exact power-of-two 0.25 — the same rounding sequence as the jnp
    average-of-averages (multiplies by 0.5/0.25 are exact), so levels are
    bit-identical;
  - nearest upsample: pure replication (broadcast + reshape), no
    arithmetic — the min(i//2, n-1) clamp never binds because a child
    level is always ceil(parent/2);
  - the masked combine uses the same img / max(msk, 1e-8) division and
    msk > 1e-8 predicate.
Stride-2 slicing does not lower on Mosaic (scripts/probe_stride2.py), so
pools use the sublane reshape-reduce + transpose idiom from
ops/pool_pallas.py.

Reference capability: the hole-interior surround estimate of
/root/reference/helper/stereo_core.py's cv2.inpaint step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pyramid_fill_below"]


def _pool2(x):
    """[h, w] f32 -> [ceil(h/2), ceil(w/2)]: edge-pad to even, 2x2 average.
    Bit-exact vs _avgpool2_hw (see module docstring)."""
    h, w = x.shape
    if h & 1:
        x = jnp.concatenate([x, x[-1:]], axis=0)
    if w & 1:
        x = jnp.concatenate([x, x[:, -1:]], axis=1)
    H, W = x.shape
    x = x.reshape(H // 2, 2, W).sum(axis=1)          # sublane pair-sum
    x = x.T.reshape(W // 2, 2, H // 2).sum(axis=1)   # lane pairs via T
    return x.T * 0.25


def _up2(x, out_h: int, out_w: int):
    """Nearest 2x upsample to (out_h, out_w) <= (2h, 2w): replication via
    broadcast+reshape on the sublane axis (lane axis via transpose)."""
    h, w = x.shape
    x = jnp.broadcast_to(x[:, None, :], (h, 2, w)).reshape(2 * h, w)
    x = x[:out_h]
    x = x.T
    x = jnp.broadcast_to(x[:, None, :], (w, 2, out_h)).reshape(2 * w, out_h)
    return x[:out_w].T


def _kernel(q_ref, o_ref):
    """One (eye, frame): q_ref [4, 1, h, w] f32 (img*valid x3, pooled
    valid) -> o_ref [3, 1, h, w] f32 filled estimate."""
    img = [q_ref[k, 0] for k in range(3)]
    msk = q_ref[3, 0]

    levels = []
    while max(msk.shape) > 1:
        levels.append((img, msk))
        img = [_pool2(c) for c in img]
        msk = _pool2(msk)

    filled = [c / jnp.maximum(msk, 1e-8) for c in img]
    for img_l, msk_l in reversed(levels):
        oh, ow = msk_l.shape
        den = jnp.maximum(msk_l, 1e-8)
        known = msk_l > 1e-8
        filled = [jnp.where(known, c / den, _up2(f, oh, ow))
                  for c, f in zip(img_l, filled)]

    for k in range(3):
        o_ref[k, 0] = filled[k]


@jax.jit
def pyramid_fill_below(quarter):
    """quarter: [4, B, h, w] float32 — (img*valid r, g, b, valid), already
    pooled to the coarse factor (ops/pool_pallas prepass). Returns the
    [3, B, h, w] float32 masked push-pull estimate, matching the jnp
    level chain in ops/inpaint._pyramid_fill_planar_coarse."""
    K, B, h, w = quarter.shape
    assert K == 4
    return pl.pallas_call(
        _kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((4, 1, h, w), lambda b: (0, b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((3, 1, h, w), lambda b: (0, b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, B, h, w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(quarter)
