"""
Non-overlapping 2x2/stride-2 ConvTranspose — Pallas TPU kernel
==============================================================

The DepthPro encoder upsample stack, decoder fusion blocks and depth head
(models/depthpro.py, mirroring the model the reference runs as ONNX,
/root/reference/depth_map_generator.py:303-324) are chains of
ConvTranspose2d(kernel=2, stride=2, padding=0). Each output pixel depends
on exactly ONE input pixel:

    out[n, 2i+a, 2j+b, o] = sum_c in[n, i, j, c] * K[a, b, c, o]  (+ bias)

XLA lowers the op via conv with lhs_dilation=2 — a gradient-style path that
processes the zero-dilated input and measured ~5% of its bandwidth roofline
at production shapes (~18 ms/frame across the upsample stack, BASELINE.md).
A matmul + depth-to-space rewrite in XLA won 2x standalone but lost
in-context: the [B, H, W, 2, 2, O] interleave temporaries are HBM-level
relayouts (scripts/profile_deconv.py).

Here the interleave happens in VMEM: each grid step computes the four
phase matmuls z_ab = X @ K[a, b]  (MXU, [TH*W, C] x [C, O]) and assembles
the interleaved [2*TH, 2*W, O] output tile with register-level
stack+reshape — the row interleave is a free major-dim merge, the column
interleave a sublane-level shuffle. One HBM read of the input tile, one
HBM write of the output tile, nothing else.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["deconv2x2_pallas", "deconv2x2_supported"]


def deconv2x2_supported(x, features: int) -> bool:
    """Shape/layout guard: lane-aligned channels, sublane-aligned width,
    row-tileable height. Callers fall back to the XLA conv path otherwise
    (tiny test configs, odd geometries)."""
    if x.ndim != 4:
        return False
    _, H, W, C = x.shape
    return (C % 128 == 0 and features % 128 == 0
            and W % 8 == 0 and H % 8 == 0)


def _kernel(x_ref, k_ref, b_ref, o_ref, *, TH: int, W: int, O: int,
            has_bias: bool):
    x = x_ref[0]                                   # [TH, W, C]
    C = x.shape[-1]
    xf = x.reshape(TH * W, C)
    kb = k_ref[...].astype(x.dtype)                # [2, 2, C, O]
    bias = b_ref[...].astype(x.dtype) if has_bias else None

    rows = []
    for a in range(2):
        cols = []
        for b in range(2):
            z = jax.lax.dot_general(
                xf, kb[a, b], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            z = z.astype(o_ref.dtype)
            if has_bias:
                z = z + bias
            cols.append(z.reshape(TH, W, O))
        # column interleave: [TH, W, 2, O] -> [TH, 2W, O] (sublane shuffle)
        rows.append(jnp.stack(cols, axis=2).reshape(TH, 2 * W, O))
    # row interleave: [TH, 2, 2W, O] -> [2TH, 2W, O] (major merge, free)
    o_ref[0] = jnp.stack(rows, axis=1).reshape(2 * TH, 2 * W, O)


@functools.partial(jax.jit, static_argnames=())
def deconv2x2_pallas(x, kernel, bias=None):
    """ConvTranspose2d(kernel=2, stride=2, padding=0).

    x: [B, H, W, C]; kernel: [2, 2, C, O] (f32 params, cast to x.dtype for
    the MXU like the conv path); bias: [O] or None. Returns
    [B, 2H, 2W, O] in x.dtype. Numerics match the conv_general_dilated
    form (same per-pixel [C]x[C,O] contraction, f32 accumulation)."""
    B, H, W, C = x.shape
    O = kernel.shape[-1]
    TH = 8
    # keep the output tile ~<=6.5 MB; widen rows for small W*O tiles
    while TH * 2 < H and H % (TH * 2) == 0 and 8 * TH * W * O * 2 <= 3 * 2**20:
        TH *= 2
    nh = H // TH

    has_bias = bias is not None
    args = [x, kernel]
    in_specs = [
        pl.BlockSpec((1, TH, W, C), lambda n, i: (n, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    if has_bias:
        args.append(bias.reshape(1, O))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    else:
        args.append(jnp.zeros((1, 1), jnp.float32))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    return pl.pallas_call(
        functools.partial(_kernel, TH=TH, W=W, O=O, has_bias=has_bias),
        grid=(B, nh),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 2 * TH, 2 * W, O),
                               lambda n, i: (n, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 2 * H, 2 * W, O), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(*args)
