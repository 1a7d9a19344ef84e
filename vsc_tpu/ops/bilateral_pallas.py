"""
Bilateral artifact smoothing + pyramid pool prepass — Pallas TPU kernel
=======================================================================

The bilateral filter of the per-eye postprocess (cv2 weight laws,
/root/reference/helper/stereo_core.py:387-412) used to run INSIDE the fused
fill kernel (ops/postprocess_pallas.py), whose block geometry is tuned for
hole predication: 64x512 blocks with a (24, 128) stencil halo, so every
bilateral tap was computed on a window 1.72x the output block — the halo
recompute alone was ~40% of the pipeline's single heaviest kernel.

Here the bilateral runs in its own kernel over FULL-WIDTH row strips: the
halo is only the filter radius (rows; columns ride a one-time reflect pad),
so overhead drops to ~1.06x, and the same window ALSO produces the
quarter-resolution (img*valid, valid) pool stack that seeds the inpaint
pyramid (ops/inpaint._pyramid_fill_planar_coarse) — the pool prepass kernels
(ops/pool_pallas.py) and their extra full-res HBM pass disappear.

Dataflow (production planar-u8 eye pipeline, ops/stereo.py):

  warp eye4 [4, B, H, W] u8 ──> THIS KERNEL ──> filtered eye4 (bilateral
    r, g, b + valid passthrough) ──> postprocess kernel, smoothing=0 path
                               └──> quarter [4, B, H/4, ~W/4] f32
                                      ──> pyramid tail ──> smooth_q

Exactness:
  - weights/accumulation are the postprocess kernel's own bilateral code
    (same _row_cache rolls, same symmetric pairing, same f32 order), so
    filtered values are bit-identical to the fused form;
  - borders: the stack is reflect-101 pre-padded exactly like the
    postprocess kernel pads; the pairing's roll-wrap garbage stays outside
    the written center because every margin >= 2*radius;
  - pools are the two-level average ladder of _pyramid_fill_planar_coarse
    (2x2 sums * 0.25 with a mid-level edge column pad when W/2 is odd) —
    power-of-two scaling makes each level bit-exact vs the jnp chain
    (see ops/pool_pallas.py docstring), and 4-row pool groups never
    straddle a strip because rows_per_strip % 4 == 0.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vsc_tpu.ops.postprocess_pallas import (_bilateral_offs, _from_cache,
                                            _row_cache, _shift)

__all__ = ["bilateral_pool_planar", "bilateral_pool_supported"]

# rows per strip: full-width strips are dense (no predication), so the only
# geometry tradeoffs are VMEM footprint vs per-cell dispatch overhead.
_ROWS = int(os.environ.get("VSC_TPU_BF_ROWS", "32"))
assert _ROWS % 4 == 0, "VSC_TPU_BF_ROWS must be a multiple of 4 (pool groups)"


def _pool4_2lvl(x, w2_odd: bool):
    """[H, W] f32 (integer-valued, <= 255 after masking) -> the two-level
    2x2-average ladder [H/4, Wq] with the mid-level edge column pad.

    BIT-exact vs pool2(pool2(.)) for integer input despite the reordering:
    every partial sum is an integer <= 16*255 and every scale is a power of
    two, so each value is exactly representable in f32 at every step and
    the summation order cannot change a bit (same argument as
    ops/pool_pallas.avgpool4_eye4). One transpose pair per plane instead of
    two (in-VMEM transposes of full-width strips were the kernel's
    dominant pool cost at four per level)."""
    H, W = x.shape
    x = x.reshape(H // 4, 4, W).sum(axis=1)          # both row levels at once
    x = x.T                                          # [W, H/4]
    x = x.reshape(W // 2, 2, H // 4).sum(axis=1)     # col level 1
    if w2_odd:
        x = jnp.concatenate([x, x[-1:]], axis=0)     # edge col (now sublane)
    x = x.reshape(x.shape[0] // 2, 2, H // 4).sum(axis=1)  # col level 2
    return x.T * 0.0625


def _radius_for(smoothing: float) -> int:
    return max(5, min(int(smoothing * 4), 15)) // 2


def _kernel(eye_ref, out_ref, q_ref, win_ref, sem,
            *, W: int, R: int, pad_r: int, nr: int, nb: int,
            smoothing: float, paired: bool, w2_odd: bool):
    """Grid (B, nr). eye_ref: [4, B, Hp, Wp] uint8 HBM, reflect-padded
    pad_r rows top/bottom and (128, pad_c) columns; window = one strip of
    R + 2*pad_r rows, full padded width. Outputs: filtered center
    [4, 1, R, W] u8 and the strip's quarter pool [4, 1, R/4, Wq] f32."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    WR = R + 2 * pad_r
    t = b * nr + i
    total = nb * nr
    slot = jax.lax.rem(t, 2)

    def copy(slot_idx, bb, ii):
        return pltpu.make_async_copy(
            eye_ref.at[:, bb, pl.ds(ii * R, WR), :],
            win_ref.at[slot_idx], sem.at[slot_idx])

    @pl.when(t == 0)
    def _start_first():
        copy(slot, b, i).start()

    @pl.when(t + 1 < total)
    def _prefetch_next():
        tn = t + 1
        copy(1 - slot, tn // nr, tn % nr).start()

    copy(slot, b, i).wait()

    win = win_ref[slot].astype(jnp.int32).astype(jnp.float32)  # [4, WR, Wp]
    csl = (slice(pad_r, pad_r + R), slice(128, 128 + W))

    # ---- bilateral (identical weight laws + accumulation order to the
    # fused form in ops/postprocess_pallas.py)
    radius = _radius_for(smoothing)
    sigma_space = smoothing * 25.0
    inv2sc = -0.5 / (30.0 * 30.0)
    stacked = win[:3]
    chans = [stacked[k] for k in range(3)]
    num = stacked + 0.0
    den = jnp.ones(stacked.shape[1:], jnp.float32)
    rows = _row_cache(stacked, radius)
    for dy, dx in _bilateral_offs(radius):
        if (dy, dx) == (0, 0):
            continue
        if paired and (dy, dx) < (0, 0):
            continue
        sw = math.exp(-0.5 * (dy * dy + dx * dx)
                      / (sigma_space * sigma_space))
        sh = _from_cache(rows, dy, dx)
        cdiff = (jnp.abs(sh[0] - chans[0]) + jnp.abs(sh[1] - chans[1])
                 + jnp.abs(sh[2] - chans[2]))
        wgt = sw * jnp.exp(inv2sc * (cdiff * cdiff))
        num = num + wgt * sh
        den = den + wgt
        if paired:
            sh_m = _from_cache(rows, -dy, -dx)
            wgt_m = _shift(wgt, -dy, -dx)
            num = num + wgt_m * sh_m
            den = den + wgt_m
    for k in range(3):
        out_ref[k, 0] = jnp.round(jnp.clip(
            num[k][csl] / den[csl], 0.0, 255.0)).astype(jnp.int32).astype(
                jnp.uint8)
    out_ref[3, 0] = win_ref[slot, 3][csl]           # valid passthrough

    # ---- quarter pool of the PRE-bilateral (img*valid, valid) planes —
    # the pyramid estimate's input contract (ops/stereo._postprocess_eye
    # computes smooth from the pre-bilateral image on every path)
    if q_ref is not None:
        msk = win[3][csl]
        for k in range(4):
            p = (win[k][csl] * msk) if k < 3 else msk
            q_ref[k, 0] = _pool4_2lvl(p, w2_odd)     # [R/4, Wq]


def bilateral_pool_supported(H: int, W: int, smoothing: float) -> bool:
    """Geometry guard: strip pooling needs H % 4 == 0 and W even; the
    reflect pads need the dims to exceed them."""
    if smoothing <= 0:
        return False
    pad_r = -(-2 * _radius_for(smoothing) // 8) * 8
    return (H % 4 == 0 and W % 2 == 0 and H > pad_r and W > 129
            and _ROWS % 4 == 0)


@functools.partial(jax.jit, static_argnames=("smoothing", "pool"))
def bilateral_pool_planar(eye4, smoothing: float, pool: bool = True):
    """Fused bilateral + pyramid pool prepass over the warp kernel's planar
    eyes.

    Args:
      eye4: [4, B, H, W] uint8 (r, g, b, valid) — both eyes ride the batch
        axis in production (ops/stereo.py concatenates them).
      smoothing: StereoParams.artifact_smoothing (static, > 0).

    Returns:
      filtered: [4, B, H, W] uint8 — bilateral-smoothed r, g, b (the exact
        u8 values the fused postprocess kernel's bilateral produced) with
        the valid plane passed through; feed to
        postprocess_eye_planar_pallas(..., smoothing=0.0).
      quarter: [4, B, H//4, Wq] float32 — the pooled (img*valid x3, valid)
        stack, = ops/inpaint's avgpool2(avgpool2(.)) ladder with the mid
        edge pad; feed to _pyramid_fill_planar_coarse(quarter4=...).
    """
    K, B, H, W = eye4.shape
    assert K == 4
    radius = _radius_for(smoothing)
    # row pad: >= 2*radius (pairing margin), multiple of 8 so the center
    # slice stays sublane-aligned; columns: 128 left (lane alignment),
    # >= 2*radius right
    pad_r = -(-2 * radius // 8) * 8
    pad_c = -(-2 * radius // 8) * 8
    R = _ROWS
    nr = pl.cdiv(H, R)
    W2 = W // 2
    w2_odd = bool(W2 & 1)
    Wq = (W2 + (W2 & 1)) // 2

    padded = jnp.pad(eye4, [(0, 0), (0, 0), (pad_r, pad_r), (128, pad_c)],
                     mode="reflect")
    # the manual HBM->VMEM window copy requires a 128-aligned minor extent
    # (Mosaic: "Slice shape along dimension 3 must be aligned to tiling");
    # the zero tail sits beyond the reflect margin, so rolls never read it
    # within the filter radius of any written column
    Wp = -(-padded.shape[3] // 128) * 128
    padded = jnp.pad(padded, [(0, 0), (0, 0),
                              (0, nr * R + 2 * pad_r - padded.shape[2]),
                              (0, Wp - padded.shape[3])])
    WR = R + 2 * pad_r

    base = functools.partial(
        _kernel, W=W, R=R, pad_r=pad_r, nr=nr, nb=B, smoothing=smoothing,
        paired=os.environ.get("VSC_TPU_PP_PAIRED", "1") == "1",
        w2_odd=w2_odd)
    if pool:
        kernel = base
    else:
        def kernel(eye_ref, out_ref, win_ref, sem):
            base(eye_ref, out_ref, None, win_ref, sem)

    out_specs = [pl.BlockSpec((4, 1, R, W), lambda b, i: (0, b, i, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((4, B, nr * R, W), jnp.uint8)]
    if pool:
        out_specs.append(pl.BlockSpec((4, 1, R // 4, Wq),
                                      lambda b, i: (0, b, i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((4, B, nr * (R // 4), Wq),
                                              jnp.float32))

    outs = pl.pallas_call(
        kernel,
        grid=(B, nr),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, 4, WR, Wp), jnp.uint8),   # double-buffered strips
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(padded)

    if not pool:
        return outs[0][:, :, :H], None
    return outs[0][:, :, :H], outs[1][:, :, :H // 4]
