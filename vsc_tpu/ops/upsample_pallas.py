"""
Integer-factor bilinear upsample — Pallas TPU kernel
====================================================

The supersampling resize (ops/resize.py integer fast path) as banded
matmuls: each OUTPUT block DMAs its small input window and computes
out = R @ win @ C where R/C are the 2-tap bilinear weight bands, built
in-kernel from iota (no dense constants in the program — the compile relay
413s payloads with big constant matrices).

Why: the jnp phase-decomposition path materializes a stacked-phase tensor
and reshapes it into the interleaved output — a layout change XLA executes
as expensive sublane/lane shuffles (~7 ms/frame at supersampled-1080p
shapes). Here the interleave IS the banded matmul's output ordering: MXU
work, one HBM write of the final output, halo windows double-buffer-
prefetched (same pattern as ops/postprocess_pallas.py).

Numerics: identical to resize()'s integer-factor path (same half-pixel
source mapping src = (o + 0.5)/f - 0.5, same clamped borders): the R/C
entries are exactly {1-w1, w1} at the same taps, so results match the
torch-parity-tested jnp path to f32 rounding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["upsample_bilinear_int_pallas"]

BLOCK_R = 64
BLOCK_C = 512


def _band(n_out: int, n_in_win: int, base_out: int, base_in, f: int,
          src_len: int, transpose: bool):
    """Bilinear weight band W[o, i] (or its transpose): weight of input row
    `base_in + i` for output row `base_out + o`, with edge clamping.

    base_in is a traced scalar (the window's input start); everything else
    is static. Built from iota compares — O(n_out * n_in_win) VPU ops."""
    sh = (n_in_win, n_out) if transpose else (n_out, n_in_win)
    o_axis = 1 if transpose else 0
    o = jax.lax.broadcasted_iota(jnp.int32, sh, o_axis) + base_out
    i = jax.lax.broadcasted_iota(jnp.int32, sh, 1 - o_axis) + base_in
    # src = (o + 0.5)/f - 0.5 ; x0 = floor(src) ; w1 = src - x0
    # computed in exact integer arithmetic: src*f = o - (f-1)/2 (offset
    # numerator), x0 = floor_div(2*o - (f-1), 2*f), frac = remainder / (2f)
    num = 2 * o - (f - 1)                      # = 2*f*src
    x0 = jnp.floor_divide(num, 2 * f)
    k = (num - x0 * 2 * f).astype(jnp.float32)   # = w1 * 2f, integer 0..2f-1
    x0c = jnp.clip(x0, 0, src_len - 1)
    x1c = jnp.clip(x0 + 1, 0, src_len - 1)
    # INTEGER-SCALED band (entries w * 2f in {0..2f}): integers <= 16 are
    # bf16-exact, so a DEFAULT single-pass MXU dot with this operand loses
    # nothing — the caller divides the final result by (2f)^2. (The
    # fractional w1 form needed a multi-pass precision mode: bf16(k/2f)
    # truncation put +-1..2 u8 codes on ~35% of pixels.)
    band = (jnp.where(i == x0c, 2.0 * f - k, 0.0)
            + jnp.where(i == x1c, k, 0.0))
    return band.astype(jnp.float32)


def _kernel(x_ref, o_ref, win_ref, sem, *, f: int, H: int, W: int,
            win_r: int, win_c: int, nn: int, nr: int, nc: int,
            quantize_u8: bool):
    n = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    t = (n * nr + i) * nc + j
    total = nn * nr * nc
    slot = jax.lax.rem(t, 2)

    def in_r0(ii):
        # first input row any output row of block ii can touch: x0 of the
        # block's first output row, clamped to 0; aligned down to 8
        base = jnp.maximum((2 * (ii * BLOCK_R) - (f - 1)) // (2 * f), 0)
        return (base // 8) * 8

    def in_c0(jj):
        base = jnp.maximum((2 * (jj * BLOCK_C) - (f - 1)) // (2 * f), 0)
        return (base // 128) * 128

    def copy(slot_idx, n_, i_, j_):
        return pltpu.make_async_copy(
            x_ref.at[n_, pl.ds(in_r0(i_), win_r), pl.ds(in_c0(j_), win_c)],
            win_ref.at[slot_idx], sem.at[slot_idx])

    @pl.when(t == 0)
    def _first():
        copy(slot, n, i, j).start()

    @pl.when(t + 1 < total)
    def _next():
        tn = t + 1
        nnext = tn // (nr * nc)
        rem = tn % (nr * nc)
        copy(1 - slot, nnext, rem // nc, rem % nc).start()

    copy(slot, n, i, j).wait()
    win = win_ref[slot]
    R6 = _band(BLOCK_R, win_r, i * BLOCK_R, in_r0(i), f, H, transpose=False)
    C6 = _band(BLOCK_C, win_c, j * BLOCK_C, in_c0(j), f, W, transpose=True)
    # Exactness on the MXU at DEFAULT (single-pass bf16) precision: the
    # default pass truncates OPERANDS to bf16, which put +-1..2 u8 codes on
    # ~35% of output pixels with fractional weights (round-5
    # stage_hw_vs_interp) and dragged hardware SSIM below the 0.99 gate.
    # Instead of a multi-pass precision mode (Mosaic's HIGHEST = 6 passes,
    # measured +1.6 ms/frame), feed the MXU only bf16-EXACT operands:
    # integer-scaled bands (<= 2f <= 16), and values split hi/lo around the
    # bf16 mantissa (bf16xbf16 products accumulate exactly in f32). The
    # (2f)^2 scale divides out at the end.
    dot = functools.partial(jax.lax.dot_general,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if quantize_u8:
        # u8-valued inputs are bf16-exact as-is; rows6 is then exact
        # integers <= 2f*255, split 16*hi + lo with hi <= 95, lo <= 15 —
        # both bf16-exact — so every product and sum below is exact.
        rows6 = dot(R6, win)
        hi = jnp.floor(rows6 * 0.0625)
        lo = rows6 - 16.0 * hi
        res6 = 16.0 * dot(hi, C6) + dot(lo, C6)
    else:
        # arbitrary f32 values (the depth plane): hi/lo split carries the
        # full mantissa across two exact passes (error ~2^-17 relative,
        # invisible at u8 scale and far below the depth chain's needs)
        hi = win.astype(jnp.bfloat16).astype(jnp.float32)
        lo = win - hi
        rows6 = dot(R6, hi) + dot(R6, lo)
        hi2 = rows6.astype(jnp.bfloat16).astype(jnp.float32)
        lo2 = rows6 - hi2
        res6 = dot(hi2, C6) + dot(lo2, C6)
    res = res6 / float((2 * f) * (2 * f))
    if quantize_u8:
        # fused floor-to-u8 (the warp input quantization point; exact —
        # flooring commutes with the warp's winner-take selection).
        # +2^-10 before the floor: exact results live on the 1/(2f)^2 grid
        # (res6 is an exact integer, so integer-valued outputs divide out
        # EXACTLY), and the closest below-integer grid point is
        # 1 - 1/(2f)^2 >= 1/256 away for f <= 8 — the epsilon can never
        # lift a true non-integer but absorbs any last-ulp rounding.
        res = jnp.floor(jnp.clip(res + 0.0009765625, 0.0, 255.0)).astype(
            jnp.int32).astype(jnp.uint8)
    o_ref[0] = res


@functools.partial(jax.jit, static_argnames=("factor", "quantize_u8"))
def upsample_bilinear_int_pallas(x, factor: int, quantize_u8: bool = False):
    """[N, H, W] f32 -> [N, H*f, W*f], bilinear, torch align_corners=False
    semantics (drop-in for the resize() integer-factor path).

    quantize_u8 fuses floor(clip(., 0, 255)) -> uint8 into the kernel
    epilogue (the planar-u8 stereo path's warp input quantization): the
    supersampled f32 planes never reach HBM."""
    N, H, W = x.shape
    f = factor
    # the in-kernel exactness argument (integer bands <= 2f bf16-exact,
    # hi = rows6/16 <= 2f*255/16 <= 256, epsilon < 1/(2f)^2) needs f <= 8;
    # production supersampling factors are 2-4
    assert 1 < f <= 8, f"integer upsample factor {f} out of supported range"
    OH, OW = H * f, W * f
    nr = pl.cdiv(OH, BLOCK_R)
    nc = pl.cdiv(OW, BLOCK_C)
    # window size: input rows a block can touch = BLOCK_R/f + 2, plus up to
    # 8/128 of start alignment slack
    win_r = -(-(BLOCK_R // f + 2 + 8) // 8) * 8
    win_c = -(-(BLOCK_C // f + 2 + 128) // 128) * 128
    # pad the input so every aligned window is in bounds (values past the
    # clamped taps are never weighted)
    max_r0 = ((2 * ((nr - 1) * BLOCK_R) - (f - 1)) // (2 * f) // 8) * 8
    max_c0 = ((2 * ((nc - 1) * BLOCK_C) - (f - 1)) // (2 * f) // 128) * 128
    Hp = max(max_r0, 0) + win_r
    Wp = max(max_c0, 0) + win_c
    xp = jnp.pad(x, [(0, 0), (0, max(0, Hp - H)), (0, max(0, Wp - W))])

    out = pl.pallas_call(
        functools.partial(_kernel, f=f, H=H, W=W, win_r=win_r, win_c=win_c,
                          nn=N, nr=nr, nc=nc, quantize_u8=quantize_u8),
        grid=(N, nr, nc),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, BLOCK_R, BLOCK_C),
                               lambda n, i, j: (n, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (N, nr * BLOCK_R, nc * BLOCK_C),
            jnp.uint8 if quantize_u8 else jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, win_r, win_c), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(xp)
    return out[:, :OH, :OW]
