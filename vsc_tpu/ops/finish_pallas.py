"""
Fused finish stage — Pallas TPU kernel
======================================

Unsharp mask + integer-ratio area downscale (the stereo pipeline's stages
9-10 for super-sampled runs, stereo_core.py:294-306; the convergence crop
is applied by the caller) in one pass: each grid cell DMAs the haloed
(ratio*block) window of all three channel planes, sharpens in VMEM, and
reduces ratio x ratio boxes via two banded box matmuls (built from iota —
MXU work, no strided slicing). Halo windows are double-buffer-prefetched
(the next cell's DMA runs under the current cell's compute), same pattern
as ops/postprocess_pallas.py.

Only used when the supersampling ratio is an exact integer (the reference
default 3.0 is); other ratios take the jnp taps path. Saves the separate
unsharp blur pass + area pass + one full-resolution intermediate
round-trip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["sharpen_downscale", "sharpen_downscale_planar"]

OUT_BLOCK_R = 64
OUT_BLOCK_C = 256
_HALO = 4  # unsharp 5x5 radius 2, rounded up for 8-row DMA alignment


def _kernel(img_ref, out_ref, win_ref, sem, *, ratio: int, strength: float,
            kern, nb: int, nr: int, nc: int):
    """Grid (B, nr, nc). img_ref: [3, B, Hp, Wp] HBM planes (uint8,
    pre-padded reflect-101: rows by _HALO, cols by 128), DMA'd as ONE
    strided copy per block (r3: the three per-plane copies tripled the
    issue overhead for no bandwidth gain). Output [3, 1, BR, BC] in
    out_ref.dtype — u8 with floor/clip for the planar path (the exact
    quantization ops/stereo applies to the final SBS), f32 for the
    compatibility entry."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    IBR = OUT_BLOCK_R * ratio
    IBC = OUT_BLOCK_C * ratio
    WR = IBR + 2 * _HALO
    WC = IBC + 2 * 128
    t = (b * nr + i) * nc + j
    total = nb * nr * nc
    slot = jax.lax.rem(t, 2)

    def copies(slot_idx, bb, ii, jj):
        return [pltpu.make_async_copy(
            img_ref.at[:, bb, pl.ds(ii * IBR, WR), pl.ds(jj * IBC, WC)],
            win_ref.at[slot_idx], sem.at[slot_idx])]

    @pl.when(t == 0)
    def _start_first():
        for c in copies(slot, b, i, j):
            c.start()

    @pl.when(t + 1 < total)
    def _prefetch_next():
        tn = t + 1
        bn = tn // (nr * nc)
        rem = tn % (nr * nc)
        for c in copies(1 - slot, bn, rem // nc, rem % nc):
            c.start()

    for c in copies(slot, b, i, j):
        c.wait()

    # banded 0/1 box-membership matrices (ratio:1 area average, the 1/ratio^2
    # normalization divides out at the end): 0/1 entries are bf16-exact, so
    # the MXU's DEFAULT single-pass dot loses nothing on the band side
    rows_o = jax.lax.broadcasted_iota(jnp.int32, (OUT_BLOCK_R, IBR), 0)
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (OUT_BLOCK_R, IBR), 1)
    bh = ((rows_i // ratio) == rows_o).astype(jnp.float32)
    cols_i = jax.lax.broadcasted_iota(jnp.int32, (IBC, OUT_BLOCK_C), 0)
    cols_o = jax.lax.broadcasted_iota(jnp.int32, (IBC, OUT_BLOCK_C), 1)
    bw = ((cols_i // ratio) == cols_o).astype(jnp.float32)
    dot = functools.partial(jax.lax.dot_general,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)

    for k in range(3):
        # u8 -> i32 -> f32: Mosaic has no direct unsigned->float cast
        x = win_ref[slot, k].astype(jnp.int32).astype(jnp.float32)
        # separable 5x5 gaussian sigma=1 (kornia kernel law); the window's
        # halo holds reflect-101 values, so borders match the jnp path.
        bw_conv = None
        for tp in range(5):
            term = kern[tp] * x[:, 128 - 2 + tp:128 - 2 + tp + IBC]
            bw_conv = term if bw_conv is None else bw_conv + term
        blur = None
        for tp in range(5):
            term = kern[tp] * bw_conv[_HALO - 2 + tp:_HALO - 2 + tp + IBR, :]
            blur = term if blur is None else blur + term
        center = x[_HALO:_HALO + IBR, 128:128 + IBC]
        sharp = jnp.clip(center + strength * (center - blur), 0.0, 255.0)

        # The DEFAULT single-pass bf16 MXU dot truncates the sharpened f32
        # values (~2^-9 relative) — +-1..2 u8 codes on ~half the output
        # (round-5 stage_hw_vs_interp), below the SSIM gate. Rather than a
        # multi-pass precision mode (Mosaic HIGHEST = 6 passes), split the
        # VALUE operand around the bf16 mantissa: hi/lo are both bf16-exact,
        # bf16 products accumulate exactly in f32, and the 0/1 bands are
        # exact — two DEFAULT dots per axis carry f32-level accuracy
        # (~2^-17 relative, invisible at u8 scale).
        hi = sharp.astype(jnp.bfloat16).astype(jnp.float32)
        lo = sharp - hi
        tmp3 = dot(bh, hi) + dot(bh, lo)
        hi2 = tmp3.astype(jnp.bfloat16).astype(jnp.float32)
        lo2 = tmp3 - hi2
        res = (dot(hi2, bw) + dot(lo2, bw)) / float(ratio * ratio)
        if out_ref.dtype == jnp.uint8:
            res = jnp.floor(jnp.clip(res, 0.0, 255.0)).astype(jnp.int32).astype(jnp.uint8)
        out_ref[k, 0] = res


@functools.partial(jax.jit,
                   static_argnames=("ratio", "strength", "out_h", "out_w"))
def sharpen_downscale(img, ratio: int, strength: float,
                      out_h: int, out_w: int):
    """[B, H', W', 3] u8-valued float (cropped, post-postprocess) ->
    [B, out_h, out_w, 3]: unsharp (5x5 sigma=1, reflect borders) then exact
    ratio:1 box average. H' >= out_h * ratio, W' >= out_w * ratio."""
    B, H, W, C = img.shape
    assert C == 3
    if W < 129 or H < 5:
        # The 128-column / 4-row reflect pads below require W >= 129 and
        # H >= 5 (jnp.pad reflect needs pad < dim). Production frames are
        # always far larger; tiny inputs take the equivalent jnp path.
        from vsc_tpu.ops.filters import unsharp_mask
        from vsc_tpu.ops.resize import resize
        x = img
        if strength > 0:
            x = unsharp_mask(x, strength)
        if (H, W) != (out_h * ratio, out_w * ratio):
            x = x[:, :out_h * ratio, :out_w * ratio]
        return resize(x, out_h, out_w, "area",
                      channel_last=True).astype(jnp.float32)
    # floor/clip before the u8 cast: in-pipeline inputs are u8-valued
    # (identity), but this is a public entry — a bare astype would wrap
    # out-of-range floats and truncate fractions silently
    planes = jnp.moveaxis(
        jnp.floor(jnp.clip(img, 0.0, 255.0)), -1, 0).astype(jnp.uint8)
    out = _sharpen_downscale_planes(planes, ratio, strength, out_h, out_w,
                                    jnp.float32)
    return jnp.moveaxis(out, 0, -1)


@functools.partial(jax.jit,
                   static_argnames=("ratio", "strength", "out_h", "out_w"))
def sharpen_downscale_planar(planes, ratio: int, strength: float,
                             out_h: int, out_w: int):
    """Planar-u8 entry (the production TPU eye path): [3, B, H', W'] uint8
    (cropped, post-postprocess) -> [3, B, out_h, out_w] uint8 with the
    final floor/clip quantization applied in-kernel (exactly the
    ``floor(clip(sbs, 0, 255))`` ops/stereo applies to the f32 form)."""
    K, B, H, W = planes.shape
    assert K == 3
    assert W >= 129 and H >= 5, "planar finish expects production frames"
    return _sharpen_downscale_planes(planes, ratio, strength, out_h, out_w,
                                     jnp.uint8)


def _sharpen_downscale_planes(planes, ratio: int, strength: float,
                              out_h: int, out_w: int, out_dtype):
    B = planes.shape[1]
    nr = pl.cdiv(out_h, OUT_BLOCK_R)
    nc = pl.cdiv(out_w, OUT_BLOCK_C)
    IBR = OUT_BLOCK_R * ratio
    IBC = OUT_BLOCK_C * ratio
    need_r = (nr - 1) * IBR + IBR + 2 * _HALO
    need_c = (nc - 1) * IBC + IBC + 2 * 128

    padded = jnp.pad(planes, [(0, 0), (0, 0), (_HALO, _HALO), (128, 128)],
                     mode="reflect")
    pad_r = max(0, need_r - padded.shape[2])
    pad_c = max(0, need_c - padded.shape[3])
    # tail beyond the reflect halo only feeds out rows/cols that get sliced
    padded = jnp.pad(padded, [(0, 0), (0, 0), (0, pad_r), (0, pad_c)],
                     mode="edge")

    from vsc_tpu.ops.filters import gaussian_kernel1d
    kern = tuple(float(v) for v in gaussian_kernel1d(5, 1.0))

    WR = IBR + 2 * _HALO
    WC = IBC + 2 * 128
    out = pl.pallas_call(
        functools.partial(_kernel, ratio=ratio, strength=strength,
                          kern=kern, nb=B, nr=nr, nc=nc),
        grid=(B, nr, nc),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((3, 1, OUT_BLOCK_R, OUT_BLOCK_C),
                               lambda b, i, j: (0, b, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (3, B, nr * OUT_BLOCK_R, nc * OUT_BLOCK_C), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 3, WR, WC), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(padded)
    return out[:, :, :out_h, :out_w]
