"""
Forward stereo warp — Pallas TPU kernel
=======================================

Same math as vsc_tpu.ops.warp (gather reformulation of the reference's
depth-sorted splat, stereo_core.py:110-190), as a fused Pallas kernel.

Why: the jnp version unrolls ceil(max_disparity)+2 shifted reads of four
[B, H, W] planes; XLA's fusion re-reads operand windows from HBM per shift,
so the stage is HBM-bound at ~50x the theoretical traffic. Here each grid
cell DMAs one row-block of the (pre-padded) disparity and image planes into
VMEM once, runs the whole shift loop out of VMEM for BOTH eyes, and writes
the four outputs once: HBM traffic drops from O(D * H * W) to O(H * W).

Layout: channel-last inputs are split into channel planes outside the
kernel so every ref is a 2-D [rows, W(+2P)] tile — rows on sublanes, W on
lanes, the native VPU shape.

The kernel treats out-of-image sources via a -inf disparity sentinel in the
padding: floor(-inf) never equals any shift, so padded columns simply never
win the priority selection.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["forward_warp_stereo_pallas", "forward_warp_stereo_pallas_planar",
           "forward_warp_stereo_pallas_planar_u8"]

_SENTINEL = -3.0e4  # disparity sentinel for padded columns (floor != any s)


import os

# column-chunk width for per-chunk range predication (lane-aligned; 512
# measured best vs 256 at production widths — see BASELINE.md r3 notes)
_CHUNK_C = int(os.environ.get("VSC_TPU_WARP_CHUNK", "512"))
# a non-multiple-of-128 chunk silently breaks the lane alignment of every
# osl/ssl slice below (perf cliff or Mosaic lowering error) — validate at
# import like VSC_TPU_PP_BLOCK_C does
assert _CHUNK_C % 128 == 0, "VSC_TPU_WARP_CHUNK must be a multiple of 128"

# shifts per predicated group: the running best is register-carried within
# a group, refs touched only at group boundaries; larger groups cut ref
# round-trips but predicate coarser (8 measured best of {8,12,16} on v5e)
_GRP = int(os.environ.get("VSC_TPU_WARP_GRP", "8"))
assert _GRP >= 1, "VSC_TPU_WARP_GRP must be >= 1"


def _warp_kernel(disp_ref, r_ref, g_ref, b_ref,
                 left_ref, right_ref,
                 *refs,
                 W: int, P: int, D: int, inv_max_disp: float, packed: bool):
    """One row-block. disp/r/g/b refs: [TH, W + 2P]; outputs left/right:
    [4, TH, W] uint8 (r, g, b, mask) — the warped colors are floored to u8
    IN the kernel (exact: the winner-take selection depends only on depth,
    never on color values, so flooring before the scan equals the API's
    floor-after; floor/clip is also the postprocess stage's first op in
    both paths, ops/stereo._postprocess_eye), and the working planes never
    leave VMEM (they are scratch, not outputs): HBM writes drop 10x f32 ->
    8x u8 per row-block.

    Two statically-selected carry forms (VSC_TPU_WARP_PACKED):
      - legacy (default): the scan carries (key, weight, r, g, b) — five
        selects per shift.
      - packed: the scan carries (key, frac, packed) — the floored u8
        colors pack exactly into one f32 (r + 256 g + 65536 b <= 2^24 - 1)
        and the winner's blend weight is recovered in the epilogue from
        the carried source frac plus the key's class band (ceil-class keys
        live in [2, 3], floor-class in [0, 1]): 3 selects per shift and
        40% less group-boundary scratch traffic. Outputs are bit-identical
        (tests/test_warp_pallas.py runs both). DEFAULT since r4: measured
        -3.0 ms/frame SBS on v5e (57.1 -> 54.1 at 1080p defaults);
        VSC_TPU_WARP_PACKED=0 reverts to the legacy carry.

    The shift loop is predicated per COLUMN CHUNK (r3): a full-width row
    strip of scene-like depth spans most of the disparity range, so
    block-level [m_lo, m_hi] predication rarely skipped anything. Depth is
    locally smooth along x too, so a 512-column chunk's disparity range is
    a small band and most shift groups skip. An output chunk's sources live
    within +-P of its columns — exactly the halo already in VMEM — so each
    chunk computes its range over its source span and runs the group loop
    independently, reading/writing only its own output slice."""
    disp = disp_ref[...]
    n_carry = 3 if packed else 5
    l_refs, r_refs = refs[:n_carry], refs[n_carry:2 * n_carry]

    def _u8val(ref, quantize: bool):
        # color planes arrive u8 on the planar path (i32 hop: Mosaic has
        # no direct unsigned->float cast, already integral) or f32 from
        # the compat entries (floored before the scan on the packed form,
        # see docstring; the legacy form floors at the epilogue instead)
        v = ref[...]
        if v.dtype != jnp.float32:
            return v.astype(jnp.int32).astype(jnp.float32)
        return jnp.floor(jnp.clip(v, 0.0, 255.0)) if quantize else v

    if packed:
        packed_all = (_u8val(r_ref, True) + 256.0 * _u8val(g_ref, True)
                      + 65536.0 * _u8val(b_ref, True))
    else:
        red = _u8val(r_ref, False)
        green = _u8val(g_ref, False)
        blue = _u8val(b_ref, False)

    neg_inf = jnp.float32(-jnp.inf)

    def run_eye(sign, s_lo, s_hi, refs, out_ref):
        # Loop-invariant planes, computed ONCE per block per eye: the shift
        # loop below then only slices + compares (the floor/frac/mul chain
        # used to run inside every one of the ~D iterations).
        d_signed = disp * sign
        k_all = jnp.floor(d_signed)
        frac_all = d_signed - k_all
        # depth key in [0, 1]: |disp| / max_disp (sign * sign == 1)
        z_all = d_signed * (sign * inv_max_disp)
        ceil_ok = frac_all > 0.3
        in_img = jnp.abs(k_all) < 2.0e4

        refs[0][...] = jnp.full((disp.shape[0], W), neg_inf, jnp.float32)
        for ref in refs[1:]:
            ref[...] = jnp.zeros((disp.shape[0], W), jnp.float32)

        for c0 in range(0, W, _CHUNK_C):
            cw = min(_CHUNK_C, W - c0)
            osl = (slice(None), slice(c0, c0 + cw))
            # chunk sources: window columns [c0, c0 + cw + 2P) in padded
            # coords = output columns [c0 - P, c0 + cw + P)
            ssl = (slice(None), slice(c0, c0 + cw + 2 * P))
            k_src = k_all[ssl]
            in_src = in_img[ssl]
            m_lo = jnp.min(jnp.where(in_src, k_src, jnp.float32(1e9)))
            m_hi = jnp.max(jnp.where(in_src, k_src, jnp.float32(-1e9)))

            # Predicate GROUPS of shifts, not single ones: the scalar-core
            # branch chain itself costs ~0.1 us/iteration/cell, which at
            # ~600 iterations x ~400 cells would eat the predication win.
            # WITHIN a group the running best is carried as VALUES
            # (registers); the output refs are only read/written at group
            # boundaries — per-iteration ref round-trips measured as the
            # kernel's dominant cost (10 VMEM plane touches per shift).
            GRP = _GRP
            for g in range(s_lo, s_hi, GRP):
                g_hi = min(g + GRP, s_hi)

                @pl.when((jnp.float32(g_hi - 1) >= m_lo)
                         & (jnp.float32(g) <= m_hi + 1))
                def _group(g=g, g_hi=g_hi, c0=c0, cw=cw, osl=osl):
                    best = tuple(ref[osl] for ref in refs)
                    for s in range(g, g_hi):
                        lo = P - s + c0
                        sl = (slice(None), slice(lo, lo + cw))
                        k = k_all[sl]
                        frac = frac_all[sl]
                        z_s = z_all[sl]
                        is_floor = k == s
                        is_ceil = (k == s - 1) & ceil_ok[sl]
                        key = jnp.where(is_ceil, 2.0 + z_s,
                                        jnp.where(is_floor, z_s, neg_inf))
                        if packed:
                            cand = (key, frac, packed_all[sl])
                        else:
                            wgt = jnp.where(is_ceil, frac, 1.0 - frac)
                            cand = (key, wgt, red[sl], green[sl], blue[sl])
                        take = key > best[0]
                        best = tuple(jnp.where(take, c, b)
                                     for c, b in zip(cand, best))
                    for ref, b in zip(refs, best):
                        ref[osl] = b

        # epilogue: the winner's u8 colors + validity mask, written once
        if packed:
            # unpack (exact integer f32 arithmetic, values < 2^24) +
            # blend weight from the key class band
            key = refs[0][...]
            frac = refs[1][...]
            pk = refs[2][...]
            b_v = jnp.floor(pk * (1.0 / 65536.0))
            rem = pk - b_v * 65536.0
            g_v = jnp.floor(rem * (1.0 / 256.0))
            r_v = rem - g_v * 256.0
            for k, cval in enumerate((r_v, g_v, b_v)):
                out_ref[k] = cval.astype(jnp.int32).astype(jnp.uint8)
            wgt = jnp.where(key >= 2.0, frac, 1.0 - frac)
            mask = (wgt > 0.1) & (key > neg_inf)
        else:
            # floored u8 colors (scan carried raw f32); same trace as the
            # proven r3 kernel
            for k, cref in enumerate(refs[2:5]):
                out_ref[k] = jnp.floor(
                    jnp.clip(cref[...], 0.0, 255.0)
                ).astype(jnp.int32).astype(jnp.uint8)
            mask = (refs[1][...] > 0.1) & (refs[0][...] > neg_inf)
        out_ref[3] = mask.astype(jnp.int32).astype(jnp.uint8)

    run_eye(1.0, 0, D + 2, l_refs, left_ref)
    run_eye(-1.0, -D, 2, r_refs, right_ref)


def _auto_block_rows(width: int, pad: int) -> int:
    """Row-block size: bigger blocks amortize per-grid-cell dispatch
    overhead (810 cells for a supersampled 1080p batch-2 pair at 8 rows:
    ~20 ms of pure overhead), but Mosaic compile time scales with
    rows x width x loop-iterations — 64-row blocks at production widths
    push the unrolled shift loop past 10^6 vector ops and LLVM takes tens
    of minutes. Also bounded by a VMEM budget for narrow inputs. The
    per_row model deliberately keeps the round-1 (f32-output) byte
    accounting: it OVERSTATES today's u8-output kernel, but production
    widths still land on the measured-best rows and loosening it would
    silently change every compiled block geometry. 32 rows measured best
    with the packed 3-carry scan (r4 sweep 16/24/32/48: 48.1/46.7/45.3/
    45.9 ms/frame SBS); VSC_TPU_WARP_ROWS overrides."""
    override = os.environ.get("VSC_TPU_WARP_ROWS")
    if override:
        return int(override)
    budget = 72 * 1024 * 1024
    for rows in (32, 24, 16, 8):
        per_row = (2 * 4 * (width + 2 * pad) + 2 * 10 * width + 10 * width) * 4
        if rows * per_row <= budget:
            return rows
    return 8


@functools.partial(jax.jit, static_argnames=("max_disparity", "block_rows"))
def forward_warp_stereo_pallas(image, depth, max_disparity: float,
                               block_rows: int | None = None):
    """Drop-in replacement for ops.warp.forward_warp_stereo up to the
    postprocess entry's quantization point.

    Args:
      image: [B, H, W, C] float32 (C == 3).
      depth: [B, H, W] float32 in [0, 1].
      max_disparity: static maximum disparity in pixels.

    Returns:
      (left, left_mask, right, right_mask). Colors are
      floor(clip(., 0, 255)) u8-valued f32 — the jnp path keeps the raw
      fractional f32 until the postprocess entry applies this exact
      quantization, which is where the two backends coincide
      (ops/stereo._postprocess_eye; tests floor the jnp reference before
      comparing). Masks are identical to the jnp path's.
    """
    B, H, W, C = image.shape
    assert C == 3, "pallas warp kernel expects RGB"
    planes = [image[..., c] for c in range(3)]
    eye_l, eye_r = _warp_planes(planes, depth, max_disparity, block_rows)
    return _unpack_eyes(eye_l, eye_r)


@functools.partial(jax.jit, static_argnames=("max_disparity", "block_rows"))
def forward_warp_stereo_pallas_planar(image_cf, depth, max_disparity: float,
                                      block_rows: int | None = None):
    """Channel-FIRST variant: image_cf [B, 3, H, W]. Leading-dim channel
    slices are free (the channel-last form pays a strided relayout per
    plane), so this is the entry the planar supersample path uses."""
    B, C, H, W = image_cf.shape
    assert C == 3, "pallas warp kernel expects RGB"
    planes = [image_cf[:, c] for c in range(3)]
    eye_l, eye_r = _warp_planes(planes, depth, max_disparity, block_rows)
    return _unpack_eyes(eye_l, eye_r)


@functools.partial(jax.jit, static_argnames=("max_disparity", "block_rows"))
def forward_warp_stereo_pallas_planar_u8(image_cf, depth,
                                         max_disparity: float,
                                         block_rows: int | None = None):
    """Planar-u8 fast path: image_cf [B, 3, H, W] float32 -> two
    [4, B, H, W] uint8 eyes (r, g, b, mask) with NO channel interleave and
    no f32 eye planes in HBM — the layout ops/stereo.py's TPU eye pipeline
    (fused postprocess + finish) consumes directly. Colors are
    floor(clip(., 0, 255)) of the selected source pixel, identical to what
    the postprocess stage's entry quantization produces from the f32 API."""
    B, C, H, W = image_cf.shape
    assert C == 3, "pallas warp kernel expects RGB"
    planes = [image_cf[:, c] for c in range(3)]
    return _warp_planes(planes, depth, max_disparity, block_rows)


def _unpack_eyes(eye_l, eye_r):
    """[4, rows, W] u8 pair -> the classic channel-last f32 API
    (left, left_mask, right, right_mask). Test/compat surface; the
    production TPU path consumes the u8 planes directly."""
    def one(eye):
        img = jnp.moveaxis(eye[:3].astype(jnp.float32), 0, -1)
        return img, eye[3].astype(jnp.float32)
    li, lm = one(eye_l)
    ri, rm = one(eye_r)
    return li, lm, ri, rm


def _warp_planes(planes, depth, max_disparity: float,
                 block_rows: int | None):
    B, H, W = depth.shape
    D = int(math.floor(max_disparity)) + 1
    P = D + 2
    if block_rows is None:
        block_rows = _auto_block_rows(W, P)

    disp = depth * max_disparity
    # fold batch into rows so one 2-D grid covers everything
    disp2 = disp.reshape(B * H, W)
    planes = [p.reshape(B * H, W) for p in planes]

    disp_p = jnp.pad(disp2, [(0, 0), (P, P)], constant_values=_SENTINEL)
    planes_p = [jnp.pad(pl_, [(0, 0), (P, P)]) for pl_ in planes]

    rows = B * H
    grid = (pl.cdiv(rows, block_rows),)

    in_spec = pl.BlockSpec((block_rows, W + 2 * P), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((4, block_rows, W), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    packed = os.environ.get("VSC_TPU_WARP_PACKED", "1") == "1"
    out_shape = [jax.ShapeDtypeStruct((4, rows, W), jnp.uint8)] * 2
    scratch = [pltpu.VMEM((block_rows, W), jnp.float32)] * (6 if packed
                                                            else 10)

    eye_l, eye_r = pl.pallas_call(
        functools.partial(_warp_kernel, W=W, P=P, D=D,
                          inv_max_disp=1.0 / max_disparity
                          if max_disparity > 0 else 0.0, packed=packed),
        grid=grid,
        in_specs=[in_spec] * 4,
        out_specs=[out_spec] * 2,
        out_shape=out_shape,
        scratch_shapes=scratch,
        # 24-row blocks exceed the default 16M scoped-vmem stack limit
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        # CPU (tests / virtual meshes) has no Mosaic backend
        interpret=jax.default_backend() != "tpu",
    )(disp_p, *planes_p)

    return (eye_l.reshape(4, B, H, W), eye_r.reshape(4, B, H, W))
