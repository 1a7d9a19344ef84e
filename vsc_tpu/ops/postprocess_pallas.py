"""
Fused per-eye postprocess — Pallas TPU kernel
=============================================

Bilateral artifact smoothing + hole-mask dilation + frontier inpainting +
Jacobi polish (the stereo pipeline's stages 7a-7b, ops/stereo._postprocess_eye)
fused into ONE kernel: each 2-D block is DMA'd into VMEM once with a halo
wide enough for every stage's stencil, the whole filter chain runs out of
VMEM with f32 accumulators, and the finished block is written once.

Why: these stages dominate the pipeline (~80% of frame time as separate XLA
fusions — every sweep re-reads full-resolution planes from HBM). Fused,
HBM traffic drops to ~1 read + 1 write per plane and the VPU runs the
stencil chain at full arithmetic intensity.

r3 I/O redesign (ablation: the kernel's DMA/overhead floor alone measured
8.6 ms/eye vs a 0.8 ms bytes bound — the per-block cost was ISSUE count,
not bytes): the eye arrives as the warp kernel's [4, B, H, W] uint8
(r, g, b, valid) stack, so each block is ONE strided u8 DMA instead of five
f32 plane copies; the in-image indicator is computed from iota instead of
DMA'd; outputs are u8 planes. 16 copy-issues per block became 4.

Boundary semantics (matching the jnp path exactly):
  - the u8 stack is pre-padded reflect-101 (the bilateral's border mode for
    the color planes); the VALID plane's reflected border is zeroed
    in-kernel by the iota in-image indicator, which equals the jnp path's
    constant-0 known-mask padding,
  - the dilated hole mask is multiplied by the same indicator, so it never
    extends outside the image (matches the jnp constant-0 hole padding),
  - hole interiors beyond the sweeps' reach take the precomputed pyramid
    `smooth` estimate (same input plane the jnp path uses).
The only intentional deviation: the Jacobi polish sees reflect-101 border
values where the jnp path edge-replicates — a <=1-code difference on filled
pixels in the outermost rows/columns (the equivalence test bounds it).

Intra-kernel shifts use pltpu.roll (circular): wrap-around garbage stays
inside the halo margin because the halo equals the total stencil radius,
so the written center block is exact.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["postprocess_eye_pallas", "postprocess_eye_planar_pallas"]

def _disc(radius: int):
    return [(dy, dx, 1.0 / math.hypot(dy, dx))
            for dy in range(-radius, radius + 1)
            for dx in range(-radius, radius + 1)
            if (dy, dx) != (0, 0) and dy * dy + dx * dx <= radius * radius + 1]


# Mirrors ops/inpaint.py: radius-2 frontier sweeps, radius-3 polish
# re-average (cv2.inpaint's neighborhood).
_FILL_RADIUS = 2
_POLISH_RADIUS = 3
_FILL_OFFS = _disc(_FILL_RADIUS)
_POLISH_OFFS = _disc(_POLISH_RADIUS)

# Block geometry: the fill/polish chain only runs for blocks that contain
# holes (disocclusions are thin curves along depth edges), so SMALL blocks
# predicate better — 64 rows halves the cost a hole-crossed block pays vs
# 128. Per-cell DMA is overlapped by the double-buffered prefetch, and the
# ~1 us/cell scalar branch is negligible at ~600 cells/eye. BLOCK_C stays
# 512: the quarter-res smooth window start (BLOCK_C/4 per cell) must stay
# 128-lane aligned. Bigger blocks (256x1024) OOM vmem: the stencil chain
# keeps ~100 live block temporaries (137 MB of register spills).
import os

BLOCK_R = int(os.environ.get("VSC_TPU_PP_BLOCK_R", "64"))
BLOCK_C = int(os.environ.get("VSC_TPU_PP_BLOCK_C", "512"))
# the fill/polish chain runs per 128-column subtile and the quarter-res
# smooth window starts at BLOCK_C/4: a non-multiple-of-128 width would
# silently leave tail columns unfilled rather than error
assert BLOCK_C % 128 == 0, "VSC_TPU_PP_BLOCK_C must be a multiple of 128"


def _bilateral_offs(radius: int):
    return [(dy, dx)
            for dy in range(-radius, radius + 1)
            for dx in range(-radius, radius + 1)
            if dy * dy + dx * dx <= radius * radius]


def _shift(a, dy: int, dx: int):
    """shifted[y, x] = a[y+dy, x+dx] via circular rolls (halo absorbs wrap).
    pltpu.roll requires non-negative shifts, so negatives wrap modulo dim."""
    if dy:
        a = pltpu.roll(a, (-dy) % a.shape[0], 0)
    if dx:
        a = pltpu.roll(a, (-dx) % a.shape[1], 1)
    return a


def _shift3(a, dy: int, dx: int):
    """Stacked-plane variant: a is [K, R, C]; one roll moves every plane
    (channels + mask share each offset in the stencil loops below, so
    rolling the stack once per offset replaces K separate 2-D rolls)."""
    if dy:
        a = pltpu.roll(a, (-dy) % a.shape[1], 1)
    if dx:
        a = pltpu.roll(a, (-dx) % a.shape[2], 2)
    return a


def _row_cache(stack, radius: int):
    """{dy: row-rolled stack} for dy in [-radius, radius]: rolls compose
    exactly (roll(dy) then roll(dx) == the combined roll), so a disc stencil
    pays one sublane roll per DISTINCT dy plus one lane roll per tap —
    instead of up to two rolls per tap. Bit-identical values (r4)."""
    return {dy: (pltpu.roll(stack, (-dy) % stack.shape[1], 1) if dy else stack)
            for dy in range(-radius, radius + 1)}


def _from_cache(cache, dy: int, dx: int):
    a = cache[dy]
    if dx:
        a = pltpu.roll(a, (-dx) % a.shape[2], 2)
    return a


def _kernel(eye_ref, smooth_ref, out_ref, win_ref, qwin_ref, sem, qsem,
            *, H: int, W: int, halo_r: int, halo_c: int, smoothing: float,
            sweeps: int, polish: int, sigma_color: float, nb: int, nr: int,
            nc: int, qwin_r: int, qwin_c: int, paired: bool):
    """Grid: (B, nr, nc). eye_ref: [4, B, Hp, Wp] uint8 HBM (r, g, b,
    valid — reflect-padded; see module docstring). `smooth_ref` holds the
    QUARTER-resolution interior estimate (3 f32 planes): the kernel DMAs
    the quarter window and, only inside the fill branch, expands it 4x
    nearest via two 0/1 expansion matmuls (MXU, exact) — a full-res smooth
    plane never exists in HBM.

    The halo windows are DOUBLE-BUFFERED: scratch persists across grid
    steps, so each cell starts the DMA for the NEXT cell's window into the
    other buffer before computing on its own — the halo transfer runs under
    the stencil compute instead of serializing per cell."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    WR, WC = BLOCK_R + 2 * halo_r, BLOCK_C + 2 * halo_c
    t = (b * nr + i) * nc + j
    total = nb * nr * nc
    slot = jax.lax.rem(t, 2)

    def copies(slot_idx, bb, ii, jj):
        r0 = ii * BLOCK_R
        c0 = jj * BLOCK_C
        return [
            pltpu.make_async_copy(
                eye_ref.at[:, bb, pl.ds(r0, WR), pl.ds(c0, WC)],
                win_ref.at[slot_idx], sem.at[slot_idx]),
            pltpu.make_async_copy(
                smooth_ref.at[:, bb, pl.ds(ii * (BLOCK_R // 4), qwin_r),
                              pl.ds(jj * (BLOCK_C // 4), qwin_c)],
                qwin_ref.at[slot_idx], qsem.at[slot_idx]),
        ]

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

    # u8 -> i32 -> f32: Mosaic has no direct unsigned->float cast
    win = win_ref[slot].astype(jnp.int32).astype(jnp.float32)  # [4, WR, WC]
    chans = [win[k] for k in range(3)]               # u8-valued, no clip

    # in-image indicator from block coordinates (replaces a DMA'd plane):
    # padded coords (i*BLOCK_R + y, j*BLOCK_C + x); interior where the
    # coordinate falls inside [halo, halo + dim).
    gy = (jax.lax.broadcasted_iota(jnp.int32, (WR, WC), 0)
          + i * BLOCK_R - halo_r)
    gx = (jax.lax.broadcasted_iota(jnp.int32, (WR, WC), 1)
          + j * BLOCK_C - halo_c)
    inimg = ((gy >= 0) & (gy < H) & (gx >= 0) & (gx < W)).astype(jnp.float32)
    valid = win[3] * inimg                           # zero outside the image

    def smooth_plane(k):
        """Quarter window -> full-res window, nearest (u -> u//4), as
        ER @ q @ EC with 0/1 matrices — exact, and only paid when the
        block actually has holes."""
        q = qwin_ref[slot, k]                                # [qwin_r, qwin_c]
        ro = jax.lax.broadcasted_iota(jnp.int32, (WR, qwin_r), 0)
        rj = jax.lax.broadcasted_iota(jnp.int32, (WR, qwin_r), 1)
        er = (rj == ro // 4).astype(jnp.float32)             # [WR, qwin_r]
        cq = jax.lax.broadcasted_iota(jnp.int32, (qwin_c, WC), 0)
        cu = jax.lax.broadcasted_iota(jnp.int32, (qwin_c, WC), 1)
        ec = (cq == cu // 4).astype(jnp.float32)             # [qwin_c, WC]
        # The 0/1 expansion matrices are bf16-exact, but the DEFAULT MXU
        # pass would truncate the f32 `q` VALUES to bf16. Split q around
        # the bf16 mantissa instead of a multi-pass precision mode: each
        # half rides exact single-pass dots (expansion copies values, so
        # the hi path stays bf16-exact through both dots), total error
        # ~2^-17 relative — full-f32 like the jnp path.
        dot = functools.partial(jax.lax.dot_general,
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        hi = q.astype(jnp.bfloat16).astype(jnp.float32)
        lo = q - hi
        return dot(dot(er, hi), ec) + dot(dot(er, lo), ec)

    # ---- bilateral (cv2 weight laws), skipped when smoothing == 0
    if smoothing > 0:
        d = max(5, min(int(smoothing * 4), 15))
        radius = d // 2
        sigma_space = smoothing * 25.0
        inv2sc = -0.5 / (sigma_color * sigma_color)
        stacked = win[:3]                                # [3, WR, WC]
        # center tap: cdiff = 0 -> range weight exp(0) = 1, space weight
        # exp(0) = 1, so it contributes the pixel itself with weight 1
        num = stacked + 0.0
        den = jnp.ones((WR, WC), jnp.float32)
        # SYMMETRIC PAIRING (r4): w(p, p+d) depends on |x[p+d] - x[p]|,
        # which is symmetric, so the weight plane for offset -d is exactly
        # the +d weight plane rolled by -d: wgt_{-d}[p] = wgt_{+d}[p-d].
        # One roll replaces the whole abs/square/exp chain for half the
        # taps. Roll wrap-garbage stays in the outer |d| <= radius ring of
        # the window — the same ring the direct form corrupts (its shifted
        # operand wraps there too), so validity margins are unchanged and
        # every weight VALUE is bit-identical to the unpaired form (only
        # the accumulation order changes: +-d adjacent instead of
        # row-major, a <= 1-ulp reassociation absorbed by the output
        # rounding and the tests' 1-code interior tolerance).
        # VSC_TPU_PP_PAIRED=0 computes every tap's weight directly instead
        # (the r3 form) — the hardware A/B knob for the pairing optimization
        rows = _row_cache(stacked, radius)
        for dy, dx in _bilateral_offs(radius):
            if (dy, dx) == (0, 0):
                continue                  # center tap seeded above
            if paired and (dy, dx) < (0, 0):
                continue                  # -d handled with +d below
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
        chans = [jnp.floor(jnp.clip(jnp.round(num[k] / den), 0.0, 255.0))
                 for k in range(3)]

    # ---- dilated hole mask (3x3, one iteration; zero outside the image)
    hole_raw = jnp.maximum(inimg - valid, 0.0)
    hole = hole_raw
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy or dx:
                hole = jnp.maximum(hole, _shift(hole_raw, dy, dx))
    keep = 1.0 - hole * inimg  # pixels that stay exact

    # Hole-free window: the bilateral result IS the final block. Most blocks
    # of a real frame contain no disocclusions, so the (much heavier) fill +
    # polish chain is predicated out entirely.
    for k in range(3):
        out_ref[k, 0] = jnp.round(jnp.clip(
            chans[k][halo_r:halo_r + BLOCK_R, halo_c:halo_c + BLOCK_C],
            0.0, 255.0)).astype(jnp.int32).astype(jnp.uint8)

    # ---- fill + polish, predicated per 128-COLUMN SUBTILE (r3):
    # disocclusions are near-vertical curves (the warp shifts horizontally),
    # so most 128-col slices of a hole-crossed block are themselves clean —
    # block-level predication alone pays the full fill chain for the whole
    # 512-wide block whenever any column has a hole. Each subtile computes
    # on a lane-aligned window [t*128, t*128 + 128 + 2*halo_c): the margin
    # equals the block halo (>= the fill+polish stencil reach), so every
    # dependency of its output columns is computed exactly and the result
    # is bit-identical to the full-window form.
    hole_active = hole * inimg
    n_sub = BLOCK_C // 128
    sub_w = 128 + 2 * halo_c

    @pl.when(jnp.sum(hole_active) > 0)
    def _fill_branch():
        smooth_full = [smooth_plane(k) for k in range(3)]
        known0_full = keep * inimg
        wsum = sum(w for _, _, w in _POLISH_OFFS)

        for t in range(n_sub):
            ssl = (slice(None), slice(t * 128, t * 128 + sub_w))
            osub = (slice(None), slice(halo_c + t * 128,
                                       halo_c + t * 128 + 128))

            @pl.when(jnp.sum(hole_active[osub]) > 0)
            def _sub(t=t, ssl=ssl, osub=osub):
                known0 = known0_full[ssl]
                keep_s = keep[ssl]
                chans_s = [c[ssl] for c in chans]

                # frontier fill (pad region stays unknown: inimg = 0
                # there). The identical sweeps run as a fori_loop, NOT
                # unrolled: each sweep body is ~50 block-ops of
                # static-shift stencils, and unrolling multiplied Mosaic
                # compile time with zero runtime benefit.
                def one_sweep(_, carry):
                    # carry: [4, WR, sub_w] = (v0, v1, v2, known) stacked —
                    # row-rolled once per distinct dy (_row_cache), one
                    # lane roll per tap; rgb/weight accumulate separately
                    # (the old per-tap 4-plane concat cost a stack copy
                    # per offset). Same adds in the same order per plane.
                    acc3 = jnp.zeros((3, WR, sub_w), jnp.float32)
                    acck = jnp.zeros((WR, sub_w), jnp.float32)
                    rows = _row_cache(carry, _FILL_RADIUS)
                    for dy, dx, w in _FILL_OFFS:
                        sh = _from_cache(rows, dy, dx)
                        wk = w * sh[3]
                        acc3 = acc3 + wk * sh[:3]
                        acck = acck + wk
                    known = carry[3]
                    reach = (acck > 1e-8).astype(jnp.float32)
                    upd = (1.0 - known) * reach
                    inv_den = 1.0 / jnp.maximum(acck, 1e-8)
                    vals = (carry[:3] * (1.0 - upd)
                            + (acc3 * inv_den) * upd)
                    return jnp.concatenate(
                        [vals, jnp.maximum(known, reach)[None]], axis=0)

                # EARLY EXIT (r4): disocclusions are mostly 1-2 px wide at
                # production disparity, so sweep 1 usually reaches every
                # in-image hole pixel — later sweeps are then the identity
                # for in-image pixels (known pixels keep their values) and
                # are skipped. The count restricts to in-image pixels: the
                # halo's out-of-image margin may stay unknown forever and
                # must not pin the loop. Skipping changes only never-read
                # pad values plus a <= polish-radius border ring, inside
                # the kernel's documented border deviation.
                inimg_s = inimg[ssl]

                def sweep_cond(state):
                    it, c = state
                    return jnp.logical_and(
                        it < sweeps,
                        jnp.sum((1.0 - c[3]) * inimg_s) > 0.0)

                def sweep_step(state):
                    it, c = state
                    return it + 1, one_sweep(it, c)

                _, carry = jax.lax.while_loop(
                    sweep_cond, sweep_step,
                    (jnp.int32(0), jnp.concatenate(
                        [jnp.stack(chans_s) * known0, known0[None]],
                        axis=0)))
                val = [carry[0], carry[1], carry[2]]
                known = carry[3]

                # unreached interior -> smooth estimate; exact restored
                for k in range(3):
                    filled = jnp.where(known > 0, val[k],
                                       smooth_full[k][ssl])
                    val[k] = jnp.where(keep_s > 0, chans_s[k], filled)

                # polish: inverse-distance re-average over the radius-3
                # disc (mirrors ops/inpaint.pyramid_inpaint's polish —
                # approximates Telea's large-neighborhood averaging)
                def one_polish(_, carry):
                    # carry: [3, WR, sub_w] channel stack; row-rolled once
                    # per distinct dy, one lane roll per tap
                    acc = jnp.zeros((3, WR, sub_w), jnp.float32)
                    rows = _row_cache(carry, _POLISH_RADIUS)
                    for dy, dx, w in _POLISH_OFFS:
                        acc = acc + w * _from_cache(rows, dy, dx)
                    return jnp.where(keep_s > 0, carry, acc / wsum)

                val = jax.lax.fori_loop(0, polish, one_polish,
                                        jnp.stack(val))

                for k in range(3):
                    out_ref[k, 0, :, t * 128:t * 128 + 128] = jnp.round(
                        jnp.clip(
                            val[k][halo_r:halo_r + BLOCK_R,
                                   halo_c:halo_c + 128],
                            0.0, 255.0)).astype(jnp.int32).astype(jnp.uint8)


def _halo_for(smoothing: float, sweeps: int, polish: int) -> tuple[int, int]:
    """(row_halo, col_halo): the total stencil radius, rounded up so the
    DMA window shape stays aligned to the (8, 128) f32 tile."""
    rb = (max(5, min(int(smoothing * 4), 15)) // 2) if smoothing > 0 else 0
    need = rb + 1 + _FILL_RADIUS * sweeps + _POLISH_RADIUS * polish
    halo_r = -(-need // 4) * 4      # 2*halo_r multiple of 8
    halo_c = -(-need // 64) * 64    # 2*halo_c multiple of 128
    return halo_r, halo_c


@functools.partial(jax.jit,
                   static_argnames=("smoothing", "sweeps", "polish"))
def postprocess_eye_planar_pallas(eye4, smooth_q, smoothing: float,
                                  sweeps: int = 3, polish: int = 1):
    """Planar-u8 entry (the production TPU path).

    Args:
      eye4: [4, B, H, W] uint8 — the warp kernel's (r, g, b, valid) stack.
      smooth_q: [3, B, ~H/4, ~W/4] float32 QUARTER-res interior estimate
        (ops.inpaint._pyramid_fill_planar_coarse); expanded 4x-nearest
        on-chip, so dims just need to cover (H-1)//4, (W-1)//4.
      smoothing: StereoParams.artifact_smoothing (static).

    Returns: [3, B, H, W] uint8 postprocessed eye planes.
    """
    K, B, H, W = eye4.shape
    assert K == 4
    assert smooth_q.shape[2] > (H - 1) // 4 and smooth_q.shape[3] > (W - 1) // 4
    halo_r, halo_c = _halo_for(smoothing, sweeps, polish)
    nr = pl.cdiv(H, BLOCK_R)
    nc = pl.cdiv(W, BLOCK_C)
    Hp = nr * BLOCK_R + 2 * halo_r
    Wp = nc * BLOCK_C + 2 * halo_c
    WR, WC = BLOCK_R + 2 * halo_r, BLOCK_C + 2 * halo_c
    # quarter-plane geometry (halo_r % 4 == 0 and halo_c % 64 == 0 by
    # construction, so every full-res window maps to an aligned quarter one)
    qwin_r = -(-(WR // 4) // 8) * 8
    qwin_c = -(-(WC // 4) // 128) * 128
    Hq_p = (nr - 1) * (BLOCK_R // 4) + qwin_r
    Wq_p = (nc - 1) * (BLOCK_C // 4) + qwin_c

    # ONE reflect pad of the whole u8 stack (the valid plane's reflected
    # border is cancelled in-kernel by the iota in-image indicator), then a
    # zero tail out to the aligned grid extent (feeds only trimmed outputs).
    padded = jnp.pad(eye4, [(0, 0), (0, 0), (halo_r, halo_r),
                            (halo_c, halo_c)], mode="reflect")
    padded = jnp.pad(padded, [(0, 0), (0, 0),
                              (0, Hp - padded.shape[2]),
                              (0, Wp - padded.shape[3])])

    def pad_qplane(x):
        x = jnp.pad(x, [(0, 0), (0, 0), (halo_r // 4, 0), (halo_c // 4, 0)])
        x = jnp.pad(x, [(0, 0), (0, 0), (0, max(0, Hq_p - x.shape[2])),
                        (0, max(0, Wq_p - x.shape[3]))])
        return x[:, :, :Hq_p, :Wq_p]

    smooth_p = pad_qplane(smooth_q)

    kernel = functools.partial(
        _kernel, H=H, W=W, halo_r=halo_r, halo_c=halo_c,
        smoothing=smoothing, sweeps=sweeps, polish=polish, sigma_color=30.0,
        nb=B, nr=nr, nc=nc, qwin_r=qwin_r, qwin_c=qwin_c,
        paired=os.environ.get("VSC_TPU_PP_PAIRED", "1") == "1")

    hbm = pl.BlockSpec(memory_space=pl.ANY)
    out = pl.pallas_call(
        kernel,
        grid=(B, nr, nc),
        in_specs=[hbm, hbm],
        out_specs=pl.BlockSpec((3, 1, BLOCK_R, BLOCK_C),
                               lambda b, i, j: (0, b, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, B, nr * BLOCK_R, nc * BLOCK_C),
                                       jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((2, 4, WR, WC), jnp.uint8),     # double-buffered halos
            pltpu.VMEM((2, 3, qwin_r, qwin_c), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        # the unrolled stencil chain keeps ~80 block-sized temporaries live;
        # the default 16M scoped-vmem limit is too small (v5e has 128M)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(padded, smooth_p)

    return out[:, :, :H, :W]                      # trim block padding


def postprocess_eye_pallas(warped, valid_mask, smooth_q, smoothing: float,
                           sweeps: int = 3, polish: int = 1):
    """Channel-last f32 compatibility entry (tests / non-planar callers).

    Args:
      warped: [B, H, W, 3] float32 (u8-valued) warped eye.
      valid_mask: [B, H, W] float32, 1 where a source pixel landed.
      smooth_q: [B, ~H/4, ~W/4, 3] float32 quarter-res interior estimate.

    Returns: [B, H, W, 3] float32 u8-valued postprocessed eye. The entry
    quantization floor(clip(., 0, 255)) is applied here (it is the planar
    kernel's input contract and the first op of the jnp path alike).
    """
    eye4 = jnp.concatenate([
        jnp.moveaxis(jnp.floor(jnp.clip(warped, 0.0, 255.0)), -1, 0),
        (valid_mask > 0).astype(jnp.float32)[None],
    ], axis=0).astype(jnp.uint8)
    smooth_planar = jnp.moveaxis(smooth_q, -1, 0)
    out = postprocess_eye_planar_pallas(eye4, smooth_planar, smoothing,
                                        sweeps=sweeps, polish=polish)
    return jnp.moveaxis(out.astype(jnp.float32), 0, -1)
