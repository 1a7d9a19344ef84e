#!/usr/bin/env python3
"""Standalone axon-TPU repro + workaround validation for the
concat-of-differently-offset-slices miscompile (VERDICT r4 #1).

The broken pattern (r4 one-dispatch eye crop, ops/stereo.py:307-310):

    concat([slice(x[:, :B], lo, lo+w, axis=3),
            slice(x[:, B:], ro, ro+w, axis=3)], axis=1)

returns the second operand sliced at lo instead of ro on the axon backend.
This script verifies the bug and validates candidate workarounds on real
hardware, comparing each against the numpy ground truth.
"""
from __future__ import annotations

import numpy as np

from vsc_tpu.utils.jax_setup import setup_jax
setup_jax()

import jax
import jax.numpy as jnp
from jax import lax

print("backend:", jax.default_backend(), jax.devices()[0])

P, B2, H, W = 4, 8, 64, 1024
LO, RO, CW = 135, 195, 768
rng = np.random.default_rng(0)
x_np = rng.integers(0, 256, (P, 2 * B2, H, W), np.uint8)
x = jnp.asarray(x_np)

want = np.concatenate([
    x_np[:, :B2, :, LO:LO + CW],
    x_np[:, B2:, :, RO:RO + CW],
], axis=1)


def check(name, fn, *args):
    try:
        got = np.asarray(jax.jit(fn)(*(args or (x,))))
    except Exception as e:
        print(f"{name:35s} ERROR {type(e).__name__}: {e}")
        return
    ok = got.shape == want.shape and np.array_equal(got, want)
    msg = "OK" if ok else "MISMATCH"
    if not ok and got.shape == want.shape:
        # locate the offset error on the second half
        bad = np.flatnonzero((got != want).any(axis=(0, 2, 3)))
        msg += f" (bad batch rows: {bad.tolist()[:6]})"
    print(f"{name:35s} {msg}")


# A. the broken r4 pattern
def a_broken(x):
    return jnp.concatenate([
        lax.slice_in_dim(x[:, :B2], LO, LO + CW, axis=3),
        lax.slice_in_dim(x[:, B2:], RO, RO + CW, axis=3),
    ], axis=1)


# B. slices feed separate consumers (pad+arith), concat the RESULTS on a
#    different axis — the shape of the two-dispatch finish workaround.
def b_two_consumers(x):
    l = lax.slice_in_dim(x[:, :B2], LO, LO + CW, axis=3)
    r = lax.slice_in_dim(x[:, B2:], RO, RO + CW, axis=3)
    lp = jnp.pad(l, [(0, 0), (0, 0), (2, 2), (2, 2)], mode="reflect")
    rp = jnp.pad(r, [(0, 0), (0, 0), (2, 2), (2, 2)], mode="reflect")
    return jnp.concatenate([lp[:, :, 2:-2, 2:-2], rp[:, :, 2:-2, 2:-2]],
                           axis=1)


# C. equalize offsets first (roll right half by LO-RO), single uniform slice
def c_roll_equalize(x):
    rolled = jnp.roll(x, LO - RO, axis=3)
    eye = (jnp.arange(2 * B2) >= B2)[None, :, None, None]
    eq = jnp.where(eye, rolled, x)
    return lax.slice_in_dim(eq, LO, LO + CW, axis=3)


# D. per-batch-element offsets via vmapped dynamic_slice (gather lowering)
def d_vmap_dynslice(x):
    offs = jnp.where(jnp.arange(2 * B2) < B2, LO, RO)
    def one(col, off):
        return lax.dynamic_slice_in_dim(col, off, CW, axis=2)
    return jax.vmap(one, in_axes=(1, 0), out_axes=1)(x, offs)


# E. concat on axis=1 but slices taken AFTER a copy-materializing op
def e_concat_after_copy(x):
    l = lax.slice_in_dim(x[:, :B2], LO, LO + CW, axis=3)
    r = lax.slice_in_dim(x[:, B2:], RO, RO + CW, axis=3)
    l = lax.optimization_barrier(l)
    r = lax.optimization_barrier(r)
    return jnp.concatenate([l, r], axis=1)


check("A broken r4 pattern", a_broken)
check("B two consumers, concat results", b_two_consumers)
check("C roll-equalize + uniform slice", c_roll_equalize)
check("D vmapped dynamic_slice", d_vmap_dynslice)
check("E optimization_barrier + concat", e_concat_after_copy)

# F. the REAL workaround shape: two sharpen_downscale_planar dispatches on
#    separately-cropped eyes, concat of kernel outputs on axis=3.
from vsc_tpu.ops.finish_pallas import sharpen_downscale_planar

P3 = 3
y_np = rng.integers(0, 256, (P3, 2 * B2, 66, 1024), np.uint8)
y = jnp.asarray(y_np)
RATIO, OH, OW = 3, 22, 86  # crop_w = 258 >= 129


def f_two_finish(y):
    l = lax.slice_in_dim(y[:, :B2], LO, LO + RATIO * OW, axis=3)
    r = lax.slice_in_dim(y[:, B2:], RO, RO + RATIO * OW, axis=3)
    fl = sharpen_downscale_planar(l, RATIO, 0.0, OH, OW)
    fr = sharpen_downscale_planar(r, RATIO, 0.0, OH, OW)
    return jnp.concatenate([fl, fr], axis=3)


def box_ref(a):  # strength=0 -> pure 3:1 box average, floor/clip
    a = a.astype(np.float64).reshape(a.shape[:2] + (OH, RATIO, OW, RATIO))
    return np.clip(np.floor(a.mean(axis=(3, 5)) + 1e-9), 0, 255).astype(np.uint8)


want_f = np.concatenate([
    box_ref(y_np[:, :B2, :RATIO * OH, LO:LO + RATIO * OW]),
    box_ref(y_np[:, B2:, :RATIO * OH, RO:RO + RATIO * OW]),
], axis=3)
try:
    got_f = np.asarray(jax.jit(f_two_finish)(y))
    nbad = int((got_f != want_f).sum())
    maxd = int(np.abs(got_f.astype(int) - want_f.astype(int)).max())
    print(f"{'F two finish dispatches':35s} "
          f"{'OK' if nbad == 0 else f'MISMATCH ({nbad} px, maxdiff {maxd})'}")
except Exception as e:
    print(f"{'F two finish dispatches':35s} ERROR {type(e).__name__}: {e}")
