#!/usr/bin/env python3
"""Postprocess kernel cost decomposition at bench eye shapes: ablate the
bilateral (smoothing), fill sweeps, and polish passes to attribute time.
Holes mimic warp disocclusions: vertical bands at depth edges (~70% of
blocks contain some hole)."""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from vsc_tpu.utils.jax_setup import setup_jax, sync


def main():
    setup_jax()
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vsc_tpu.ops.inpaint import _pyramid_fill
    from vsc_tpu.ops.postprocess_pallas import postprocess_eye_pallas

    B, H, W = 2, 3240, 6090
    rng = np.random.default_rng(0)
    img = (rng.random((B, H, W, 3)) * 255).astype(np.float32)
    valid = np.ones((B, H, W), np.float32)
    for x0 in range(600, W - 40, 720):     # vertical disocclusion bands
        valid[:, :, x0:x0 + 18] = 0.0
    img = img * valid[..., None]
    img, valid = jnp.asarray(img), jnp.asarray(valid)
    smooth_q = jax.jit(functools.partial(
        _pyramid_fill, coarse_factor=4, return_coarse=True))(
            img, valid[..., None])

    def bench(label, smoothing, sweeps, polish):
        fn = jax.jit(lambda i, v, s: postprocess_eye_pallas(
            i, v, s, smoothing, sweeps=sweeps, polish=polish))
        out = fn(img, valid, smooth_q)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(24):
            out = fn(img, valid, smooth_q)
        sync(out)
        ms = 1000.0 * (time.perf_counter() - t0) / (24 * B)
        print(f"{label:40s} {ms:8.1f} ms/eye-frame", flush=True)

    bench("production (smooth=1, sweeps=3, pol=1)", 1.0, 3, 1)
    bench("no bilateral (smooth=0)", 0.0, 3, 1)
    bench("bilateral only (sweeps=0, pol=0)", 1.0, 0, 0)
    bench("copy floor (smooth=0, sw=0, pol=0)", 0.0, 0, 0)


if __name__ == "__main__":
    main()
