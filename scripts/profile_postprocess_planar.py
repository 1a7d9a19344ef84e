#!/usr/bin/env python3
"""Planar-u8 postprocess kernel ablation at bench eye shapes: copy floor,
bilateral, fill chain — run AFTER the r3 I/O redesign (single stacked u8
DMA per block) to attribute the remaining per-block cost. Holes mimic warp
disocclusions: vertical bands at depth edges."""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from vsc_tpu.utils.jax_setup import setup_jax, sync


def main():
    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vsc_tpu.ops.inpaint import _pyramid_fill_planar_coarse
    from vsc_tpu.ops.postprocess_pallas import postprocess_eye_planar_pallas

    B, H, W = 2, 3240, 6090
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (3, B, H, W), np.uint8)
    valid = np.ones((B, H, W), np.uint8)
    for x0 in range(600, W - 40, 720):     # vertical disocclusion bands
        valid[:, :, x0:x0 + 18] = 0
    img = img * valid[None]
    eye4 = jnp.asarray(np.concatenate([img, valid[None]], axis=0))
    smooth_q = jax.jit(_pyramid_fill_planar_coarse)(eye4)
    smooth_q = jax.block_until_ready(smooth_q)

    def bench(label, smoothing, sweeps, polish):
        fn = jax.jit(lambda e, s: postprocess_eye_planar_pallas(
            e, s, smoothing, sweeps=sweeps, polish=polish))
        out = fn(eye4, smooth_q)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(24):
            out = fn(eye4, smooth_q)
        sync(out)
        ms = 1000.0 * (time.perf_counter() - t0) / (24 * B)
        print(f"{label:40s} {ms:8.1f} ms/eye-frame", flush=True)

    def bench_pyramid():
        fn = jax.jit(_pyramid_fill_planar_coarse)
        out = fn(eye4)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(24):
            out = fn(eye4)
        sync(out)
        ms = 1000.0 * (time.perf_counter() - t0) / (24 * B)
        print(f"{'quarter pyramid prepass':40s} {ms:8.1f} ms/eye-frame",
              flush=True)

    bench("production (smooth=1, sweeps=3, pol=1)", 1.0, 3, 1)
    bench("no bilateral (smooth=0)", 0.0, 3, 1)
    bench("bilateral only (sweeps=0, pol=0)", 1.0, 0, 0)
    bench("copy floor (smooth=0, sw=0, pol=0)", 0.0, 0, 0)
    bench_pyramid()


if __name__ == "__main__":
    main()
