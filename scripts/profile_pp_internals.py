#!/usr/bin/env python3
"""Decompose the fused planar postprocess kernel's 26.9 ms/frame (r4
profiler): time it on (a) hole-free input with smoothing=0 -> fixed path
(DMA + converts + indicators + dilate + output), (b) hole-free with
smoothing=1 -> + bilateral, (c) bench-like scene holes -> + fill branch at
production predication rates, (d) all-hole -> fill everywhere (bound).
Input geometry matches production supersampled eyes."""
from __future__ import annotations

import os
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

    B = int(os.environ.get("PROF_BATCH", "8"))
    ITERS = int(os.environ.get("PROF_ITERS", "12"))
    H, W = 3240, 6068  # production supersampled eye geometry

    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    base = (127 + 80 * np.sin(xx / 97.0) * np.cos(yy / 53.0)).astype(np.uint8)
    eye = np.stack([base, base // 2 + 40, 255 - base])          # [3, H, W]

    def eye4_with(valid):
        e = np.concatenate([eye, valid[None]], 0).astype(np.uint8)
        return jnp.asarray(np.broadcast_to(e[:, None], (4, B, H, W)).copy())

    valid_all = np.ones((H, W), np.uint8)
    # scene-like holes: thin near-vertical curves (disocclusion statistics)
    hole_scene = ((xx * 0.37 + 40 * np.sin(yy / 60.0)) % 480 < 3)
    valid_scene = (1 - hole_scene).astype(np.uint8)
    valid_none = np.zeros((H, W), np.uint8)

    sm_shape = None

    def run(label, valid, smoothing):
        eye4 = eye4_with(valid)
        sm = _pyramid_fill_planar_coarse(eye4)

        @jax.jit
        def prog(e4, smq):
            return postprocess_eye_planar_pallas(e4, smq, smoothing)[
                :, :, ::13, ::13].sum()

        out = prog(eye4, sm)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = prog(eye4, sm)
        sync(out)
        ms = 1000.0 * (time.perf_counter() - t0) / (ITERS * B)
        print(f"{label:44s} {ms:8.2f} ms/eye/frame", flush=True)
        return ms

    t_fixed = run("hole-free, smoothing=0 (fixed path)", valid_all, 0.0)
    t_bil = run("hole-free, smoothing=1 (+bilateral)", valid_all, 1.0)
    t_scene = run("scene holes, smoothing=1 (+fill@scene)", valid_scene, 1.0)
    t_all = run("all-hole, smoothing=1 (fill everywhere)", valid_none, 1.0)
    print(f"bilateral delta: {t_bil - t_fixed:.2f}  "
          f"fill@scene delta: {t_scene - t_bil:.2f}  "
          f"fill-everywhere delta: {t_all - t_bil:.2f}")


if __name__ == "__main__":
    main()
