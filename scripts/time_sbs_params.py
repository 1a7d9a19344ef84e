#!/usr/bin/env python3
"""time_sbs_quick with StereoParams overrides from env (diagnostic A/Bs):
SBS_SMOOTHING, SBS_SS, SBS_CONV, SBS_SHARPEN. Prints `SBS <ms/frame>`."""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from vsc_tpu.utils.jax_setup import setup_jax, sync


def main():
    setup_jax()
    import jax.numpy as jnp
    import numpy as np

    from vsc_tpu.config import StereoParams
    from vsc_tpu.ops.stereo import generate_sbs

    B = int(os.environ.get("PROF_BATCH", "8"))
    ITERS = int(os.environ.get("PROF_ITERS", "12"))
    H, W = 1080, 1920
    defaults = StereoParams()
    params = StereoParams(
        artifact_smoothing=float(os.environ.get(
            "SBS_SMOOTHING", defaults.artifact_smoothing)),
        super_sampling=float(os.environ.get("SBS_SS",
                                            defaults.super_sampling)),
        convergence=float(os.environ.get("SBS_CONV", defaults.convergence)),
        sharpen=float(os.environ.get("SBS_SHARPEN", defaults.sharpen)),
    )

    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    base = 0.5 + 0.5 * np.sin(xx / 97.0) * np.cos(yy / 53.0)
    blocks = ((xx // 240).astype(int) % 3 == (yy // 135).astype(int) % 3)
    tex = rng.normal(0, 0.04, (H, W)).astype(np.float32)
    plane = np.clip(base * 0.6 + blocks * 0.3 + tex, 0, 1)
    frame = (np.stack([plane, 0.8 * plane + 0.1, 1.0 - 0.7 * plane], -1)
             * 255).astype(np.uint8)
    rgb = jnp.asarray(np.broadcast_to(frame, (B, H, W, 3)).copy())
    d = 0.45 + 0.35 * np.sin(xx / 311.0) * np.cos(yy / 173.0) + blocks * 0.15
    depth = jnp.asarray(np.broadcast_to(
        (np.clip(d, 0, 1) * 255).astype(np.uint8), (B, H, W)).copy())

    out = generate_sbs(rgb, depth, params)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = generate_sbs(rgb, depth, params)
    sync(out)
    ms = 1000.0 * (time.perf_counter() - t0) / (ITERS * B)
    print(f"SBS {ms:.2f} ms/frame  (params={params})")


if __name__ == "__main__":
    main()
