#!/usr/bin/env python3
"""Hardware A/B of each round-4 "bit-identical" kernel optimization
(VERDICT r4 #2c): interpret-mode parity is necessary but NOT sufficient on
the axon platform (it miscompiled the r4 eye crop with all tests green), so
each optimization gets one on-silicon check — SSIM vs oracle AND timing —
against its fallback form.

Each config runs in a SUBPROCESS (the knobs are read at trace time and the
jit caches don't key on env). Results: one JSON line per config.

Usage: python scripts/ab_hw_kernels.py            # all configs
       AB_CONFIGS=baseline,warp_legacy ...        # subset
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

CONFIGS = {
    # all knobs at production defaults
    "baseline": {},
    # r4 packed warp color carry -> legacy 5-carry scan
    "warp_legacy": {"VSC_TPU_WARP_PACKED": "0"},
    # r4 single-kernel deep-pyramid tail -> jnp ladder
    "pyr_jnp": {"VSC_TPU_PYR": "jnp"},
    # r4 paired bilateral taps -> direct per-tap weights
    "pp_unpaired": {"VSC_TPU_PP_PAIRED": "0"},
    # r3 Pallas pool prepass -> jnp pools (pyramid input provenance)
    "pool_jnp": {"VSC_TPU_POOL": "jnp"},
}


def run_one() -> None:
    sys.path.insert(0, str(REPO))
    from vsc_tpu.utils.jax_setup import setup_jax, sync
    setup_jax()
    import time

    import numpy as np

    import bench
    from vsc_tpu.config import StereoParams
    from vsc_tpu.ops.stereo import generate_sbs

    H, W, B, iters = 1080, 1920, 4, 12
    frame, depth = bench.bench_content(H, W)
    frames = np.broadcast_to(frame, (B, H, W, 3)).copy()
    depths = np.broadcast_to(depth, (B, H, W)).copy()
    p = StereoParams()

    out = generate_sbs(frames, depths, p)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = generate_sbs(frames, depths, p)
    sync(out)
    ms = 1000.0 * (time.perf_counter() - t0) / (iters * B)

    oracle = bench._oracle_module()
    ours = np.asarray(out)[0]
    ref = bench.oracle_sbs(frame, depth, p)
    print(json.dumps({
        "config": os.environ.get("AB_NAME", "?"),
        "sbs_ms_per_frame": round(ms, 1),
        "ssim": round(oracle.ssim(ours, ref), 4),
        "ssim_left": round(oracle.ssim(ours[:, :W], ref[:, :W]), 4),
        "ssim_right": round(oracle.ssim(ours[:, W:], ref[:, W:]), 4),
    }), flush=True)


def main() -> None:
    names = os.environ.get("AB_CONFIGS", ",".join(CONFIGS)).split(",")
    for name in names:
        env = dict(os.environ, AB_NAME=name, **CONFIGS[name])
        r = subprocess.run([sys.executable, __file__, "--one"], env=env,
                           cwd=REPO, timeout=1800)
        if r.returncode != 0:
            print(json.dumps({"config": name, "error": f"exit {r.returncode}"}),
                  flush=True)


if __name__ == "__main__":
    if "--one" in sys.argv:
        run_one()
    else:
        main()
