#!/usr/bin/env python3
"""Compile+run ONLY the planar-u8 warp at production shapes (isolation)."""
from __future__ import annotations

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
    from vsc_tpu.ops import stereo as st
    from vsc_tpu.ops.warp_pallas import forward_warp_stereo_pallas_planar_u8

    B, H, W = 4, 1080, 1920
    params = StereoParams()
    s = st.sbs_shapes(H, W, params)
    UH, UW = s["up_h"], s["up_w"]
    rng = np.random.default_rng(0)
    rgb_cf = jnp.asarray(rng.integers(0, 256, (B, 3, UH, UW), np.uint8))
    depth_n = jnp.asarray(
        (0.5 + 0.4 * np.sin(np.arange(UH * UW, dtype=np.float32)
                            .reshape(UH, UW) / 977.0))[None].repeat(B, 0))

    print("compiling warp...", flush=True)
    t0 = time.perf_counter()
    out = forward_warp_stereo_pallas_planar_u8(
        rgb_cf, depth_n, params.max_disparity)
    sync(out)
    print(f"compile+first run: {time.perf_counter() - t0:.1f} s", flush=True)
    t0 = time.perf_counter()
    for _ in range(12):
        out = forward_warp_stereo_pallas_planar_u8(
            rgb_cf, depth_n, params.max_disparity)
    sync(out)
    ms = 1000.0 * (time.perf_counter() - t0) / (12 * B)
    print(f"warp only: {ms:.1f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
