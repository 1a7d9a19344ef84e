#!/usr/bin/env python3
"""4K (2160x3840) in-memory SBS throughput on the production TPU path —
the README's 4K datapoint. Content matches bench.py's scene-like plane."""
from __future__ import annotations

import functools
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

    B, H, W = 2, 2160, 3840
    params = StereoParams()

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

    fn = functools.partial(st.generate_sbs, params=params)
    out = fn(rgb, depth)
    sync(out)
    iters = 8
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(rgb, depth)
    sync(out)
    ms = 1000.0 * (time.perf_counter() - t0) / (iters * B)
    print(f"4K SBS (batch {B}): {ms:.1f} ms/frame  ({1000.0 / ms:.2f} fps)")


if __name__ == "__main__":
    main()
