#!/usr/bin/env python3
"""Time the bench depth_fn's wrapper stages (everything around the model)
separately to find where the full-bench depth time diverges from the
standalone model forward."""
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

    from vsc_tpu.ops.resize import resize

    H, W, S, B = 1080, 1920, 1536, 2
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 255, (B, H, W, 3)).astype(np.uint8))
    d = jnp.asarray(rng.uniform(0, 1, (B, S, S)).astype(np.float32))

    @jax.jit
    def pre(frames_u8):
        x = frames_u8.astype(jnp.float32)
        x = resize(x, S, S, "bilinear", channel_last=True)
        return x / 127.5 - 1.0

    @jax.jit
    def post(dd):
        dd = resize(dd, H, W, "bilinear")
        mn = dd.min(axis=(1, 2), keepdims=True)
        mx = dd.max(axis=(1, 2), keepdims=True)
        n = (dd - mn) / jnp.maximum(mx - mn, 1e-12)
        return jnp.round(n * 255.0).astype(jnp.uint8)

    def bench(label, fn, *a):
        out = fn(*a)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(8):
            out = fn(*a)
        sync(out)
        ms = 1000.0 * (time.perf_counter() - t0) / (8 * B)
        print(f"{label:28s} {ms:8.1f} ms/frame")

    bench("pre (resize up + norm)", pre, frames)
    bench("post (resize down + quant)", post, d)


if __name__ == "__main__":
    main()
