#!/usr/bin/env python3
"""Minimal depth-stage-only timing (for env-knob / code A/Bs run as
subprocesses): prints one line `DEPTH <ms/frame>`. Same model config,
content, and program as bench.py's depth stage."""
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
    from flax.core import meta

    from vsc_tpu.models import DepthPro, DepthProConfig, ViTConfig
    from vsc_tpu.ops.resize import resize

    B = int(os.environ.get("PROF_BATCH", "8"))
    ITERS = int(os.environ.get("PROF_ITERS", "8"))
    H, W = 1080, 1920
    cfg = DepthProConfig(encoder=ViTConfig(dtype=jnp.bfloat16),
                         dtype=jnp.bfloat16, use_fov_head=False)
    model = DepthPro(cfg)
    params = meta.unbox(model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.img_size, cfg.img_size, 3), jnp.float32))["params"])

    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 256, (B, H, W, 3), np.uint8))

    @jax.jit
    def depth_fn(params, frames_u8):
        x = frames_u8.astype(jnp.float32)
        x = resize(x, cfg.img_size, cfg.img_size, "bilinear",
                   channel_last=True)
        x = x / 127.5 - 1.0
        d = model.apply({"params": params}, x)["canonical_inverse_depth"]
        d = resize(d, H, W, "bilinear")
        mn = d.min(axis=(1, 2), keepdims=True)
        mx = d.max(axis=(1, 2), keepdims=True)
        n = (d - mn) / jnp.maximum(mx - mn, 1e-12)
        return jnp.round(n * 255.0).astype(jnp.uint8)

    out = depth_fn(params, frames)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = depth_fn(params, frames)
    sync(out)
    ms = 1000.0 * (time.perf_counter() - t0) / (ITERS * B)
    print(f"DEPTH {ms:.2f} ms/frame")


if __name__ == "__main__":
    main()
