#!/usr/bin/env python3
"""Compare the one-jit bench depth_fn against a barriered variant to
localize the cross-stage XLA pessimization."""
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
    from flax.core import meta

    from vsc_tpu.models import DepthPro, DepthProConfig, ViTConfig
    from vsc_tpu.ops.resize import resize

    H, W, B = 1080, 1920, 2
    cfg = DepthProConfig(
        encoder=ViTConfig(dtype=jnp.bfloat16), dtype=jnp.bfloat16,
        use_fov_head=False)
    S = cfg.img_size
    model = DepthPro(cfg)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 255, (B, H, W, 3)).astype(np.uint8))
    params = meta.unbox(model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3), jnp.float32))["params"])
    params = jax.device_put(params)

    def pre(frames_u8):
        x = frames_u8.astype(jnp.float32)
        x = resize(x, S, S, "bilinear", channel_last=True)
        return x / 127.5 - 1.0

    def post(d):
        d = resize(d, H, W, "bilinear")
        mn = d.min(axis=(1, 2), keepdims=True)
        mx = d.max(axis=(1, 2), keepdims=True)
        n = (d - mn) / jnp.maximum(mx - mn, 1e-12)
        return jnp.round(n * 255.0).astype(jnp.uint8)

    @jax.jit
    def fused(p, f):
        d = model.apply({"params": p}, pre(f))["canonical_inverse_depth"]
        return post(d)

    @jax.jit
    def barriered(p, f):
        x = jax.lax.optimization_barrier(pre(f))
        d = model.apply({"params": p}, x)["canonical_inverse_depth"]
        return post(jax.lax.optimization_barrier(d))

    def bench(label, fn, *a):
        out = fn(*a)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(6):
            out = fn(*a)
        sync(out)
        ms = 1000.0 * (time.perf_counter() - t0) / (6 * B)
        print(f"{label:28s} {ms:8.1f} ms/frame", flush=True)

    bench("one-jit (current bench)", fused, params, frames)
    bench("barriered", barriered, params, frames)


if __name__ == "__main__":
    main()
