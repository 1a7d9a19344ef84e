#!/usr/bin/env python3
"""Stage-wise timing of the full DepthPro forward on the TPU: ViTs alone,
encoder (ViTs + upsample stack), and the full model — the difference
attributes time to the decoder/head. Each stage is its own jit (compiles
through the relay; the persistent cache makes reruns warm).

Usage: python scripts/profile_depth.py [--batch 2] [--iters 4]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from vsc_tpu.utils.jax_setup import setup_jax, sync


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=2)
    parser.add_argument("--iters", type=int, default=4)
    parser.add_argument("--input-size", type=int, default=1536)
    args = parser.parse_args()

    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax.core import meta

    from vsc_tpu.models import DepthPro, DepthProConfig, ViTConfig
    from vsc_tpu.models.depthpro import DepthProEncoder
    from vsc_tpu.models.vit import ViT

    S = args.input_size
    B = args.batch
    cfg = DepthProConfig(
        img_size=S, tile_size=S // 4,
        encoder=ViTConfig(img_size=S // 4, dtype=jnp.bfloat16),
        use_fov_head=False, dtype=jnp.bfloat16)
    model = DepthPro(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (B, S, S, 3)).astype(np.float32))
    params = meta.unbox(model.init(jax.random.PRNGKey(0), x[:1])["params"])
    params = jax.device_put(params)

    n_tiles = 35 * B
    tiles = jnp.asarray(
        rng.uniform(-1, 1, (n_tiles, S // 4, S // 4, 3)).astype(np.float32))

    vit = ViT(cfg.encoder, hook_block_ids=cfg.hook_block_ids)
    encoder = DepthProEncoder(cfg)

    @jax.jit
    def run_vit(p, t):
        return vit.apply({"params": p}, t)[0]

    @jax.jit
    def run_encoder(p, imgs):
        return encoder.apply({"params": p}, imgs)

    @jax.jit
    def run_full(p, imgs):
        return model.apply({"params": p}, imgs)["canonical_inverse_depth"]

    def bench(label, fn, *a):
        out = fn(*a)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        sync(out)
        ms = 1000.0 * (time.perf_counter() - t0) / (args.iters * B)
        print(f"{label:28s} {ms:8.1f} ms/frame")
        return ms

    t_vit = bench("patch ViT (35 tiles/frame)", run_vit,
                  params["encoder"]["patch_encoder"], tiles)
    t_enc = bench("encoder (ViTs + upsample)", run_encoder,
                  params["encoder"], x)
    t_full = bench("full model", run_full, params, x)
    print(f"{'-> upsample stack approx':28s} {t_enc - t_vit * 36 / 35:8.1f} "
          f"ms/frame (encoder minus ViTs)")
    print(f"{'-> decoder+head approx':28s} {t_full - t_enc:8.1f} ms/frame")


if __name__ == "__main__":
    main()
