#!/usr/bin/env python3
"""Decompose the patch-ViT's non-matmul time: times the real ViT at several
ablations (no blocks, no hooks, einsum vs pallas attention) so the ~50
ms/frame gap between component sums and the measured ViT can be attributed.

Usage: python scripts/profile_vit_glue.py [--batch 70]"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from vsc_tpu.utils.jax_setup import setup_jax, sync


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=70)
    parser.add_argument("--iters", type=int, default=4)
    args = parser.parse_args()

    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax.core import meta

    from vsc_tpu.models.vit import ViT, ViTConfig

    N = args.batch
    frames = N / 35.0
    rng = np.random.default_rng(0)
    tiles = jnp.asarray(rng.uniform(-1, 1, (N, 384, 384, 3)).astype(np.float32))

    def build(depth, hooks, flash):
        cfg = ViTConfig(dtype=jnp.bfloat16, depth=depth,
                        flash_attention=flash)
        vit = ViT(cfg, hook_block_ids=hooks)
        params = meta.unbox(vit.init(jax.random.PRNGKey(0), tiles[:1])["params"])
        params = jax.device_put(params)

        @jax.jit
        def run(p, t):
            out, hk = vit.apply({"params": p}, t)
            return (out, tuple(hk.values()))
        return run, params

    def bench(label, depth, hooks, flash):
        run, params = build(depth, hooks, flash)
        out = run(params, tiles)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = run(params, tiles)
        sync(out)
        ms = 1000.0 * (time.perf_counter() - t0) / args.iters
        print(f"{label:40s} {ms:8.1f} ms  ({ms / frames:6.1f} ms/frame)",
              flush=True)
        return ms / frames

    t0b = bench("embed only (depth=0)", 0, (), None)
    t24 = bench("full ViT-L (depth=24, hooks 5/11)", 24, (5, 11), None)
    t24nh = bench("full ViT-L (no hooks)", 24, (), None)
    t4 = bench("depth=4 (no hooks)", 4, (), None)
    t24e = bench("full ViT-L einsum attention", 24, (5, 11), False)
    print(f"per-block marginal (4->24 blocks): "
          f"{(t24nh - t4) / 20.0 * 24.0:6.1f} ms/frame for 24")
    print(f"hooks cost: {t24 - t24nh:6.1f} ms/frame")
    print(f"embed+norm overhead: {t0b:6.1f} ms/frame")


if __name__ == "__main__":
    main()
