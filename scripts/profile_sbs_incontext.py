#!/usr/bin/env python3
"""In-context SBS decomposition: three partial pipelines sharing the exact
production code path (same content as bench.py), so stage costs include
XLA fusion effects that isolated micro-benches miss.

  A: stages 1-6  (pre-stretch, normalize, supersample, blur, gamma, warp)
  B: stages 1-7  (A + pyramid estimate + fused postprocess, both eyes)
  C: full generate_sbs

Deltas: B-A = in-context postprocess (+pyramid); C-B = crop+unsharp+
downscale+pack; A - (resize sums) = in-context warp.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from vsc_tpu.utils.jax_setup import setup_jax, sync


def main():
    setup_jax()
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vsc_tpu.config import StereoParams
    from vsc_tpu.ops import stereo as st
    from vsc_tpu.ops.filters import gaussian_blur
    from vsc_tpu.ops.resize import resize

    B, H, W = 2, 1080, 1920
    params = StereoParams()
    s = st.sbs_shapes(H, W, params)

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

    def head(rgb_u8, depth_u8):
        rgb_f = rgb_u8.astype(jnp.float32)
        depth_f = depth_u8.astype(jnp.float32)
        rgb_st = st._quantize_like(
            resize(rgb_f, H, s["stretched_w"], "lanczos4", channel_last=True),
            255.0)
        depth_st = st._quantize_like(
            resize(depth_f, H, s["stretched_w"], "lanczos4"), 255.0)
        depth_n = st._normalize_depth(depth_st)
        depth_n = resize(depth_n, s["up_h"], s["up_w"], "bilinear")
        rgb_up = resize(rgb_st, s["up_h"], s["up_w"], "bilinear",
                        channel_last=True)
        k = max(5, min(int(params.edge_softness * 6) | 1, 31))
        depth_n = gaussian_blur(depth_n, k, params.edge_softness)
        depth_n = jnp.clip(depth_n, 0.001, 1.0) ** params.depth_gamma
        return st._forward_warp(rgb_up, depth_n, params.max_disparity)

    @jax.jit
    def stage_a(rgb_u8, depth_u8):
        left, lm, right, rm = head(rgb_u8, depth_u8)
        return left.sum(), lm.sum(), right.sum(), rm.sum()

    @jax.jit
    def stage_b(rgb_u8, depth_u8):
        left, lm, right, rm = head(rgb_u8, depth_u8)
        eyes = jnp.stack([left, right])
        masks = jnp.stack([lm, rm])
        out = jax.lax.map(
            lambda a: st._postprocess_eye(a[0], a[1],
                                          params.artifact_smoothing),
            (eyes, masks))
        return out.sum()

    full = functools.partial(st.generate_sbs, params=params)

    def bench(label, fn, *a):
        out = fn(*a)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(12):
            out = fn(*a)
        sync(out)
        ms = 1000.0 * (time.perf_counter() - t0) / (12 * B)
        print(f"{label:34s} {ms:8.1f} ms/frame", flush=True)
        return ms

    ta = bench("A: through warp", stage_a, rgb, depth)
    tb = bench("B: + postprocess (both eyes)", stage_b, rgb, depth)
    tc = bench("C: full generate_sbs", full, rgb, depth)
    print(f"{'delta postprocess (B-A)':34s} {tb - ta:8.1f} ms/frame")
    print(f"{'delta finish (C-B)':34s} {tc - tb:8.1f} ms/frame")


if __name__ == "__main__":
    main()
