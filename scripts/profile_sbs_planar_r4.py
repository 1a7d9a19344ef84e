#!/usr/bin/env python3
"""Fine-grained in-context decomposition of the planar-u8 SBS pipeline
(r4: basis for the <40 ms/frame work, VERDICT r3 next #3). Cumulative
partial programs over the exact production ops:

  P0: pre-warp head minus supersample (lanczos stretch + normalize)
  P1: P0 + supersample (u8 upsample kernel + depth bilinear)
  P2: P1 + fused blur+gamma
  P3: P2 + planar-u8 warp (both eyes)
  P4: P3 + quarter pyramid estimate (both eyes)
  P5: P4 + fused planar postprocess (both eyes, lax.map like production)
  P6: full generate_sbs

Deltas between consecutive programs attribute ms/frame per stage in
context. PROF_BATCH / PROF_ITERS env knobs (default 8 / 12, matching
bench.py's batch).
"""
from __future__ import annotations

import functools
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

    from vsc_tpu.config import StereoParams
    from vsc_tpu.ops import stereo as st
    from vsc_tpu.ops.filters import gaussian_blur
    from vsc_tpu.ops.inpaint import _pyramid_fill_planar_coarse
    from vsc_tpu.ops.postprocess_pallas import postprocess_eye_planar_pallas
    from vsc_tpu.ops.resize import resize
    from vsc_tpu.ops.upsample_pallas import upsample_bilinear_int_pallas
    from vsc_tpu.ops.warp_pallas import forward_warp_stereo_pallas_planar_u8

    B = int(os.environ.get("PROF_BATCH", "8"))
    ITERS = int(os.environ.get("PROF_ITERS", "12"))
    H, W = 1080, 1920
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

    def p0(rgb_u8, depth_u8):
        rgb_f = rgb_u8.astype(jnp.float32)
        depth_f = depth_u8.astype(jnp.float32)
        rgb_st = st._quantize_like(
            resize(rgb_f, H, s["stretched_w"], "lanczos4", channel_last=True),
            255.0)
        depth_st = st._quantize_like(
            resize(depth_f, H, s["stretched_w"], "lanczos4"), 255.0)
        depth_n = st._normalize_depth(depth_st)
        return rgb_st, depth_n

    def p1(rgb_u8, depth_u8):
        rgb_st, depth_n = p0(rgb_u8, depth_u8)
        depth_n = resize(depth_n, s["up_h"], s["up_w"], "bilinear")
        x_cf = jnp.moveaxis(rgb_st, -1, 1)
        rgb_cf = upsample_bilinear_int_pallas(
            x_cf.reshape((-1,) + x_cf.shape[2:]),
            s["up_h"] // H, quantize_u8=True,
        ).reshape(x_cf.shape[:2] + (s["up_h"], s["up_w"]))
        return rgb_cf, depth_n

    def p2(rgb_u8, depth_u8):
        rgb_cf, depth_n = p1(rgb_u8, depth_u8)
        k = max(5, min(int(params.edge_softness * 6) | 1, 31))
        depth_n = gaussian_blur(depth_n, k, params.edge_softness,
                                gamma=params.depth_gamma)
        return rgb_cf, depth_n

    def p3(rgb_u8, depth_u8):
        rgb_cf, depth_n = p2(rgb_u8, depth_u8)
        return forward_warp_stereo_pallas_planar_u8(
            rgb_cf, depth_n, params.max_disparity)

    def p4(rgb_u8, depth_u8):
        eye_l, eye_r = p3(rgb_u8, depth_u8)
        pair = jnp.concatenate([eye_l, eye_r], axis=1)   # merged (r4)
        return pair, _pyramid_fill_planar_coarse(pair)

    def p5(rgb_u8, depth_u8):
        pair, sm = p4(rgb_u8, depth_u8)
        return postprocess_eye_planar_pallas(
            pair, sm, params.artifact_smoothing)

    # small reductions so output transfer stays negligible
    wrap = {
        "P0 stretch+normalize": lambda a, b: tuple(
            x[..., ::7].sum() for x in p0(a, b)),
        "P1 +supersample": lambda a, b: tuple(
            x[..., ::7].sum() for x in p1(a, b)),
        "P2 +blur/gamma": lambda a, b: tuple(
            x[..., ::7].sum() for x in p2(a, b)),
        "P3 +warp": lambda a, b: tuple(
            x[:, :, ::7].sum() for x in p3(a, b)),
        "P4 +pyramid": lambda a, b: tuple(
            x[..., ::7].sum() for x in p4(a, b)),
        "P5 +postprocess": lambda a, b: p5(a, b)[:, :, ::7].sum(),
    }

    full = functools.partial(st.generate_sbs, params=params)

    def bench(label, fn, *a):
        out = fn(*a)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*a)
        sync(out)
        ms = 1000.0 * (time.perf_counter() - t0) / (ITERS * B)
        print(f"{label:34s} {ms:8.2f} ms/frame", flush=True)
        return ms

    prev = 0.0
    times = {}
    for label, fn in wrap.items():
        t = bench(label, jax.jit(fn), rgb, depth)
        times[label] = t
        print(f"{'  delta':34s} {t - prev:8.2f}")
        prev = t
    tc = bench("P6 full generate_sbs", full, rgb, depth)
    print(f"{'  delta crop+finish+pack':34s} {tc - prev:8.2f}")


if __name__ == "__main__":
    main()
