#!/usr/bin/env python3
"""In-context decomposition of the PLANAR-U8 SBS pipeline (the production
TPU path after the r3 redesign): cumulative partial programs built from the
same ops the planar branch of ops/stereo._generate_sbs_impl runs.

  A: pre-warp head (lanczos stretch, normalize, u8 supersample,
     fused blur+gamma) + planar-u8 warp
  B: A + quarter pyramid + fused planar postprocess (both eyes)
  C: full generate_sbs

Deltas: B-A = pyramid+postprocess; C-B = crop+finish+final interleave.
Content matches bench.py's scene-like plane.
"""
from __future__ import annotations

import functools
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
        x_cf = jnp.moveaxis(rgb_st, -1, 1)
        rgb_cf = upsample_bilinear_int_pallas(
            x_cf.reshape((-1,) + x_cf.shape[2:]),
            s["up_h"] // H, quantize_u8=True,
        ).reshape(x_cf.shape[:2] + (s["up_h"], s["up_w"]))
        k = max(5, min(int(params.edge_softness * 6) | 1, 31))
        depth_n = gaussian_blur(depth_n, k, params.edge_softness,
                                gamma=params.depth_gamma)
        return forward_warp_stereo_pallas_planar_u8(
            rgb_cf, depth_n, params.max_disparity)

    @jax.jit
    def stage_a(rgb_u8, depth_u8):
        eye_l, eye_r = head(rgb_u8, depth_u8)
        return eye_l[::2].sum(), eye_r[::2].sum()

    @jax.jit
    def stage_b(rgb_u8, depth_u8):
        eye_l, eye_r = head(rgb_u8, depth_u8)

        def body(eye4):
            sm = _pyramid_fill_planar_coarse(eye4)
            return postprocess_eye_planar_pallas(
                eye4, sm, params.artifact_smoothing)

        out = jax.lax.map(body, jnp.stack([eye_l, eye_r]))
        return out[:, :, :, ::7].sum()

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

    ta = bench("A: through warp (planar u8)", stage_a, rgb, depth)
    tb = bench("B: + pyramid+postprocess", stage_b, rgb, depth)
    tc = bench("C: full generate_sbs", full, rgb, depth)
    print(f"{'delta pyramid+postprocess (B-A)':34s} {tb - ta:8.1f} ms/frame")
    print(f"{'delta finish (C-B)':34s} {tc - tb:8.1f} ms/frame")


if __name__ == "__main__":
    main()
