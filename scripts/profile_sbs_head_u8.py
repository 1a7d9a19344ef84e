#!/usr/bin/env python3
"""Decompose the planar-U8 SBS head (the production TPU path after the r3
redesign) into cumulative partial pipelines: stretch / depth upsample /
u8 supersample / fused blur+gamma / warp. Content matches bench.py."""
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

    from vsc_tpu.config import StereoParams
    from vsc_tpu.ops import stereo as st
    from vsc_tpu.ops.filters import gaussian_blur
    from vsc_tpu.ops.resize import resize
    from vsc_tpu.ops.upsample_pallas import upsample_bilinear_int_pallas
    from vsc_tpu.ops.warp_pallas import forward_warp_stereo_pallas_planar_u8

    B, H, W = 4, 1080, 1920
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

    def h_stretch(rgb_u8, depth_u8):
        rgb_f = rgb_u8.astype(jnp.float32)
        depth_f = depth_u8.astype(jnp.float32)
        rgb_st = st._quantize_like(
            resize(rgb_f, H, s["stretched_w"], "lanczos4", channel_last=True),
            255.0)
        depth_st = st._quantize_like(
            resize(depth_f, H, s["stretched_w"], "lanczos4"), 255.0)
        return rgb_st, st._normalize_depth(depth_st)

    def h_dup(rgb_u8, depth_u8):
        rgb_st, depth_n = h_stretch(rgb_u8, depth_u8)
        return rgb_st, resize(depth_n, s["up_h"], s["up_w"], "bilinear")

    def h_super(rgb_u8, depth_u8):
        rgb_st, depth_n = h_dup(rgb_u8, depth_u8)
        x_cf = jnp.moveaxis(rgb_st, -1, 1)
        rgb_cf = upsample_bilinear_int_pallas(
            x_cf.reshape((-1,) + x_cf.shape[2:]),
            s["up_h"] // H, quantize_u8=True,
        ).reshape(x_cf.shape[:2] + (s["up_h"], s["up_w"]))
        return rgb_cf, depth_n

    def h_soften(rgb_u8, depth_u8):
        rgb_cf, depth_n = h_super(rgb_u8, depth_u8)
        k = max(5, min(int(params.edge_softness * 6) | 1, 31))
        depth_n = gaussian_blur(depth_n, k, params.edge_softness,
                                gamma=params.depth_gamma)
        return rgb_cf, depth_n

    def h_warp(rgb_u8, depth_u8):
        rgb_cf, depth_n = h_soften(rgb_u8, depth_u8)
        return forward_warp_stereo_pallas_planar_u8(rgb_cf, depth_n,
                                                    params.max_disparity)

    def reduce_all(*ts):
        return sum(t[..., ::7].sum() for t in ts)

    stages = [
        ("1 stretch+normalize", h_stretch),
        ("2 + depth upsample", h_dup),
        ("3 + u8 supersample (pallas)", h_super),
        ("4 + fused blur+gamma", h_soften),
        ("5 + warp (planar u8)", h_warp),
    ]

    prev = 0.0
    for label, fn in stages:
        f = jax.jit(lambda r, d, fn=fn: reduce_all(*fn(r, d)))
        out = f(rgb, depth)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(12):
            out = f(rgb, depth)
        sync(out)
        ms = 1000.0 * (time.perf_counter() - t0) / (12 * B)
        print(f"{label:30s} {ms:8.1f} ms/frame  (delta {ms - prev:+6.1f})",
              flush=True)
        prev = ms


if __name__ == "__main__":
    main()
