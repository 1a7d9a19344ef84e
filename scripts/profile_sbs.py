#!/usr/bin/env python3
"""Stage-wise timing of the SBS pipeline at 1080p reference defaults
(disparity 50, supersampling 3, smoothing 1, sharpen 14) on the TPU.
Usage: python scripts/profile_sbs.py [--batch 4] [--iters 4]"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from vsc_tpu.utils.jax_setup import setup_jax, sync


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--iters", type=int, default=4)
    args = parser.parse_args()

    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vsc_tpu.config import StereoParams
    from vsc_tpu.ops.filters import gaussian_blur, unsharp_mask
    from vsc_tpu.ops.inpaint import _pyramid_fill
    from vsc_tpu.ops.resize import resize
    from vsc_tpu.ops.stereo import sbs_shapes
    from vsc_tpu.ops.warp_pallas import forward_warp_stereo_pallas
    from vsc_tpu.ops.postprocess_pallas import postprocess_eye_pallas

    B, H, W = args.batch, 1080, 1920
    params = StereoParams()  # reference defaults
    s = sbs_shapes(H, W, params)
    up_h, up_w = s["up_h"], s["up_w"]
    print(f"supersampled geometry: {up_h} x {up_w}")

    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    base = 0.5 + 0.5 * np.sin(xx / 97.0) * np.cos(yy / 53.0)
    tex = rng.normal(0, 0.04, (H, W)).astype(np.float32)
    plane = np.clip(base * 0.7 + tex, 0, 1)
    rgb = np.stack([plane, 0.8 * plane, 1 - plane], -1) * 255
    rgb = jnp.asarray(np.broadcast_to(rgb.astype(np.float32),
                                      (B, H, W, 3)).copy())
    depth = jnp.asarray(np.broadcast_to(
        (plane * 255).astype(np.float32), (B, H, W)).copy())

    rgb_up = jnp.zeros((B, up_h, up_w, 3), jnp.float32)
    dep_up = jnp.zeros((B, up_h, up_w), jnp.float32)
    # realistic-ish warped inputs for postprocess: shift + mask pattern
    warped = rgb_up + 127.0
    mask = jnp.asarray(
        (rng.uniform(size=(B, up_h, up_w)) > 0.02).astype(np.float32))

    def bench(label, fn, *a):
        out = fn(*a)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        sync(out)
        ms = 1000.0 * (time.perf_counter() - t0) / (args.iters * B)
        print(f"{label:36s} {ms:8.1f} ms/frame")

    k = max(5, min(int(params.edge_softness * 6) | 1, 31))

    rgb_st = resize(rgb, H, s["stretched_w"], "lanczos4", channel_last=True)
    dep_st = resize(depth, H, s["stretched_w"], "lanczos4")
    bench("lanczos pre-stretch (rgb+depth)",
          jax.jit(lambda r, d: (resize(r, H, s["stretched_w"], "lanczos4",
                                       channel_last=True),
                                resize(d, H, s["stretched_w"], "lanczos4"))),
          rgb, depth)
    bench("bilinear supersample x3 (rgb+depth)",
          jax.jit(lambda r, d: (resize(r, up_h, up_w, "bilinear",
                                       channel_last=True),
                                resize(d, up_h, up_w, "bilinear"))),
          rgb_st, dep_st)
    bench(f"gaussian k{k} on supersampled depth",
          jax.jit(lambda d: gaussian_blur(d, k, params.edge_softness)), dep_up)
    bench("warp (pallas, both eyes)",
          jax.jit(lambda r, d: forward_warp_stereo_pallas(
              r, d, params.max_disparity)), rgb_up, dep_up)
    bench("pyramid estimate (quarter-res)",
          jax.jit(lambda w_, m: _pyramid_fill(w_, m[..., None],
                                              coarse_factor=4)),
          warped, mask)
    bench("postprocess kernel (one eye)",
          jax.jit(lambda w_, m, sm: postprocess_eye_pallas(
              w_, m, sm, params.artifact_smoothing)),
          warped, mask, warped)
    bench("unsharp s14 (one eye, cropped w)",
          jax.jit(lambda x: unsharp_mask(x, params.sharpen)),
          jnp.zeros((B, up_h, s["crop_w"], 3), jnp.float32))
    bench("area downscale (one eye)",
          jax.jit(lambda x: resize(x, H, W, "area", channel_last=True)),
          jnp.zeros((B, up_h, s["crop_w"], 3), jnp.float32))


if __name__ == "__main__":
    main()
