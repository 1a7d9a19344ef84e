#!/usr/bin/env python3
"""Stage-by-stage hardware-vs-interpret localization for the planar-u8 SBS
pipeline (round-5: after fixing the r4 crop miscompile, a residual hardware
SSIM gap of ~0.004-0.009 vs interpret mode remains on the planar path; the
non-planar path is hardware-exact, so the defect is in one of the planar
kernels or their XLA glue).

Method: the TPU run computes the pipeline ONE STAGE AT A TIME, materializing
every stage INPUT and OUTPUT to the host (npz). The CPU run replays each
stage in interpret mode FROM THE TPU'S OWN INPUTS (no error cascade) and
reports elementwise max-diff / mismatch-count per stage. A stage whose
recompute diverges is miscompiled on hardware.

Usage:
  python scripts/stage_hw_vs_interp.py dump /tmp/stages.npz      # on TPU
  python scripts/stage_hw_vs_interp.py compare /tmp/stages.npz   # CPU replay
Env: STAGE_SIZE=HxW (default 432x768), STAGE_DEPTH=scene|noise
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

MODE = sys.argv[1] if len(sys.argv) > 1 else "dump"
NPZ = sys.argv[2] if len(sys.argv) > 2 else "/tmp/stages.npz"

if MODE == "compare":
    import jax
    jax.config.update("jax_platforms", "cpu")
    os.environ["VSC_TPU_SBS"] = "planar"  # planar kernels in interpret mode
else:
    from vsc_tpu.utils.jax_setup import setup_jax
    setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import bench  # noqa: E402
from vsc_tpu.config import StereoParams  # noqa: E402
from vsc_tpu.ops import stereo as st  # noqa: E402

H, W = (int(v) for v in os.environ.get("STAGE_SIZE", "432x768").split("x"))
params = StereoParams()
s = st.sbs_shapes(H, W, params)
lo, ro, crop_w = st._crop_offsets(H, W, params)
ratio = int(s["scale_ratio"])


def stages():
    """(name, fn, input_names) in planar-u8 pipeline order. Each fn is a
    pure jit-able function of the named inputs — mirrors
    ops/stereo._generate_sbs_impl's planar_u8 branch."""
    from vsc_tpu.ops.filters import gaussian_blur
    from vsc_tpu.ops.finish_pallas import sharpen_downscale_planar
    from vsc_tpu.ops.inpaint import _pyramid_fill_planar_coarse
    from vsc_tpu.ops.postprocess_pallas import postprocess_eye_planar_pallas
    from vsc_tpu.ops.resize import resize
    from vsc_tpu.ops.upsample_pallas import upsample_bilinear_int_pallas
    from vsc_tpu.ops.warp_pallas import forward_warp_stereo_pallas_planar_u8

    def prestretch(rgb, depth):
        rgbf = rgb.astype(jnp.float32)
        depthf = depth.astype(jnp.float32)
        rgb_st = st._quantize_like(
            resize(rgbf, H, s["stretched_w"], "lanczos4", channel_last=True),
            255.0)
        depth_st = st._quantize_like(
            resize(depthf, H, s["stretched_w"], "lanczos4"), 255.0)
        depth_n = st._normalize_depth(depth_st)
        return rgb_st, depth_n

    def depth_up(depth_n):
        d = resize(depth_n, s["up_h"], s["up_w"], "bilinear")
        k = max(5, min(int(params.edge_softness * 6) | 1, 31))
        return gaussian_blur(d, k, params.edge_softness, gamma=None)

    def rgb_up(rgb_st):
        x_cf = jnp.moveaxis(rgb_st, -1, 1)
        return upsample_bilinear_int_pallas(
            x_cf.reshape((-1,) + x_cf.shape[2:]),
            s["up_h"] // H, quantize_u8=True,
        ).reshape(x_cf.shape[:2] + (s["up_h"], s["up_w"]))

    def warp(rgb_cf, depth_up_out):
        eye_l, eye_r = forward_warp_stereo_pallas_planar_u8(
            rgb_cf, depth_up_out, params.max_disparity)
        return jnp.concatenate([eye_l, eye_r], axis=1)

    def pyramid(pair):
        return _pyramid_fill_planar_coarse(pair)

    def postprocess(pair, smooth_q):
        return postprocess_eye_planar_pallas(pair, smooth_q,
                                             params.artifact_smoothing)

    def finish(pp_out):
        B2 = pp_out.shape[1] // 2
        eye_crops = jax.lax.optimization_barrier((
            jax.lax.slice_in_dim(pp_out[:, :B2], lo, lo + crop_w, axis=3),
            jax.lax.slice_in_dim(pp_out[:, B2:], ro, ro + crop_w, axis=3),
        ))
        cropped = jnp.concatenate(eye_crops, axis=1)
        fin = sharpen_downscale_planar(cropped, ratio,
                                       float(params.sharpen), H, W)
        sbs = jnp.concatenate([fin[:, :B2], fin[:, B2:]], axis=3)
        return jnp.moveaxis(sbs, 0, -1)

    return [
        ("prestretch", prestretch, ("rgb", "depth")),
        ("depth_up", depth_up, ("prestretch.1",)),
        ("rgb_up", rgb_up, ("prestretch.0",)),
        ("warp", warp, ("rgb_up", "depth_up")),
        ("pyramid", pyramid, ("warp",)),
        ("postprocess", postprocess, ("warp", "pyramid")),
        ("finish", finish, ("postprocess",)),
    ]


def materialize(x):
    if isinstance(x, tuple):
        return tuple(np.asarray(v) for v in x)
    return np.asarray(x)


def main():
    frame, scene_depth = bench.bench_content(H, W)
    if os.environ.get("STAGE_DEPTH", "scene") == "noise":
        rng = np.random.default_rng(7)
        scene_depth = rng.integers(0, 256, (H, W), np.uint8)
    store = {"rgb": frame[None], "depth": scene_depth[None]}

    def fetch(name):
        if name in store:
            return store[name]
        base, idx = name.rsplit(".", 1)
        return store[base][int(idx)]

    if MODE == "dump":
        for name, fn, ins in stages():
            out = materialize(jax.jit(fn)(*(jnp.asarray(fetch(i))
                                            for i in ins)))
            store[name] = out
            print(f"dumped {name}", flush=True)
        flat = {}
        for k, v in store.items():
            if isinstance(v, tuple):
                for i, vv in enumerate(v):
                    flat[f"{k}.{i}"] = vv
            else:
                flat[k] = v
        np.savez_compressed(NPZ, **flat)
        print(f"wrote {NPZ}")
        return

    data = np.load(NPZ)
    store.update({k: data[k] for k in data.files})
    for name, fn, ins in stages():
        got = materialize(jax.jit(fn)(*(jnp.asarray(fetch(i))
                                        for i in ins)))
        gots = got if isinstance(got, tuple) else (got,)
        wants = tuple(store[f"{name}.{i}"] for i in range(len(gots))) \
            if isinstance(got, tuple) else (store[name],)
        for i, (g, w) in enumerate(zip(gots, wants)):
            g64 = np.asarray(g, np.float64)
            w64 = np.asarray(w, np.float64)
            nbad = int((g64 != w64).sum())
            maxd = float(np.abs(g64 - w64).max()) if nbad else 0.0
            tag = f"{name}" + (f".{i}" if isinstance(got, tuple) else "")
            frac = nbad / g64.size
            print(f"{tag:16s} mismatch {nbad:>9d} ({100 * frac:6.3f}%)  "
                  f"maxdiff {maxd:g}", flush=True)


if __name__ == "__main__":
    main()
