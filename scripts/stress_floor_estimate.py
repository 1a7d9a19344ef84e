#!/usr/bin/env python3
"""
Stress-test the 0.95 fps reference-floor estimate (VERDICT r3 next #8)
======================================================================

The bench's ``vs_baseline`` denominator (REFERENCE_FLOOR_FPS = 0.95) is a
documented ESTIMATE of the reference on a DirectML-class GPU — the
reference publishes no numbers (/root/reference/README.md:344-358) and this
sandbox has no GPU. This script bounds that estimate from measurements this
host CAN make plus analytic sensitivity, instead of carrying it forward
unexamined:

1. **Host-resident SBS floor (measured).** The reference's SBS stage runs
   cv2.bilateralFilter and cv2.inpaint(TELEA) per eye ON THE CPU even in a
   GPU deployment (helper/stereo_core.py:387-412, 436-457 convert to numpy
   first), plus the cv2 Lanczos pre-stretch (249-254). We run the
   UNMODIFIED reference ``process_frame`` on this host with those calls
   (and the torch ops) timing-wrapped: the cv2 portion is a lower bound on
   the reference's per-frame SBS time on ANY accelerator, scaled only by
   host core count (cv2 parallelizes these; this sandbox has 1 core).

2. **Depth estimate sensitivity (analytic).** The 0.7 s/frame DepthPro
   figure implies an effective FLOP rate = model FLOPs / 0.7 s. We compute
   the model's analytic FLOPs (vsc_tpu/utils/flops.py, architecture-exact)
   and report the MFU that 0.7 s implies on the fp16 peaks of the GPU
   classes the reference targets — if the implied MFU is within the
   typical 20-50% range ONNX/DirectML attains for ViT-class models, the
   estimate is consistent; far outside, it is not.

3. **Floor sensitivity range.** Combining (1) scaled across plausible host
   core counts with (2) across the plausible MFU band yields a floor range;
   BASELINE.md records where 0.95 sits in it.

Prints one JSON line per result. Reference code is imported from
/root/reference and executed unmodified (kornia gaussian shimmed, as in
measure_reference_baseline.py); nothing is copied.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from measure_reference_baseline import _install_kornia_shim, synth_frame  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent))


# fp16 tensor/matrix peak throughput of GPU classes the reference README
# targets (DirectML consumer cards), TFLOP/s. Dense (no sparsity) figures.
GPU_FP16_PEAKS = {
    "RTX 3060 (51 TF fp16)": 51.0,
    "RTX 4070 (117 TF fp16)": 117.0,
    "RX 6700 XT (26 TF fp16)": 26.4,
    "Arc A770 (39 TF fp16)": 39.3,
}

# typical attained-MFU band for ONNX-runtime ViT inference on consumer
# GPUs (DirectML/CUDA EPs): large-matmul ViTs commonly land in this range
ONNX_VIT_MFU_BAND = (0.20, 0.50)


def measure_reference_split(frames: int):
    """Run the unmodified reference process_frame on CPU with cv2/torch
    boundaries timing-wrapped; return per-frame stage seconds."""
    import cv2
    import numpy as np

    _install_kornia_shim()
    sys.path.insert(0, "/root/reference")
    from helper import stereo_core

    acc = {"cv2_resize": 0.0, "cv2_bilateral": 0.0, "cv2_inpaint": 0.0,
           "torch_warp": 0.0}

    def timed(fn, key):
        def wrap(*a, **k):
            t0 = time.perf_counter()
            out = fn(*a, **k)
            acc[key] += time.perf_counter() - t0
            return out
        return wrap

    orig = (cv2.resize, cv2.bilateralFilter, cv2.inpaint,
            stereo_core.forward_warp_stereo)
    cv2.resize = timed(orig[0], "cv2_resize")
    cv2.bilateralFilter = timed(orig[1], "cv2_bilateral")
    cv2.inpaint = timed(orig[2], "cv2_inpaint")
    stereo_core.forward_warp_stereo = timed(orig[3], "torch_warp")
    try:
        gen = stereo_core.StereoGenerator(device="cpu")
        params = stereo_core.StereoParams()  # reference defaults
        rgb, depth = synth_frame(1080, 1920)
        gen.process_frame(rgb, depth, params)  # warm-up (excluded)
        for k in acc:
            acc[k] = 0.0
        t0 = time.perf_counter()
        for _ in range(frames):
            gen.process_frame(rgb, depth, params)
        total = time.perf_counter() - t0
    finally:
        (cv2.resize, cv2.bilateralFilter, cv2.inpaint,
         stereo_core.forward_warp_stereo) = orig

    spf = {k: v / frames for k, v in acc.items()}
    spf["total"] = total / frames
    # cv2 work stays on the host in a GPU deployment (stereo_core converts
    # to numpy around these calls); torch warp/interp/blur offload to GPU
    spf["host_resident_cv2"] = (spf["cv2_resize"] + spf["cv2_bilateral"]
                                + spf["cv2_inpaint"])
    spf["gpu_offloadable"] = spf["total"] - spf["host_resident_cv2"]
    return spf


def depth_estimate_sensitivity():
    import jax.numpy as jnp  # noqa: F401 (flops util is pure python)

    from vsc_tpu.models import DepthProConfig
    from vsc_tpu.utils.flops import depthpro_flops

    flops_nofov = depthpro_flops(DepthProConfig(use_fov_head=False), 1)
    flops_fov = depthpro_flops(DepthProConfig(use_fov_head=True), 1)
    est_s = 0.7  # the BASELINE.md estimate for 1536^2 fp16 bs=1
    eff_tf = flops_fov / est_s / 1e12
    rows = {}
    for name, peak in GPU_FP16_PEAKS.items():
        rows[name] = {
            "implied_mfu_pct": round(100.0 * eff_tf / peak, 1),
            "time_at_20pct_mfu_s": round(flops_fov / (peak * 0.20) / 1e12, 3),
            "time_at_50pct_mfu_s": round(flops_fov / (peak * 0.50) / 1e12, 3),
        }
    return {
        "model_tflop_per_frame_fov": round(flops_fov / 1e12, 2),
        "model_tflop_per_frame_nofov": round(flops_nofov / 1e12, 2),
        "estimate_s_per_frame": est_s,
        "implied_effective_tflops": round(eff_tf, 1),
        "per_gpu": rows,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=3)
    args = ap.parse_args()

    import multiprocessing
    ncpu = multiprocessing.cpu_count()

    split = measure_reference_split(args.frames)
    print(json.dumps({
        "measurement": "reference stereo_core 1080p CPU stage split "
                       "(unmodified /root/reference/helper/stereo_core.py)",
        "host_cpus": ncpu,
        "seconds_per_frame": {k: round(v, 3) for k, v in split.items()},
    }))

    sens = depth_estimate_sensitivity()
    print(json.dumps({"measurement": "depth 0.7s estimate sensitivity",
                      **sens}))

    # floor range: depth at the MFU band on a mid-range card (RTX 3060
    # class, the README's example tier) + SBS = host cv2 scaled by core
    # count (cv2 parallelizes bilateral/inpaint near-linearly) + the
    # GPU-offloadable remainder at an assumed 20x torch-GPU speedup.
    flops = sens["model_tflop_per_frame_fov"]
    results = {}
    for cores in (4, 8, 16):
        for mfu in ONNX_VIT_MFU_BAND:
            t_depth = flops / (51.0 * mfu)
            t_sbs = (split["host_resident_cv2"] / cores
                     + split["gpu_offloadable"] / 20.0)
            key = f"{cores}core_host_mfu{int(mfu * 100)}"
            results[key] = round(1.0 / (t_depth + t_sbs), 3)
    print(json.dumps({
        "measurement": "floor fps sensitivity (RTX-3060-class depth + "
                       "measured host cv2 scaled by cores + torch at 20x)",
        "floor_fps": results,
        "bench_floor_in_use": 0.95,
    }))


if __name__ == "__main__":
    main()
