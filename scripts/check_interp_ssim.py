#!/usr/bin/env python3
"""CPU/interpret-mode calibration companion to check_hw_ssim.py: the SAME
configurations through the SAME planar kernels in Pallas interpret mode.
The delta between this script's numbers and check_hw_ssim.py's isolates
hardware-specific error (miscompiles) from the algorithm's intrinsic
divergence vs the cv2/Telea oracle (which is content-dependent: worst-case
noise depth makes every pixel an inpainted disocclusion).

Usage: CHECK_SIZE=432x768 python scripts/check_interp_ssim.py
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
# route through the planar Pallas kernels (interpret mode) like the TPU does
os.environ["VSC_TPU_SBS"] = "planar"

import numpy as np  # noqa: E402

import bench  # noqa: E402
from vsc_tpu.config import StereoParams  # noqa: E402
from vsc_tpu.ops.stereo import generate_sbs  # noqa: E402

H, W = (int(v) for v in os.environ.get("CHECK_SIZE", "432x768").split("x"))
frame, depth = bench.bench_content(H, W)
rng = np.random.default_rng(7)
noise_depth = rng.integers(0, 256, (H, W), np.uint8)

SETS = {
    "default": (StereoParams(), depth),
    "conv+25_ss3": (StereoParams(convergence=25.0), depth),
    "conv+10_ss1": (StereoParams(convergence=10.0, super_sampling=1.0), depth),
    "noise_depth": (StereoParams(), noise_depth),
}

names = os.environ.get("CHECK_SETS", ",".join(SETS)).split(",")
oracle = bench._oracle_module()
for name in names:
    p, d = SETS[name]
    ours = np.asarray(generate_sbs(frame[None], d[None], p))[0]
    ref = bench.oracle_sbs(frame, d, p)
    s = oracle.ssim(ours, ref)
    sl = oracle.ssim(ours[:, :W], ref[:, :W])
    sr = oracle.ssim(ours[:, W:], ref[:, W:])
    print(f"{name:14s} ssim={s:.4f}  left={sl:.4f} right={sr:.4f}", flush=True)
