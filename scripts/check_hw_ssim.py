#!/usr/bin/env python3
"""Hardware SSIM-vs-oracle check for the SHIPPING SBS kernels (VERDICT r4
#1-#3): runs generate_sbs on the real TPU across parameter sets that cover
the planar-u8 path at both crop-offset orderings, the non-planar path, and
worst-case content, and compares each against the independent
reference-semantics oracle (tests/oracle.py; disk-cached, source-hashed).

Any configuration below would have caught the round-4 axon
concat-of-offset-slices miscompile (memory/axon-concat-slice-miscompile).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/check_hw_ssim.py
Env:   CHECK_SIZE=HxW (default 1080x1920), CHECK_SETS=csv of set names
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from vsc_tpu.utils.jax_setup import setup_jax
setup_jax()

import numpy as np  # noqa: E402

import bench  # noqa: E402
from vsc_tpu.config import StereoParams  # noqa: E402
from vsc_tpu.ops.stereo import generate_sbs  # noqa: E402

H, W = (int(v) for v in os.environ.get("CHECK_SIZE", "1080x1920").split("x"))
frame, depth = bench.bench_content(H, W)
rng = np.random.default_rng(7)
noise_depth = rng.integers(0, 256, (H, W), np.uint8)

SETS = {
    # the bench headline config: planar-u8 path, negative convergence
    "default": (StereoParams(), depth),
    # planar-u8 path with the crop-offset ordering FLIPPED (lo < ro)
    "conv+25_ss3": (StereoParams(convergence=25.0), depth),
    # non-planar path (no supersampling), positive convergence
    "conv+10_ss1": (StereoParams(convergence=10.0, super_sampling=1.0), depth),
    # worst-case content: every pixel a disocclusion
    "noise_depth": (StereoParams(), noise_depth),
}

names = os.environ.get("CHECK_SETS", ",".join(SETS)).split(",")
oracle = bench._oracle_module()
worst = 1.0
for name in names:
    p, d = SETS[name]
    ours = np.asarray(generate_sbs(frame[None], d[None], p))[0]
    ref = bench.oracle_sbs(frame, d, p)
    s = oracle.ssim(ours, ref)
    worst = min(worst, s)
    # localize: per-eye SSIM tells a crop bug (one broken eye) from a
    # kernel-wide quality drift
    sl = oracle.ssim(ours[:, :W], ref[:, :W])
    sr = oracle.ssim(ours[:, W:], ref[:, W:])
    print(f"{name:14s} ssim={s:.4f}  left={sl:.4f} right={sr:.4f}", flush=True)

print(f"GATE {'PASS' if worst >= 0.99 else 'FAIL'} (min {worst:.4f})")
sys.exit(0 if worst >= 0.99 else 1)
