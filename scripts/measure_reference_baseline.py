#!/usr/bin/env python3
"""
Measure the REFERENCE implementation on this host
=================================================

Runs the actual reference stereo core (/root/reference/helper/stereo_core.py,
torch-CPU + cv2) on synthetic frames to produce a *measured* baseline
datapoint for BASELINE.md (round-1 verdict item #5: the comparison floor was
previously estimate-only).

The only reference dependency missing from this image is
kornia.filters.gaussian_blur2d; an exact equivalent (separable gaussian,
reflect padding — kornia's defaults) is injected so the reference module
runs unmodified. The reference code itself is imported from /root/reference,
never copied.

Usage: python scripts/measure_reference_baseline.py [--frames N]
Prints one JSON line per measured config.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import types


def _install_kornia_shim():
    import torch
    import torch.nn.functional as F

    def gaussian_blur2d(x, kernel_size, sigma, border_type="reflect"):
        ky, kx = kernel_size
        if isinstance(sigma, (tuple, list)):
            sy, sx = float(sigma[0]), float(sigma[1])
        else:
            sy = sx = float(sigma)

        def g1d(k, s):
            ax = torch.arange(k, dtype=x.dtype) - (k - 1) / 2.0
            w = torch.exp(-0.5 * (ax / s) ** 2)
            return w / w.sum()

        C = x.shape[1]
        wy = g1d(ky, sy).view(1, 1, ky, 1).expand(C, 1, ky, 1)
        wx = g1d(kx, sx).view(1, 1, 1, kx).expand(C, 1, 1, kx)
        x = F.pad(x, (kx // 2, kx // 2, ky // 2, ky // 2), mode=border_type)
        x = F.conv2d(x, wy, groups=C)
        return F.conv2d(x, wx, groups=C)

    kornia = types.ModuleType("kornia")
    filters = types.ModuleType("kornia.filters")
    filters.gaussian_blur2d = gaussian_blur2d
    kornia.filters = filters
    sys.modules["kornia"] = kornia
    sys.modules["kornia.filters"] = filters


def synth_frame(h, w, seed=0):
    """Deterministic 'realistic' content: smooth gradients + blocks +
    texture, and a correlated smooth depth map."""
    import numpy as np
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = (0.5 + 0.5 * np.sin(xx / 97.0) * np.cos(yy / 53.0))
    tex = rng.normal(0, 0.05, (h, w)).astype(np.float32)
    rgb = np.stack([base + tex,
                    0.7 * base + 0.1,
                    1.0 - base], axis=-1)
    rgb = np.clip(rgb * 255.0, 0, 255).astype(np.uint8)
    depth = np.clip((np.sin(xx / 211.0) * 0.5 + 0.5)
                    * (yy / h) * 255.0, 0, 255).astype(np.uint8)
    return rgb, depth


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=5)
    args = parser.parse_args()

    _install_kornia_shim()
    sys.path.insert(0, "/root/reference")
    from helper.stereo_core import StereoGenerator, StereoParams

    import multiprocessing
    ncpu = multiprocessing.cpu_count()

    for label, (h, w) in (("stereo_core 720p CPU (BASELINE.json config 1)",
                           (720, 1280)),
                          ("stereo_core 1080p CPU", (1080, 1920))):
        rgb, depth = synth_frame(h, w)
        gen = StereoGenerator(device="cpu")
        params = StereoParams()  # reference defaults incl. supersampling 3
        gen.process_frame(rgb, depth, params)  # warm-up
        t0 = time.perf_counter()
        for _ in range(args.frames):
            gen.process_frame(rgb, depth, params)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "config": label,
            "seconds_per_frame": round(dt / args.frames, 3),
            "fps": round(args.frames / dt, 4),
            "host_cpus": ncpu,
            "params": "reference defaults",
            "implementation": "/root/reference/helper/stereo_core.py "
                              "(unmodified, kornia gaussian shimmed)",
        }))


if __name__ == "__main__":
    main()
