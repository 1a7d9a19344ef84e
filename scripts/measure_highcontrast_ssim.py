#!/usr/bin/env python3
"""Measure full-pipeline SSIM vs the oracle on high-contrast DECODED video
frames — the regime VERDICT r2 flagged as unmeasured (between realistic
smooth content at 0.9968 and pure-noise worst case at ~0.98).

Content: checkerboards, saturated color blocks, thin strokes (text-like),
encoded+decoded through the real hevc path (yuv420 chroma subsampling =
authentic decode artifacts), paired with step-edge depth (hard
disocclusion bands — the fill-ambiguity worst case).
"""
from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))

from vsc_tpu.utils.jax_setup import force_cpu

force_cpu()


def make_highcontrast_frames(h=144, w=192, n=4):
    """Deterministic high-contrast content, one frame per pattern family."""
    rng = np.random.default_rng(7)
    frames = []
    # 1. checkerboard, 8px cells, saturated palette
    yy, xx = np.mgrid[0:h, 0:w]
    cb = ((yy // 8 + xx // 8) % 2).astype(np.uint8)
    f = np.zeros((h, w, 3), np.uint8)
    f[cb == 0] = (255, 32, 16)
    f[cb == 1] = (8, 24, 255)
    frames.append(f)
    # 2. random saturated rectangles on black
    f = np.zeros((h, w, 3), np.uint8)
    for _ in range(40):
        y0, x0 = rng.integers(0, h - 8), rng.integers(0, w - 8)
        dy, dx = rng.integers(4, 32, 2)
        f[y0:y0 + dy, x0:x0 + dx] = rng.integers(0, 2, 3) * 255
    frames.append(f)
    # 3. thin strokes (text-like) white-on-black + black-on-white halves
    f = np.full((h, w, 3), 255, np.uint8)
    f[:, : w // 2] = 0
    for _ in range(120):
        y0, x0 = rng.integers(2, h - 2), rng.integers(2, w - 6)
        ln = rng.integers(3, 12)
        horiz = rng.integers(0, 2)
        if horiz:
            f[y0, x0:x0 + ln] = 255 - f[y0, x0]
        else:
            f[y0:y0 + min(ln, h - y0), x0] = 255 - f[y0, x0]
    frames.append(f)
    # 4. fine vertical bars (worst for horizontal-shift warping)
    f = np.zeros((h, w, 3), np.uint8)
    f[:, (xx[0] // 3) % 2 == 0] = 255
    frames.append(f)
    return frames[:n]


def step_depth(h, w, seed):
    """Step-edge depth: large discontinuities -> wide disocclusion bands."""
    rng = np.random.default_rng(seed)
    d = np.full((h, w), 40, np.float32)
    for _ in range(6):
        y0, x0 = rng.integers(0, h - 10), rng.integers(0, w - 10)
        dy, dx = rng.integers(10, 60, 2)
        d[y0:y0 + dy, x0:x0 + dx] = rng.integers(120, 256)
    return d.astype(np.uint8)


def roundtrip_codec(frames, tmp: Path):
    from vsc_tpu.io.media import RawFrameSink, decode_frames
    h, w = frames[0].shape[:2]
    out = tmp / "hc.mkv"
    with RawFrameSink(out, w, h, "24", crf=19, preset="fast") as sink:
        for f in frames:
            sink.write(f.tobytes())
    decoded = [np.frombuffer(raw, np.uint8).reshape(h, w, 3)
               for raw in decode_frames(out, w, h)]
    return decoded[:len(frames)]


def main():
    import tempfile

    import oracle
    from vsc_tpu.config import StereoParams
    from vsc_tpu.ops.stereo import generate_sbs

    frames = make_highcontrast_frames()
    with tempfile.TemporaryDirectory() as td:
        decoded = roundtrip_codec(frames, Path(td))

    param_sets = [
        ("defaults-scaled", StereoParams(
            max_disparity=12.0, convergence=-3.0, super_sampling=2.0,
            edge_softness=5.0, artifact_smoothing=1.0, depth_gamma=0.2,
            sharpen=8.0)),
        ("worstcase-sharpen", StereoParams(
            max_disparity=10.0, convergence=0.0, super_sampling=1.0,
            edge_softness=2.0, artifact_smoothing=1.0, depth_gamma=0.5,
            sharpen=4.0)),
    ]
    worst = 1.0
    for pname, params in param_sets:
        for i, rgb in enumerate(decoded):
            depth = step_depth(*rgb.shape[:2], seed=i)
            ours = np.asarray(generate_sbs(rgb[None], depth[None], params))[0]
            ref = oracle.process_frame(rgb, depth, params)
            s = oracle.ssim(ours, ref)
            worst = min(worst, s)
            print(f"{pname} frame{i}: SSIM {s:.4f}")
    print(f"WORST: {worst:.4f}")


if __name__ == "__main__":
    main()
