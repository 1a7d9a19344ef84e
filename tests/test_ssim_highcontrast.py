"""Full-pipeline SSIM gate on high-contrast DECODED video frames.

VERDICT r2 weak #4: the noise-content tests gate at 0.978-0.98 (Telea
fill-ambiguity residual, documented in test_stereo_ops.py) and realistic
smooth content holds 0.99 — but nothing measured where real high-contrast
content lands between the regimes. This test measures it: checkerboards,
saturated blocks, thin strokes and fine bars, round-tripped through the
real hevc encode/decode path (authentic yuv420 chroma artifacts), paired
with step-edge depth (hard disocclusion bands). Measured SSIMs are
0.9917-0.9993 (scripts/measure_highcontrast_ssim.py) — the pure-noise gap
does NOT manifest on decodable video content; gate held at the 0.99
acceptance line (reference semantics: helper/stereo_core.py:436-457)."""

from pathlib import Path

import numpy as np
import pytest

from vsc_tpu.config import StereoParams
from vsc_tpu.ops.stereo import generate_sbs

import oracle

import sys

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

from measure_highcontrast_ssim import (  # noqa: E402
    make_highcontrast_frames,
    roundtrip_codec,
    step_depth,
)


@pytest.fixture(scope="module")
def decoded_frames(tmp_path_factory):
    frames = make_highcontrast_frames()
    return roundtrip_codec(frames, tmp_path_factory.mktemp("hc"))


@pytest.mark.parametrize("params", [
    # reference defaults scaled to the small frame
    StereoParams(max_disparity=12.0, convergence=-3.0, super_sampling=2.0,
                 edge_softness=5.0, artifact_smoothing=1.0, depth_gamma=0.2,
                 sharpen=8.0),
    # the noise-test worst-case parameter set (sharpen amplifies fill
    # residual): on decodable content it still clears 0.99
    StereoParams(max_disparity=10.0, convergence=0.0, super_sampling=1.0,
                 edge_softness=2.0, artifact_smoothing=1.0, depth_gamma=0.5,
                 sharpen=4.0),
])
def test_highcontrast_decoded_ssim(decoded_frames, params):
    worst = 1.0
    for i, rgb in enumerate(decoded_frames):
        depth = step_depth(*rgb.shape[:2], seed=i)
        ours = np.asarray(generate_sbs(rgb[None], depth[None], params))[0]
        ref = oracle.process_frame(rgb, depth, params)
        worst = min(worst, oracle.ssim(ours, ref))
    assert worst >= 0.99, f"high-contrast SSIM {worst:.4f} < 0.99"
