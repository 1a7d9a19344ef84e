"""Full-pipeline SSIM gate on realistic (smooth, structured) content.

BASELINE.md's acceptance metric is SSIM >= 0.99 vs the reference's SBS
output on real video frames. The noise-texture tests in test_stereo_ops.py
are worst-case for inpainting; this test uses the synthetic test video's
smooth structured frames — representative of natural content — and holds
the full-frame gate at 0.99 with the reference's *default* parameter set
(disparity 50 scaled to the small frame, supersampling, bilateral,
sharpening all enabled).
"""

import numpy as np
import pytest

from vsc_tpu.config import StereoParams
from vsc_tpu.ops.stereo import generate_sbs

import oracle


def _frame_and_depth(test_video, idx=10):
    import cv2
    from vsc_tpu.io.media import decode_frames
    from vsc_tpu.io.probe import probe_video
    info = probe_video(test_video)
    w, h = info["width"], info["height"]
    raw = next(iter(decode_frames(test_video, w, h, start=idx, count=1)))
    rgb = np.frombuffer(raw, np.uint8).reshape(h, w, 3)
    # plausible smooth depth: blurred luminance (what the stub model yields)
    lum = cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY).astype(np.float32)
    lum = cv2.GaussianBlur(lum, (0, 0), 3.0)
    lum -= lum.min()
    lum /= max(lum.max(), 1e-6)
    return rgb, (lum * 255).astype(np.uint8)


@pytest.mark.parametrize("params", [
    # reference defaults, disparity/softness scaled to the 192px frame
    StereoParams(max_disparity=12.0, convergence=-3.0, super_sampling=2.0,
                 edge_softness=5.0, artifact_smoothing=1.0, depth_gamma=0.2,
                 sharpen=8.0),
])
def test_realistic_content_ssim(test_video, params):
    rgb, depth = _frame_and_depth(test_video)
    ours = np.asarray(generate_sbs(rgb[None], depth[None], params))[0]
    ref = oracle.process_frame(rgb, depth, params)
    s = oracle.ssim(ours, ref)
    assert s >= 0.99, f"SSIM {s:.4f} < 0.99 on realistic content"
