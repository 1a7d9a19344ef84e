"""Guard: the lowered 1080p SBS program must stay small.

The TPU remote-compile frontend rejects oversized payloads (HTTP 413), and
big embedded constants are invariably a design smell (dense resample
matrices once added ~120 MB). Lowering is cheap (trace only, no compile).
"""

import re

import numpy as np

from vsc_tpu.config import StereoParams
from vsc_tpu.ops.stereo import _generate_sbs_impl


def test_sbs_program_is_lean():
    rgb = np.zeros((2, 1080, 1920, 3), np.uint8)
    depth = np.zeros((2, 1080, 1920), np.uint8)
    lowered = _generate_sbs_impl.lower(rgb, depth, StereoParams(), 255.0)
    text = lowered.as_text()
    assert len(text) < 12_000_000, f"HLO text {len(text)/1e6:.1f} MB"
    # no single dense literal bigger than ~1 MB of digits
    for m in re.finditer(r"dense<[^>]{100,}", text):
        assert len(m.group(0)) < 1_000_000
