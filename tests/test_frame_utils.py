"""Unit tests for frame number parsing and canonical file naming."""

from vsc_tpu.utils import (
    chunk_name,
    depth_name,
    extract_frame_number,
    frame_name,
    sbs_name,
)


def test_extract_frame_number():
    # Semantics of /root/reference/helper/frame_utils.py:19-38.
    assert extract_frame_number("frame_000123.png") == 123
    assert extract_frame_number("/a/b/depth_frame_000042.tif") == 42
    assert extract_frame_number("sbs_000001.png") == 1
    assert extract_frame_number("noframe.png") == -1
    assert extract_frame_number("frame_.png") == -1
    # last _<digits>. group wins
    assert extract_frame_number("a_1_b_2.png") == 2


def test_canonical_names():
    assert frame_name(7) == "frame_000007.png"
    assert depth_name(7) == "depth_frame_000007.png"
    assert depth_name(7, use_16bit=True) == "depth_frame_000007.tif"
    assert sbs_name(7) == "sbs_000007.png"
    assert chunk_name(1, 1500) == "sbs_000001_001500.mkv"
    assert extract_frame_number(frame_name(123456)) == 123456
