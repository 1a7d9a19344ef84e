"""Image IO: depth write+verify (8/16-bit), RGB round-trips, pair loading."""

import numpy as np

from vsc_tpu.io.image import (
    load_image_pair,
    read_depth,
    read_rgb,
    write_depth_verified,
    write_rgb,
)


def test_rgb_roundtrip(tmp_path):
    rgb = np.random.default_rng(0).integers(0, 256, (20, 30, 3), np.uint8)
    path = tmp_path / "x.png"
    assert write_rgb(path, rgb)
    np.testing.assert_array_equal(read_rgb(path), rgb)


def test_depth_write_verify_8bit(tmp_path):
    depth = np.random.default_rng(1).random((16, 24)).astype(np.float32)
    out = tmp_path / "depth_frame_000001.png"
    assert write_depth_verified(depth, (48, 32), out)  # resized up + normalized
    d = read_depth(out)
    assert d.shape == (32, 48) and d.dtype == np.uint8
    assert d.min() == 0 and d.max() == 255


def test_depth_write_verify_16bit(tmp_path):
    depth = np.random.default_rng(2).random((16, 24)).astype(np.float32)
    out = tmp_path / "depth_frame_000001.tif"
    assert write_depth_verified(depth, (24, 16), out)
    d = read_depth(out)
    assert d.dtype == np.uint16
    assert d.max() == 65535 and d.min() == 0


def test_depth_flat_input_rejected(tmp_path):
    # zero-range depth cannot be normalized -> save refuses
    # (/root/reference/depth_map_generator.py:221-250 returns False)
    flat = np.full((8, 8), 3.0, np.float32)
    out = tmp_path / "depth_frame_000002.png"
    assert not write_depth_verified(flat, (8, 8), out)
    assert not out.exists()


def test_load_image_pair_resizes_mismatched_depth(tmp_path):
    import cv2
    rgb = np.random.default_rng(3).integers(0, 256, (32, 40, 3), np.uint8)
    depth = np.random.default_rng(4).integers(0, 256, (16, 20), np.uint8)
    cv2.imwrite(str(tmp_path / "f.png"), rgb)
    cv2.imwrite(str(tmp_path / "d.png"), depth)
    r, d = load_image_pair(tmp_path / "f.png", tmp_path / "d.png")
    assert r.shape == (32, 40, 3)
    assert d.shape == (32, 40)  # lanczos-resized to the rgb geometry
