"""Unit tests for the config manager (SURVEY.md section 4, item 1)."""

import json
from pathlib import Path

import pytest

from vsc_tpu.config import (
    ConfigError,
    StereoParams,
    create_default_config,
    find_valid_frames,
    get_frame_paths,
    get_path,
    load_config,
    merge_cli_args,
    save_config,
    update_stereo_params,
    validate_config,
)


@pytest.fixture()
def config():
    return create_default_config(Path("/videos/input.mkv"))


def test_default_config_matches_reference_shape(config):
    # Top-level keys and defaults must match the reference schema
    # (/root/reference/helper/config_manager.py:217-264).
    assert set(config) == {"input_video", "output_video", "directories",
                           "stereo", "depth", "encoding", "free_space"}
    assert config["output_video"].endswith("input_stereo.mkv")
    assert config["stereo"] == {
        "max_disparity": 50.0, "convergence": -10.0, "super_sampling": 3.0,
        "edge_softness": 20.0, "artifact_smoothing": 1.0, "depth_gamma": 0.2,
        "sharpen": 14.0,
    }
    assert config["encoding"] == {"crf": 19, "preset": "slow"}
    assert config["depth"] == {"save_16bit": False}
    assert config["free_space"] == {"sbs_generator": "frame", "chunk_generator": "sbs"}
    validate_config(config)


def test_validation_collects_all_errors(config):
    del config["input_video"]
    config["stereo"]["max_disparity"] = "fast"
    config["encoding"]["crf"] = 19.5
    with pytest.raises(ConfigError) as exc:
        validate_config(config)
    msg = str(exc.value)
    assert "input_video" in msg
    assert "stereo.max_disparity" in msg
    assert "encoding.crf" in msg


def test_int_accepted_for_float(config):
    config["stereo"]["max_disparity"] = 50  # int where float expected
    validate_config(config)


def test_bool_rejected_for_numeric(config):
    config["stereo"]["max_disparity"] = True
    with pytest.raises(ConfigError):
        validate_config(config)


def test_unknown_keys_rejected(config):
    # Documented-but-unimplemented reference behavior we implement
    # (SURVEY.md C12 note).
    config["extra"] = 1
    with pytest.raises(ConfigError, match="Unknown keys"):
        validate_config(config)
    del config["extra"]
    config["stereo"]["bogus"] = 2.0
    with pytest.raises(ConfigError, match="stereo.bogus"):
        validate_config(config)


def test_save_load_roundtrip(tmp_path, config):
    save_config(tmp_path, config)
    raw = (tmp_path / "config.json").read_text()
    assert "\t" in raw and raw.endswith("\n")  # tab-indented + trailing newline
    assert load_config(tmp_path) == config


def test_load_missing_and_invalid(tmp_path):
    with pytest.raises(ConfigError, match="not found"):
        load_config(tmp_path)
    (tmp_path / "config.json").write_text("{bad json")
    with pytest.raises(ConfigError, match="Invalid JSON"):
        load_config(tmp_path)


def test_update_stereo_params(tmp_path, config):
    save_config(tmp_path, config)
    update_stereo_params(tmp_path, {"max_disparity": 30.0})
    assert load_config(tmp_path)["stereo"]["max_disparity"] == 30.0
    with pytest.raises(ConfigError):
        update_stereo_params(tmp_path, {"max_disparity": "x"})


def test_get_path_resolution(tmp_path, config):
    # input absolute; output workflow-relative unless absolute; dirs relative
    assert get_path(tmp_path, config, "input_video") == Path("/videos/input.mkv")
    assert get_path(tmp_path, config, "frames") == tmp_path / "frames"
    config["output_video"] = "out.mkv"
    assert get_path(tmp_path, config, "output_video") == tmp_path / "out.mkv"
    config["output_video"] = "/abs/out.mkv"
    assert get_path(tmp_path, config, "output_video") == Path("/abs/out.mkv")
    with pytest.raises(KeyError):
        get_path(tmp_path, config, "nonexistent")


def test_merge_cli_args(config):
    merged = merge_cli_args(config, {"crf": 25, "max_disparity": 10.0,
                                     "save_16bit": True, "ignored": None})
    assert merged["encoding"]["crf"] == 25
    assert merged["stereo"]["max_disparity"] == 10.0
    assert merged["depth"]["save_16bit"] is True
    # original untouched
    assert config["encoding"]["crf"] == 19


def test_find_valid_frames_and_paths(tmp_path, config):
    frames = tmp_path / "frames"
    depth = tmp_path / "depth_maps"
    frames.mkdir()
    depth.mkdir()
    for n in (1, 2, 3, 5):
        (frames / f"frame_{n:06d}.png").touch()
    (depth / "depth_frame_000001.png").touch()
    (depth / "depth_frame_000002.tif").touch()
    (depth / "depth_frame_000002.png").touch()
    (depth / "depth_frame_000004.png").touch()

    assert find_valid_frames(tmp_path, config) == [1, 2]
    fp, dp = get_frame_paths(tmp_path, config, 2)
    assert dp.suffix == ".tif"  # tif preferred over png
    assert get_frame_paths(tmp_path, config, 5) is None
    assert get_frame_paths(tmp_path, config, 4) is None


def test_stereo_params_hashable_static():
    a = StereoParams()
    b = StereoParams()
    assert a == b and hash(a) == hash(b)
    assert StereoParams.from_config(
        create_default_config(Path("/v.mkv"))["stereo"]) == a
