"""CLI surface tests: argument handling and error paths of the step mains
(no device work — exercises validation/early-exit branches)."""

from pathlib import Path

import pytest

from vsc_tpu.config import load_config, save_config


def test_workflow_init_main(tmp_path, test_video):
    from vsc_tpu.pipeline.workflow_init import main
    wf = tmp_path / "wf"
    assert main(["--input-video", str(test_video),
                 "--workflow-dir", str(wf)]) == 0
    config = load_config(wf)
    assert config["input_video"].endswith("test.mkv")
    for sub in ("frames", "depth_maps", "sbs", "chunks"):
        assert (wf / sub).is_dir()
    # re-init refused
    assert main(["--input-video", str(test_video),
                 "--workflow-dir", str(wf)]) == 1
    # missing input video
    assert main(["--input-video", str(tmp_path / "nope.mkv")]) == 1


@pytest.mark.parametrize("module", [
    "frame_extractor", "depth_map_generator", "sbs_generator",
    "chunk_generator", "video_concatenator", "stream_convert",
])
def test_mains_reject_missing_workflow(module, tmp_path):
    import importlib
    mod = importlib.import_module(f"vsc_tpu.pipeline.{module}")
    assert mod.main([str(tmp_path / "missing")]) == 1


@pytest.mark.parametrize("module", [
    "frame_extractor", "chunk_generator", "video_concatenator",
])
def test_mains_reject_invalid_config(module, tmp_path):
    import importlib
    (tmp_path / "config.json").write_text("{}")
    mod = importlib.import_module(f"vsc_tpu.pipeline.{module}")
    assert mod.main([str(tmp_path)]) == 1


def test_chunk_generator_bad_end_frame(workflow, test_video):
    import cv2
    import numpy as np
    from vsc_tpu.pipeline.chunk_generator import main
    config = load_config(workflow)
    sbs = workflow / "sbs"
    for i in range(1, 4):
        cv2.imwrite(str(sbs / f"sbs_{i:06d}.png"),
                    np.zeros((16, 32, 3), np.uint8))
    assert main([str(workflow), "--end-frame", "99"]) == 1  # above range
    assert main([str(workflow), "--end-frame", "0"]) == 1   # below range


def test_concat_requires_chunks(workflow):
    from vsc_tpu.pipeline.video_concatenator import main
    assert main([str(workflow)]) == 1  # empty chunks dir
