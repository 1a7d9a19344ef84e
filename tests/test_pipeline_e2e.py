"""End-to-end pipeline test (SURVEY.md section 4, item 3): synthetic video
through init -> extract -> depth (stub model) -> sbs -> chunk -> concat,
exercising resume semantics along the way."""

import numpy as np
import pytest

from vsc_tpu.config import StereoParams, get_path, load_config, save_config
from vsc_tpu.io.probe import probe_video
from vsc_tpu.native import vscmedia_path

pytestmark = pytest.mark.skipif(vscmedia_path() is None,
                                reason="native media engine unavailable")

# cheap params so CPU jit stays fast: no supersampling, small disparity
FAST_STEREO = {
    "max_disparity": 6.0, "convergence": -2.0, "super_sampling": 1.0,
    "edge_softness": 1.0, "artifact_smoothing": 0.0, "depth_gamma": 0.5,
    "sharpen": 2.0,
}


def test_full_pipeline(workflow, test_video):
    from vsc_tpu.pipeline import (chunk_generator, depth_map_generator,
                                  frame_extractor, sbs_generator,
                                  video_concatenator)

    config = load_config(workflow)
    config["stereo"].update(FAST_STEREO)
    config["free_space"] = {"sbs_generator": "none", "chunk_generator": "none"}
    save_config(workflow, config)

    # 1. extract
    assert frame_extractor.run(workflow, config)
    frames_dir = get_path(workflow, config, "frames")
    n_frames = len(list(frames_dir.glob("frame_*.png")))
    assert n_frames == 36

    # 2. depth (stub model, batched)
    assert depth_map_generator.run(workflow, config, batch_size=8,
                                   interactive=False, model_name="stub",
                                   input_size=96)
    depth_dir = get_path(workflow, config, "depth_maps")
    depths = sorted(depth_dir.glob("depth_frame_*.png"))
    assert len(depths) == 36
    import cv2
    d0 = cv2.imread(str(depths[0]), cv2.IMREAD_UNCHANGED)
    assert d0.shape == (108, 192) and d0.dtype == np.uint8
    assert d0.min() == 0 and d0.max() == 255  # min-max normalized

    # resume: re-run skips everything
    assert depth_map_generator.run(workflow, config, interactive=False,
                                   model_name="stub", input_size=96)

    # 3. SBS (batched TPU pipeline)
    rc = sbs_generator.run(workflow, config, batch_size=6, interactive=False)
    assert rc == 0
    sbs_dir = get_path(workflow, config, "sbs")
    sbs_files = sorted(sbs_dir.glob("sbs_*.png"))
    assert len(sbs_files) == 36
    s0 = cv2.imread(str(sbs_files[0]), cv2.IMREAD_COLOR)
    assert s0.shape == (108, 384, 3)  # H x 2W

    # left and right halves are distinct but correlated
    left, right = s0[:, :192], s0[:, 192:]
    assert not np.array_equal(left, right)
    assert abs(left.astype(int).mean() - right.astype(int).mean()) < 20

    # 4. chunks: first 20 frames, then the rest (tests overlap-resume)
    assert chunk_generator.run(workflow, config, end_frame=20)
    chunks_dir = get_path(workflow, config, "chunks")
    assert (chunks_dir / "sbs_000001_000020.mkv").exists()
    assert chunk_generator.run(workflow, config)
    assert (chunks_dir / "sbs_000020_000036.mkv").exists()

    # 5. concat + audio mux
    assert video_concatenator.run(workflow, config)
    output = get_path(workflow, config, "output_video")
    assert output.exists()
    info = probe_video(output)
    assert info["has_audio"] is True
    assert info["width"] == 384 and info["height"] == 108
    assert info["duration"] == pytest.approx(36 / 24.0, abs=0.1)
    assert info["vcodec"] == "hevc" and info["pix_fmt"] == "yuv420p10le"

    # re-running concat is idempotent (overwrites atomically)
    assert video_concatenator.run(workflow, config)


def test_sbs_resume_skips_existing(workflow, test_video):
    import cv2
    import numpy as np
    from vsc_tpu.pipeline import depth_map_generator, frame_extractor, \
        sbs_generator

    config = load_config(workflow)
    config["stereo"].update(FAST_STEREO)
    config["depth"]["save_16bit"] = True  # exercise the TIFF path
    save_config(workflow, config)
    assert frame_extractor.run(workflow, config)
    assert depth_map_generator.run(workflow, config, batch_size=8,
                                   interactive=False, model_name="stub",
                                   input_size=96)
    tifs = sorted(get_path(workflow, config, "depth_maps").glob("*.tif"))
    assert len(tifs) == 36
    d0 = cv2.imread(str(tifs[0]), cv2.IMREAD_UNCHANGED)
    assert d0.dtype == np.uint16 and d0.max() == 65535
    rc = sbs_generator.run(workflow, config, batch_size=8, interactive=False)
    assert rc == 0
    # free_space 'frame' mode deleted consumed frames
    frames_left = list(get_path(workflow, config, "frames").glob("frame_*.png"))
    assert frames_left == []
    # second run: nothing to do (outputs exist), exits cleanly
    rc = sbs_generator.run(workflow, config, interactive=False)
    assert rc == 0
