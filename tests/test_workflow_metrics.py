"""Unit tests for filesystem-derived workflow metrics, especially the
chunk-boundary policy table (SURVEY.md section 4, item 1)."""

import pytest

from vsc_tpu.config import create_default_config, save_config
from vsc_tpu.runtime import workflow_metrics as wm


@pytest.fixture()
def wf(tmp_path):
    for sub in ("frames", "depth_maps", "sbs", "chunks"):
        (tmp_path / sub).mkdir()
    save_config(tmp_path, create_default_config(tmp_path / "in.mkv"))
    wm.invalidate_cache()
    return tmp_path


def _touch_sbs(wf_path, upto, start=1):
    for i in range(start, upto + 1):
        (wf_path / "sbs" / f"sbs_{i:06d}.png").touch()
    wm.invalidate_cache()


def test_counts_and_maxes(wf):
    assert wm.get_depth_count(wf) == 0
    (wf / "depth_maps" / "depth_frame_000003.png").touch()
    (wf / "depth_maps" / "depth_frame_000009.tif").touch()
    wm.invalidate_cache()
    assert wm.get_depth_count(wf) == 2
    assert wm.get_max_depth_number(wf) == 9
    _touch_sbs(wf, 5)
    assert wm.get_max_sbs_number(wf) == 5


def test_chunk_info_cleans_tmp(wf):
    (wf / "chunks" / "sbs_000001_001500.mkv").touch()
    (wf / "chunks" / "sbs_001500_002000.mkv.tmp").touch()
    wm.invalidate_cache()
    assert wm.get_last_chunk_end_frame(wf) == 1500
    assert not (wf / "chunks" / "sbs_001500_002000.mkv.tmp").exists()


# The next-chunk policy table (workflow_metrics.py:276-335 semantics)
@pytest.mark.parametrize(
    "max_sbs,last_end,sbs_complete,expected",
    [
        # not enough for a chunk, still running -> wait
        (1000, 0, False, None),
        # enough + more than a full chunk remains -> cut at CHUNK_SIZE
        (3100, 0, False, 1500),
        # enough but remainder <= CHUNK_SIZE -> extend to absorb tail
        (2900, 0, False, 2900),
        (1600, 0, False, 1600),
        # resume from a previous chunk end
        (4700, 1500, False, 3000),
        # done: flush whatever remains (>= 2 frames)
        (700, 0, True, 700),
        (1502, 1500, True, 1502),
        # done but only 1 frame remains -> nothing (encoder needs 2)
        (1501, 1500, True, None),
        # done with a huge tail: still chunk at CHUNK_SIZE
        (5000, 0, True, 1500),
    ])
def test_next_chunk_policy(wf, max_sbs, last_end, sbs_complete, expected):
    _touch_sbs(wf, max_sbs)
    assert wm.get_next_chunk_end_frame(wf, last_end, sbs_complete) == expected


def test_all_chunks_complete_fallback_chain(wf):
    assert not wm.is_all_chunks_complete(wf)
    (wf / "chunks" / "sbs_000001_000036.mkv").touch()
    wm.invalidate_cache()
    # no sbs/depth/total info -> not complete
    assert not wm.is_all_chunks_complete(wf)
    # sbs present and covered
    _touch_sbs(wf, 36)
    assert wm.is_all_chunks_complete(wf)
    # sbs deleted (free-space mode): falls back to depth maps
    for f in (wf / "sbs").glob("*.png"):
        f.unlink()
    (wf / "depth_maps" / "depth_frame_000036.png").touch()
    wm.invalidate_cache()
    assert wm.is_all_chunks_complete(wf)


def test_video_progress_string(wf):
    assert wm.get_video_progress(wf) == "-"
    (wf / "chunks" / "sbs_000001_000020.mkv").touch()
    wm.invalidate_cache()
    # no probe-able input video -> falls back to raw chunk count
    assert wm.get_video_progress(wf) == "20"
