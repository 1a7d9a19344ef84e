"""Streaming fast-path test: video -> chunks -> final SBS video with no PNG
intermediates, plus chunk-granular resume."""

import pytest

from vsc_tpu.config import get_path, load_config, save_config
from vsc_tpu.io.probe import probe_video
from vsc_tpu.native import vscmedia_path

pytestmark = pytest.mark.skipif(vscmedia_path() is None,
                                reason="native media engine unavailable")

FAST_STEREO = {
    "max_disparity": 5.0, "convergence": 0.0, "super_sampling": 1.0,
    "edge_softness": 1.0, "artifact_smoothing": 0.0, "depth_gamma": 1.0,
    "sharpen": 0.0,
}


def test_stream_convert(workflow, test_video):
    from vsc_tpu.pipeline import stream_convert

    config = load_config(workflow)
    config["stereo"].update(FAST_STEREO)
    config["encoding"] = {"crf": 30, "preset": "ultrafast"}
    save_config(workflow, config)

    # two chunks of 16 then the remainder; stub depth at tiny input size
    assert stream_convert.run(workflow, config, batch_size=4, chunk_size=16,
                              model_name="stub", input_size=96, concat=True)

    # chunk_generator's 1-frame-overlap convention: each chunk after the
    # first starts at the previous chunk's end frame
    chunks_dir = get_path(workflow, config, "chunks")
    names = sorted(p.name for p in chunks_dir.glob("*.mkv"))
    assert names == ["sbs_000001_000016.mkv", "sbs_000016_000032.mkv",
                     "sbs_000032_000036.mkv"]

    # no PNG intermediates were produced
    assert not list(get_path(workflow, config, "frames").glob("*.png"))
    assert not list(get_path(workflow, config, "sbs").glob("*.png"))

    out = get_path(workflow, config, "output_video")
    info = probe_video(out)
    assert info["width"] == 384 and info["height"] == 108
    assert info["vcodec"] == "hevc" and info["has_audio"] is True
    assert info["duration"] == pytest.approx(36 / 24.0, abs=0.1)

    # resume: everything already chunked -> short-circuits, still succeeds
    assert stream_convert.run(workflow, config, batch_size=4, chunk_size=16,
                              model_name="stub", input_size=96, concat=False)

    # real resume: drop the last two chunks; the restart must re-decode the
    # boundary frame and reproduce the same overlapping chunk layout
    (chunks_dir / "sbs_000016_000032.mkv").unlink()
    (chunks_dir / "sbs_000032_000036.mkv").unlink()
    assert stream_convert.run(workflow, config, batch_size=4, chunk_size=16,
                              model_name="stub", input_size=96, concat=False)
    names = sorted(p.name for p in chunks_dir.glob("*.mkv"))
    assert names == ["sbs_000001_000016.mkv", "sbs_000016_000032.mkv",
                     "sbs_000032_000036.mkv"]


def test_stream_compute_is_sharded(workflow, test_video, monkeypatch):
    """VERDICT r1 item 10: the streaming compute loop runs with the batch
    sharded over the 8-device virtual mesh (depth via jit SPMD, SBS via its
    shard_map form) and still produces a correct, probe-clean output."""
    import jax
    from vsc_tpu.pipeline import stream_convert

    assert len(jax.devices()) == 8  # conftest virtual mesh

    captured = []
    from vsc_tpu.ops import stereo as stereo_mod
    real_generate = stereo_mod.generate_sbs

    def spying_generate(rgb, depth, params=None):
        captured.append(stereo_mod._data_mesh_of(rgb, depth))
        return real_generate(rgb, depth, params)

    # run() imports generate_sbs from the module at call time, after this
    monkeypatch.setattr(stereo_mod, "generate_sbs", spying_generate)
    config = load_config(workflow)
    config["stereo"].update(FAST_STEREO)
    config["encoding"] = {"crf": 30, "preset": "ultrafast"}
    save_config(workflow, config)
    assert stream_convert.run(workflow, config, batch_size=8, chunk_size=36,
                              model_name="stub", input_size=96, concat=False)
    # every dispatch saw inputs sharded over the full data mesh
    assert captured and all(m is not None and m.shape["data"] == 8
                            for m in captured)
    chunks = sorted(get_path(workflow, config, "chunks").glob("*.mkv"))
    assert [c.name for c in chunks] == ["sbs_000001_000036.mkv"]
    info = probe_video(chunks[0])
    assert info["width"] == 384 and info["nb_frames"] == 36


def test_hanging_dispatch_exits_100(workflow, test_video, monkeypatch):
    """VERDICT r2 #7: a wedged device that hangs inside a dispatch must
    surface the exit-100 accelerator-failure contract within the dispatch
    deadline, not at the 1500-frame chunk boundary."""
    import time

    from vsc_tpu.parallel.health import ACCEL_ERROR_EXIT_CODE
    from vsc_tpu.pipeline import depth_map_generator, stream_convert

    def hanging_build_depth_fn(*a, **k):
        def hang(rgb):
            time.sleep(3600)
        return hang

    monkeypatch.setattr(depth_map_generator, "build_depth_fn",
                        hanging_build_depth_fn)
    monkeypatch.setattr(stream_convert, "DISPATCH_TIMEOUT", 2.0)
    monkeypatch.setattr(stream_convert, "DISPATCH_COLD_TIMEOUT", 2.0)
    config = load_config(workflow)
    config["stereo"].update(FAST_STEREO)
    config["encoding"] = {"crf": 30, "preset": "ultrafast"}
    save_config(workflow, config)

    start = time.monotonic()
    with pytest.raises(stream_convert.AccelFailure):
        stream_convert.run(workflow, config, batch_size=4, chunk_size=16,
                           model_name="stub", input_size=96, concat=False)
    assert time.monotonic() - start < 60
    # and main() translates the failure into the orchestrator's exit code
    rc = stream_convert.main([str(workflow), "--cpu", "--model", "stub",
                              "--input-size", "96", "--no-concat"])
    assert rc == ACCEL_ERROR_EXIT_CODE


def test_mid_chunk_probe_cadence(workflow, test_video, monkeypatch):
    """The known-answer probe fires mid-chunk roughly every
    PROBE_EVERY_FRAMES frames, not only at chunk boundaries."""
    from vsc_tpu.pipeline import stream_convert

    calls = []
    monkeypatch.setattr(stream_convert, "PROBE_EVERY_FRAMES", 8)
    from vsc_tpu.parallel import health

    real = health.check_accelerator_health

    def counting(*a, **k):
        calls.append(1)
        return real(*a, **k)

    # run() imports the name at call time from parallel.health
    monkeypatch.setattr(health, "check_accelerator_health", counting)
    config = load_config(workflow)
    config["stereo"].update(FAST_STEREO)
    config["encoding"] = {"crf": 30, "preset": "ultrafast"}
    save_config(workflow, config)
    assert stream_convert.run(workflow, config, batch_size=4, chunk_size=36,
                              model_name="stub", input_size=96, concat=False)
    # 36 frames, one chunk: 1 chunk-start probe + mid-chunk probes every
    # ceil(8/4)=2 batches -> at least 4 probes total
    assert len(calls) >= 4
