"""Media engine tests: probe, extract, encode, concat, raw streaming."""

import numpy as np
import pytest

from vsc_tpu.io.media import (
    RawFrameSink,
    concat_chunks,
    decode_frames,
    encode_chunk,
    extract_frames,
    make_test_video,
)
from vsc_tpu.io.probe import (
    estimate_frame_count,
    get_video_duration,
    get_video_framerate,
    parse_framerate,
    probe_video,
)
from vsc_tpu.native import vscmedia_path


def test_parse_framerate():
    assert parse_framerate("24000/1001") == pytest.approx(23.976, abs=1e-3)
    assert parse_framerate("30/1") == 30.0
    assert parse_framerate("29.97") == 29.97
    assert parse_framerate("x") is None
    assert parse_framerate("1/0") is None


def test_probe(test_video):
    info = probe_video(test_video)
    assert info is not None
    assert info["width"] == 192 and info["height"] == 108
    assert parse_framerate(info["r_frame_rate"]) == pytest.approx(24.0)
    assert get_video_framerate(test_video) == info["r_frame_rate"]
    assert get_video_duration(test_video) == pytest.approx(36 / 24.0, abs=0.15)
    assert abs(estimate_frame_count(test_video) - 36) <= 1


def test_extract_and_decode(test_video, tmp_path):
    frames_dir = tmp_path / "frames"
    progress = []
    n = extract_frames(test_video, frames_dir, progress_cb=progress.append)
    assert n == 36
    assert (frames_dir / "frame_000001.png").exists()
    assert (frames_dir / "frame_000036.png").exists()
    assert progress and progress[-1] == 36

    # streaming decode matches the extracted PNGs
    import cv2
    raw = list(decode_frames(test_video, 192, 108, start=5, count=2))
    assert len(raw) == 2
    f6 = np.frombuffer(raw[0], np.uint8).reshape(108, 192, 3)
    png6 = cv2.cvtColor(cv2.imread(str(frames_dir / "frame_000006.png")),
                        cv2.COLOR_BGR2RGB)
    assert np.array_equal(f6, png6)


@pytest.mark.skipif(vscmedia_path() is None, reason="native tool unavailable")
def test_encode_concat_audio_roundtrip(test_video, tmp_path):
    import cv2
    frames_dir = tmp_path / "sbs"
    frames_dir.mkdir()
    # synthesize an "SBS" PNG sequence (double-width gradient)
    h, w = 64, 256
    for i in range(1, 31):
        img = np.zeros((h, w, 3), np.uint8)
        img[:, :, 0] = (np.arange(w) + i * 4) % 256
        img[:, :, 1] = i * 8 % 256
        cv2.imwrite(str(frames_dir / f"sbs_{i:06d}.png"), img)

    chunks_dir = tmp_path / "chunks"
    chunks_dir.mkdir()
    c1 = chunks_dir / "sbs_000001_000016.mkv"
    c2 = chunks_dir / "sbs_000016_000030.mkv"
    # overlapping chunks: second starts at the first's end frame (inclusive
    # resume, /root/reference/chunk_generator.py:111-137)
    encode_chunk(frames_dir, 1, 16, "24/1", crf=28, preset="ultrafast", output=c1)
    encode_chunk(frames_dir, 16, 15, "24/1", crf=28, preset="ultrafast", output=c2)
    assert c1.exists() and c2.exists()
    assert not (chunks_dir / "sbs_000001_000016.mkv.tmp").exists()

    info = probe_video(c1)
    assert info["vcodec"] == "hevc"
    assert info["pix_fmt"] == "yuv420p10le"
    assert info["width"] == w

    out = tmp_path / "final.mkv"
    concat_chunks([c1, c2], out, is_overlapping=True, framerate_str="24/1",
                  audio_source=test_video)
    final = probe_video(out)
    assert final["has_audio"] is True
    # container duration is the audio stream's (copied in full, like the
    # reference's `-c:a copy` without -shortest): 36 frames / 24 fps = 1.5 s
    assert final["duration"] == pytest.approx(36 / 24.0, abs=0.1)

    cap = cv2.VideoCapture(str(out))
    decoded = 0
    while cap.read()[0]:
        decoded += 1
    cap.release()
    assert decoded == 31


@pytest.mark.skipif(vscmedia_path() is None, reason="native tool unavailable")
def test_raw_frame_sink(tmp_path):
    h, w = 64, 128
    out = tmp_path / "raw.mkv"
    with RawFrameSink(out, w, h, "30/1", crf=30, preset="ultrafast") as sink:
        for i in range(10):
            frame = np.full((h, w, 3), i * 20, np.uint8)
            sink.write(frame.tobytes())
    info = probe_video(out)
    assert info["vcodec"] == "hevc"
    assert abs(info["nb_frames"] - 10) <= 1  # nb_frames is duration-estimated


def test_make_test_video(tmp_path):
    out = tmp_path / "t.mkv"
    make_test_video(out, width=96, height=64, frames=12, framerate="12/1")
    info = probe_video(out)
    assert info["width"] == 96 and abs(info["nb_frames"] - 12) <= 1
