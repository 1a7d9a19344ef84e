"""Headless sbs_tester grid sweep (BASELINE config #4 workload)."""

import json

import cv2
import numpy as np

from vsc_tpu.config import load_config, save_config


def test_grid_sweep(workflow, test_video, tmp_path):
    from vsc_tpu.pipeline.sbs_tester import run_grid

    config = load_config(workflow)
    config["stereo"].update({
        "max_disparity": 4.0, "convergence": 0.0, "super_sampling": 1.0,
        "edge_softness": 1.0, "artifact_smoothing": 0.0, "depth_gamma": 1.0,
        "sharpen": 0.0,
    })
    save_config(workflow, config)

    # two frame/depth pairs
    rng = np.random.default_rng(0)
    for n in (1, 2):
        rgb = rng.integers(0, 256, (36, 48, 3), np.uint8)
        cv2.imwrite(str(workflow / "frames" / f"frame_{n:06d}.png"), rgb)
        cv2.imwrite(str(workflow / "depth_maps" / f"depth_frame_{n:06d}.png"),
                    rng.integers(0, 256, (36, 48), np.uint8))

    out_dir = tmp_path / "grid"
    ok = run_grid(workflow, config, "max_disparity=3,5;depth_gamma=0.5",
                  frame_limit=2, out_dir=out_dir)
    assert ok
    report = json.loads((out_dir / "grid_report.json").read_text())
    assert len(report) == 2  # 2 disparities x 1 gamma
    for entry in report:
        assert entry["frames_per_s"] > 0
    previews = list(out_dir.glob("grid_*.png"))
    assert len(previews) == 2
    img = cv2.imread(str(previews[0]))
    assert img.shape == (36, 96, 3)  # H x 2W SBS preview


def test_grid_requires_depth(workflow, test_video):
    from vsc_tpu.pipeline.sbs_tester import run_grid
    config = load_config(workflow)
    assert not run_grid(workflow, config, "max_disparity=3", 2, None)


def test_monitor_detection_helpers():
    """3D-display helpers (reference sbs_tester.py:153-200, 697): xrandr
    geometry parsing, the height*2 fullscreen stretch, headless fallback."""
    import numpy as np
    from vsc_tpu.pipeline.sbs_tester import (
        detect_monitors, fullscreen_image, parse_xrandr_monitors)

    text = """Monitors: 2
 0: +*DP-1 2560/597x1440/336+0+0  DP-1
 1: +HDMI-1 1920/509x1080/286+2560+180  HDMI-1
"""
    mons = parse_xrandr_monitors(text)
    assert mons == [
        {"x": 0, "y": 0, "width": 2560, "height": 1440},
        {"x": 2560, "y": 180, "width": 1920, "height": 1080},
    ]

    # fullscreen stretch: width -> monitor width, height -> 2x monitor
    # height (3D monitors show each eye at half height)
    sbs = np.zeros((36, 96, 3), np.uint8)
    out = fullscreen_image(sbs, mons[1])
    assert out.shape == (2160, 1920, 3)

    # headless environment still yields a usable default
    mons = detect_monitors()
    assert len(mons) >= 1 and mons[0]["width"] > 0


def test_no_arg_opens_picker(monkeypatch, workflow):
    """Reference parity: no workflow argument -> folder dialog
    (reference sbs_tester.py:726-736); cancel exits with an error."""
    import vsc_tpu.pipeline.sbs_tester as st

    picked = {}

    def fake_picker():
        picked["called"] = True
        return None  # user cancelled

    monkeypatch.setattr(st, "pick_workflow_dir", fake_picker)
    assert st.main([]) == 1
    assert picked.get("called")

    # picking a real workflow proceeds to config load (headless: the
    # grid flag keeps it off the GUI path, requiring depth maps -> False)
    monkeypatch.setattr(st, "pick_workflow_dir", lambda: str(workflow))
    rc = st.main(["--grid", "max_disparity=4"])
    assert rc in (0, 1)  # reached the pipeline, not the usage error


def test_picker_headless_returns_none(monkeypatch):
    from vsc_tpu.pipeline.sbs_tester import pick_workflow_dir
    monkeypatch.delenv("DISPLAY", raising=False)
    assert pick_workflow_dir() is None


def test_slider_debounce_rearms():
    """on_change must postpone rendering ~100 ms past the LAST movement
    (reference sbs_tester.py:487-498 cancel+reschedule semantics)."""
    import inspect

    from vsc_tpu.pipeline.sbs_tester import run_interactive
    src = inspect.getsource(run_interactive)
    assert 'state["render_after"] = time.monotonic() + 0.1' in src
    assert 'time.monotonic() >= state["render_after"]' in src
