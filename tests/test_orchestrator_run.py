"""Full orchestrator run() smoke test: fake steps that really produce the
artifacts, driven through the real scheduler loop + live dashboard."""

import asyncio
import sys

import pytest
import yaml

from vsc_tpu.runtime import workflow_metrics as wm
from vsc_tpu.runtime.orchestrator import Orchestrator, OrchestratorConfig
from vsc_tpu.runtime.workflow_state import (
    StepStatus,
    get_step_status,
    load_workflows,
    normalize_path,
)
from test_orchestrator import make_workflow


class ScriptedOrchestrator(Orchestrator):
    """Each step's command is a python -S snippet that creates the artifacts
    the next gate checks (frames -> depth maps -> sbs -> chunk -> output)."""

    def _build_command(self, step, workflow_path, workflow):
        wf = workflow_path
        effects = {
            "frame_extractor": (
                f"import pathlib\n"
                f"d = pathlib.Path({wf!r}) / 'frames'\n"
                f"[(d / f'frame_{{i:06d}}.png').touch() for i in range(1, 7)]"),
            "depth_map_generator": (
                f"import pathlib\n"
                f"d = pathlib.Path({wf!r}) / 'depth_maps'\n"
                f"[(d / f'depth_frame_{{i:06d}}.png').touch() "
                f"for i in range(1, 7)]"),
            "sbs_generator": (
                f"import pathlib\n"
                f"d = pathlib.Path({wf!r}) / 'sbs'\n"
                f"[(d / f'sbs_{{i:06d}}.png').touch() for i in range(1, 7)]"),
            "chunk_generator": (
                f"import pathlib\n"
                f"p = pathlib.Path({wf!r}) / 'chunks' / 'sbs_000001_000006.mkv'\n"
                f"p.write_bytes(b'x')"),
            "video_concatenator": (
                f"import pathlib, json\n"
                f"cfg = json.loads((pathlib.Path({wf!r}) / 'config.json')"
                f".read_text())\n"
                f"pathlib.Path(cfg['output_video']).write_bytes(b'x')"),
        }
        code = effects[step] + "\nimport sys; sys.exit(0)"
        return [sys.executable, "-S", "-c", code]


def test_full_run_completes(tmp_path):
    wf = make_workflow(tmp_path)
    yaml_path = tmp_path / "workflows.yaml"
    yaml_path.write_text(yaml.safe_dump({str(wf): None}))
    wm.invalidate_cache()

    workflows = load_workflows(yaml_path)
    cfg = OrchestratorConfig(scheduler_interval=0.1)
    orch = ScriptedOrchestrator(yaml_path, workflows, cfg)

    async def run_with_timeout():
        await asyncio.wait_for(orch.run(), timeout=60)

    asyncio.run(run_with_timeout())

    key = normalize_path(str(wf))
    final = orch.workflows[key]
    for step in ("frame_extractor", "depth_map_generator", "sbs_generator"):
        assert get_step_status(final[step]) == StepStatus.DONE, step
    # the saved YAML collapsed to DONE (which itself requires the final
    # output video to exist, workflow_state._is_complete)
    saved = yaml.safe_load(yaml_path.read_text())
    assert saved[key] == "DONE"
    assert orch.all_finished()


def test_streaming_run_completes(tmp_path, test_video):
    """--streaming mode: one real stream_convert process per workflow (stub
    depth model, CPU) replaces extract/depth/SBS/chunk; the normal concat
    step finishes. Statuses collapse to DONE, output video exists, no PNG
    intermediates were produced."""
    import json
    from pathlib import Path

    from vsc_tpu.config import create_default_config, save_config

    wf = tmp_path / "wf1"
    for sub in ("frames", "depth_maps", "sbs", "chunks"):
        (wf / sub).mkdir(parents=True)
    config = create_default_config(test_video)
    config["stereo"].update({"max_disparity": 5.0, "super_sampling": 1.0,
                             "artifact_smoothing": 0.0, "sharpen": 0.0})
    config["encoding"] = {"crf": 30, "preset": "ultrafast"}
    save_config(wf, config)

    yaml_path = tmp_path / "workflows.yaml"
    yaml_path.write_text(yaml.safe_dump({str(wf): None}))
    wm.invalidate_cache()

    workflows = load_workflows(yaml_path)
    cfg = OrchestratorConfig(scheduler_interval=0.2, streaming=True)
    orch = Orchestrator(yaml_path, workflows, cfg)

    async def run_with_timeout():
        await asyncio.wait_for(orch.run(), timeout=300)

    asyncio.run(run_with_timeout())

    key = normalize_path(str(wf))
    final = orch.workflows[key]
    for step in ("frame_extractor", "depth_map_generator", "sbs_generator"):
        assert get_step_status(final[step]) == StepStatus.DONE, step
    out = Path(json.loads((wf / "config.json").read_text())["output_video"])
    assert out.exists()
    assert not list((wf / "frames").glob("*.png"))
    assert not list((wf / "sbs").glob("*.png"))
    assert list((wf / "chunks").glob("*.mkv"))
    saved = yaml.safe_load(yaml_path.read_text())
    assert saved[key] == "DONE"
    assert orch.all_finished()
