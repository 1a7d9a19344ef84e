"""Orchestrator scheduling tests with faked step subprocesses
(SURVEY.md section 4, item 4: drive the state machine by faking exit codes,
including the accelerator-failure code 100)."""

import asyncio
import sys

import pytest
import yaml

from vsc_tpu.config import create_default_config, save_config
from vsc_tpu.runtime import workflow_metrics as wm
from vsc_tpu.runtime.orchestrator import (
    ACCEL_ERROR_EXIT_CODE,
    Orchestrator,
    OrchestratorConfig,
)
from vsc_tpu.runtime.workflow_state import (
    STEP_ORDER,
    StepStatus,
    get_step_status,
    load_workflows,
    normalize_path,
)


def make_workflow(tmp_path, name="wf1", with_video=True):
    wf = tmp_path / name
    for sub in ("frames", "depth_maps", "sbs", "chunks"):
        (wf / sub).mkdir(parents=True)
    video = tmp_path / f"{name}.mkv"
    if with_video:
        video.write_bytes(b"\x1a\x45\xdf\xa3 fake")
    config = create_default_config(video)
    save_config(wf, config)
    return wf


class FakeOrchestrator(Orchestrator):
    """Replaces step commands with scripted exit codes + side effects."""

    def __init__(self, *args, script=None, **kwargs):
        super().__init__(*args, **kwargs)
        self.script = script or {}
        self.launched: list[tuple[str, str]] = []

    def _build_command(self, step, workflow_path, workflow):
        self.launched.append((step, workflow_path))
        behavior = self.script.get(step, {"rc": 0})
        rc = behavior.get("rc", 0)
        effect = behavior.get("effect", "")
        code = f"{effect}\nimport sys; sys.exit({rc})"
        # -S skips site/sitecustomize (which imports jax) => instant startup
        return [sys.executable, "-S", "-c", code]


def run_until_idle(orch, ticks=30):
    """Drive scheduling + monitors without the Live UI."""

    async def _run():
        for _ in range(ticks):
            wm.invalidate_cache()
            if orch.repair_stale_state():
                orch.save_state()
            await orch.schedule_once()
            # give the (instant-exit) fake child time to finish + monitor to run
            for _ in range(40):
                if not orch.active:
                    break
                await asyncio.sleep(0.05)
            if orch.all_finished():
                break
        for _ in range(100):
            if not orch.active:
                break
            await asyncio.sleep(0.05)

    asyncio.run(_run())


@pytest.fixture()
def yaml_state(tmp_path):
    wf = make_workflow(tmp_path)
    yaml_path = tmp_path / "workflows.yaml"
    yaml_path.write_text(yaml.safe_dump({str(wf): None}))
    return yaml_path, wf


def _orch(yaml_path, script):
    workflows = load_workflows(yaml_path)
    cfg = OrchestratorConfig(scheduler_interval=0.05,
                             accel_cooldown_seconds=0.2)
    return FakeOrchestrator(yaml_path, workflows, cfg, script=script)


def test_two_strike_failure_escalation(yaml_state):
    yaml_path, wf = yaml_state
    orch = _orch(yaml_path, {"frame_extractor": {"rc": 1}})
    run_until_idle(orch)
    key = normalize_path(str(wf))
    st = get_step_status(orch.workflows[key]["frame_extractor"])
    # first failure -> FAILED, retried -> second failure -> ERROR
    assert st == StepStatus.ERROR
    # an ERROR persistent step terminates the workflow (nothing schedulable)
    assert orch.all_finished()
    # frame_extractor was launched exactly twice (strike one + retry)
    assert sum(1 for s, _ in orch.launched if s == "frame_extractor") == 2


def test_happy_path_frame_then_depth(yaml_state, monkeypatch):
    yaml_path, wf = yaml_state
    frames_dir = wf / "frames"
    script = {
        # frame extraction "produces" frames
        "frame_extractor": {
            "rc": 0,
            "effect": ("import pathlib\n"
                       f"d = pathlib.Path({str(frames_dir)!r})\n"
                       "[(d / f'frame_{i:06d}.png').touch() "
                       "for i in range(1, 4)]"),
        },
        "depth_map_generator": {"rc": 1},  # then depth fails once
    }
    orch = _orch(yaml_path, script)
    run_until_idle(orch, ticks=8)
    key = normalize_path(str(wf))
    assert get_step_status(orch.workflows[key]["frame_extractor"]) == StepStatus.DONE
    # depth was attempted only after frames were DONE
    order = [s for s, _ in orch.launched]
    assert order.index("frame_extractor") < order.index("depth_map_generator")


def test_accel_failure_sets_cooldown(yaml_state):
    yaml_path, wf = yaml_state
    # frames instantly done so depth can start; depth exits with code 100
    (wf / "frames" / "frame_000001.png").touch()
    orch = _orch(yaml_path, {
        "frame_extractor": {"rc": 0},
        "depth_map_generator": {"rc": ACCEL_ERROR_EXIT_CODE},
    })
    run_until_idle(orch, ticks=6)
    assert orch.accel_cooldown_until > 0


def test_sbs_waits_for_depth_watermark(yaml_state):
    yaml_path, wf = yaml_state
    key = normalize_path(str(wf))
    orch = _orch(yaml_path, {})
    workflow = orch.workflows[key]
    workflow["frame_extractor"] = StepStatus.DONE
    workflow["depth_map_generator"] = StepStatus.RUNNING
    import types
    orch.active[f"{key}:depth_map_generator"] = types.SimpleNamespace(
        step="depth_map_generator")  # fake live process

    # below the watermark: refuse
    assert not orch._can_start("sbs_generator", key, workflow)
    # at/above the watermark: allow
    for i in range(1, wm.MIN_DEPTH_FOR_SBS + 1):
        (wf / "depth_maps" / f"depth_frame_{i:06d}.png").touch()
    wm.invalidate_cache()
    assert orch._can_start("sbs_generator", key, workflow)
    # depth DONE waives the watermark entirely
    workflow["depth_map_generator"] = StepStatus.DONE
    for f in (wf / "depth_maps").glob("*.png"):
        f.unlink()
    (wf / "depth_maps" / "depth_frame_000001.png").touch()
    wm.invalidate_cache()
    assert orch._can_start("sbs_generator", key, workflow)


def test_stale_repair(yaml_state):
    yaml_path, wf = yaml_state
    key = normalize_path(str(wf))
    orch = _orch(yaml_path, {})
    workflow = orch.workflows[key]
    # depth maps exist but depth is PENDING -> promoted to RUNNING
    (wf / "depth_maps" / "depth_frame_000005.png").touch()
    # sbs caught up with depth while PENDING -> DONE
    (wf / "sbs" / "sbs_000005.png").touch()
    wm.invalidate_cache()
    assert orch.repair_stale_state()
    assert get_step_status(workflow["depth_map_generator"]) == StepStatus.RUNNING
    assert get_step_status(workflow["sbs_generator"]) == StepStatus.DONE


def test_validate_only_flags_bad_workflow(tmp_path):
    wf = make_workflow(tmp_path, with_video=False)  # missing input video
    yaml_path = tmp_path / "workflows.yaml"
    yaml_path.write_text(yaml.safe_dump({str(wf): None}))
    orch = _orch(yaml_path, {})
    assert not orch.validate_all()
    key = normalize_path(str(wf))
    assert get_step_status(orch.workflows[key]["frame_extractor"]) == StepStatus.ERROR


def test_stuck_workflow_reported_not_completed(tmp_path):
    """A workflow whose validation failed reads as 'finished' (nothing left
    to schedule) but must NOT be announced as completed (VERDICT r3 weak #6:
    the reference exits 'All workflows completed!' with nothing done)."""
    good = make_workflow(tmp_path, name="good")
    bad = make_workflow(tmp_path, name="bad", with_video=False)
    yaml_path = tmp_path / "workflows.yaml"
    yaml_path.write_text(yaml.safe_dump({str(good): "DONE", str(bad): None}))
    orch = _orch(yaml_path, {})
    assert not orch.validate_all()
    # the bad workflow is terminal (schedulable work exhausted) ...
    key = normalize_path(str(bad))
    assert orch.workflow_finished(key, orch.workflows[key])
    # ... but the final message says stuck, not completed
    assert orch.stuck_workflows() == [key]
    msg = orch.completion_message()
    assert "1 stuck (ERROR)" in msg and "bad" in msg
    assert "All workflows completed" not in msg
    # with no stuck workflows the classic message is preserved
    yaml_ok = tmp_path / "ok.yaml"
    yaml_ok.write_text(yaml.safe_dump({str(good): "DONE"}))
    orch_ok = _orch(yaml_ok, {})
    assert "All workflows completed!" in orch_ok.completion_message()


def test_chunk_command_carries_end_frame(yaml_state):
    yaml_path, wf = yaml_state
    key = normalize_path(str(wf))
    orch = _orch(yaml_path, {})
    workflow = orch.workflows[key]
    workflow["sbs_generator"] = StepStatus.DONE
    for i in range(1, 11):
        (wf / "sbs" / f"sbs_{i:06d}.png").touch()
    wm.invalidate_cache()
    # call the real builder (FakeOrchestrator overrides it)
    cmd = Orchestrator._build_command(orch, "chunk_generator", key, workflow)
    assert "--end-frame" in cmd
    assert cmd[cmd.index("--end-frame") + 1] == "10"
