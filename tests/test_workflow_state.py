"""Unit tests for the YAML workflow state machine (SURVEY.md section 4.1)."""

import yaml

from vsc_tpu.runtime.workflow_state import (
    PERSISTENT_STEPS,
    STEP_ORDER,
    StepStatus,
    get_step_status,
    load_workflows,
    normalize_path,
    save_workflows,
    set_step_status,
)


def write_yaml(path, data):
    path.write_text(yaml.safe_dump(data, sort_keys=False), encoding="utf-8")


def test_load_migrations(tmp_path):
    wf_yaml = tmp_path / "workflows.yaml"
    write_yaml(wf_yaml, {
        "/a/one": None,                               # bare path
        "/a/two": "DONE",                             # completed shorthand
        "/a/three": {"steps": {"frame_extractor": "DONE"}},  # legacy nesting
        "/a/four": {"frame_extractor": "FAILED",      # FAILED -> PENDING
                    "depth_map_generator": "RUNNING",  # RUNNING preserved
                    "retry_count": 3},                 # legacy field dropped
    })
    wfs = load_workflows(wf_yaml)
    one = wfs[normalize_path("/a/one")]
    assert all(get_step_status(one[s]) == StepStatus.PENDING
               for s in PERSISTENT_STEPS)
    two = wfs[normalize_path("/a/two")]
    assert all(get_step_status(two[s]) == StepStatus.DONE for s in STEP_ORDER)
    three = wfs[normalize_path("/a/three")]
    assert get_step_status(three["frame_extractor"]) == StepStatus.DONE
    four = wfs[normalize_path("/a/four")]
    assert get_step_status(four["frame_extractor"]) == StepStatus.PENDING
    assert get_step_status(four["depth_map_generator"]) == StepStatus.RUNNING
    assert "retry_count" not in four


def test_load_missing_and_empty(tmp_path):
    assert load_workflows(tmp_path / "nope.yaml") == {}
    (tmp_path / "empty.yaml").write_text("")
    assert load_workflows(tmp_path / "empty.yaml") == {}


def test_save_merges_manual_edits(tmp_path):
    wf_yaml = tmp_path / "workflows.yaml"
    p1, p2 = normalize_path("/a/one"), normalize_path("/a/two")
    state = {p1: {s: StepStatus.PENDING for s in STEP_ORDER}}
    set_step_status(state[p1], "frame_extractor", StepStatus.RUNNING)
    save_workflows(wf_yaml, state)

    # user manually adds a workflow while the orchestrator runs
    on_disk = yaml.safe_load(wf_yaml.read_text())
    on_disk[p2] = None
    write_yaml(wf_yaml, on_disk)

    merged = save_workflows(wf_yaml, state)
    assert p2 in merged  # manual addition survived
    # orchestrator status won for the step it manages
    assert get_step_status(merged[p1]["frame_extractor"]) == StepStatus.RUNNING

    final = yaml.safe_load(wf_yaml.read_text())
    # only persistent steps are stored
    assert set(final[p1].keys()) == set(PERSISTENT_STEPS)


def test_transient_steps_never_persist(tmp_path):
    wf_yaml = tmp_path / "workflows.yaml"
    p1 = normalize_path("/a/one")
    state = {p1: {s: StepStatus.PENDING for s in STEP_ORDER}}
    set_step_status(state[p1], "chunk_generator", StepStatus.RUNNING)
    save_workflows(wf_yaml, state)
    final = yaml.safe_load(wf_yaml.read_text())
    assert "chunk_generator" not in final[p1]
    assert "video_concatenator" not in final[p1]


def test_completed_workflow_collapses_to_done(tmp_path):
    # a workflow whose config is missing counts as complete/cleaned-up
    wf_yaml = tmp_path / "workflows.yaml"
    p1 = normalize_path(str(tmp_path / "gone"))
    state = {p1: {s: StepStatus.DONE for s in STEP_ORDER}}
    save_workflows(wf_yaml, state)
    final = yaml.safe_load(wf_yaml.read_text())
    assert final[p1] == "DONE"
    # and it round-trips through the DONE shorthand
    wfs = load_workflows(wf_yaml)
    assert all(get_step_status(wfs[p1][s]) == StepStatus.DONE
               for s in STEP_ORDER)


def test_unreadable_config_does_not_collapse_to_done(tmp_path):
    # VERDICT r2 #3: a transient error reading config.json during save must
    # NOT collapse an unfinished workflow to DONE — only an affirmatively
    # missing config (cleaned away) may.
    wf_yaml = tmp_path / "workflows.yaml"
    wf_dir = tmp_path / "wf"
    wf_dir.mkdir()
    # corrupt config: present but unparseable (covers EACCES-class failures
    # too — any non-FileNotFound error takes the same preserve path)
    (wf_dir / "config.json").write_text("{not json", encoding="utf-8")
    p1 = normalize_path(str(wf_dir))
    state = {p1: {s: StepStatus.DONE for s in STEP_ORDER}}
    save_workflows(wf_yaml, state)
    final = yaml.safe_load(wf_yaml.read_text())
    assert final[p1] != "DONE"
    assert all(final[p1][s] == StepStatus.DONE for s in PERSISTENT_STEPS)
    # once the config really is gone, the collapse happens
    (wf_dir / "config.json").unlink()
    save_workflows(wf_yaml, state)
    assert yaml.safe_load(wf_yaml.read_text())[p1] == "DONE"


def test_config_as_directory_does_not_collapse(tmp_path):
    # IsADirectoryError on read is another "present but unreadable" case
    wf_yaml = tmp_path / "workflows.yaml"
    wf_dir = tmp_path / "wf2"
    (wf_dir / "config.json").mkdir(parents=True)
    p1 = normalize_path(str(wf_dir))
    state = {p1: {s: StepStatus.DONE for s in STEP_ORDER}}
    save_workflows(wf_yaml, state)
    assert yaml.safe_load(wf_yaml.read_text())[p1] != "DONE"
