"""
Test configuration.

JAX must be steered *before* its first import: tests run on a virtual
8-device CPU mesh (SURVEY.md section 4, item 4) so pjit shardings, prefetch
queues, and multi-chip scheduling are exercised without TPU hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402
from pathlib import Path  # noqa: E402


@pytest.fixture(scope="session")
def test_video(tmp_path_factory) -> Path:
    """A small synthetic H.264 test video with audio."""
    from vsc_tpu.io.media import make_test_video
    path = tmp_path_factory.mktemp("media") / "test.mkv"
    make_test_video(path, width=192, height=108, frames=36,
                    framerate="24/1", with_audio=True)
    return path


@pytest.fixture()
def workflow(tmp_path, test_video) -> Path:
    """An initialized workflow directory for the test video."""
    from vsc_tpu.config import create_default_config, save_config
    wf = tmp_path / "workflow"
    for sub in ("frames", "depth_maps", "sbs", "chunks"):
        (wf / sub).mkdir(parents=True, exist_ok=True)
    config = create_default_config(test_video)
    save_config(wf, config)
    return wf
