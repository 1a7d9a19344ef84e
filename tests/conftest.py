"""
Test configuration.

Tests run on a virtual 8-device CPU mesh (SURVEY.md section 4, item 4) so
pjit shardings and multi-chip scheduling are exercised without TPU hardware.

This environment pre-imports jax via sitecustomize with a TPU platform
already registered, so setting JAX_PLATFORMS in os.environ is too late;
instead we switch the platform through jax.config BEFORE any backend is
initialized (backend init is lazy until the first jax.devices()/dispatch).
"""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# Child processes spawned by tests (orchestrator steps, stream_convert)
# inherit a sitecustomize that pins the real TPU regardless of env
# JAX_PLATFORMS; this flag makes their setup_jax() switch to CPU via
# jax.config before the first dispatch, keeping the suite hermetic.
os.environ["VSC_TPU_FORCE_CPU"] = "1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402
from pathlib import Path  # noqa: E402


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu", \
        "tests must not run on the real TPU"
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"


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
