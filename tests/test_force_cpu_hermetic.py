"""VSC_TPU_FORCE_CPU must take effect BEFORE the first backend touch in
CHILD processes of the accelerator CLIs.

Regression test: depth_map_generator.run() printed its `jax.devices()`
banner before setup_jax() had applied the force-cpu escape hatch, so a
child with VSC_TPU_FORCE_CPU=1 initialized the environment-pinned
accelerator platform anyway — silently running "hermetic" test children
on the real device (and hanging when it was unreachable). The in-process
test suite never caught it because conftest pins cpu before any import.
"""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_depth_cli_child_honors_force_cpu(workflow, test_video, tmp_path):
    from vsc_tpu.pipeline import frame_extractor
    from vsc_tpu.config import load_config

    config = load_config(workflow)
    assert frame_extractor.run(workflow, config)

    out = subprocess.run(
        [sys.executable, str(REPO / "depth_map_generator.py"),
         str(workflow), "--no-interactive", "--batch-size", "4",
         "--input-size", "384"],
        capture_output=True, text=True, timeout=220, cwd=REPO,
        env={**__import__("os").environ, "VSC_TPU_FORCE_CPU": "1"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "Using: cpu" in out.stdout, out.stdout[-2000:]
