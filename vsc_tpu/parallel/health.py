"""
Accelerator health probe
========================

The TPU analogue of the reference's GPU known-answer test
(/root/reference/sbs_generator.py:41-68): a tiny jit computation with a
known result, run before dispatching work, returning False on wrong output
or any runtime error (driver wedged, slice lost). The orchestrator reacts
the way the reference does to exit code 100: terminate accelerator work,
cool down, retry (workflow_orchestrator.py:712-755).

A wedged device can *hang* a dispatch rather than raise (a TPU failure mode
the reference's GPU driver-reset never shows), so the probe runs on a worker
thread with a deadline: timeout => unhealthy.
"""

from __future__ import annotations

import os
import threading

import jax
import jax.numpy as jnp

__all__ = ["ACCEL_ERROR_EXIT_CODE", "check_accelerator_health",
           "run_with_deadline"]

# Exit code signaling accelerator failure to the orchestrator (same contract
# as the reference's GPU_ERROR_EXIT_CODE, sbs_generator.py:41).
ACCEL_ERROR_EXIT_CODE = 100

# Generous: the very first probe may trigger a compile (minutes through the
# axon remote-compile relay); later probes reuse the compiled program.
_DEFAULT_TIMEOUT = float(os.environ.get("VSC_TPU_HEALTH_TIMEOUT", "600"))
_WARM_TIMEOUT = float(os.environ.get("VSC_TPU_HEALTH_WARM_TIMEOUT", "60"))
_probe_succeeded_once = False


@jax.jit
def _probe(x):
    return (x * 2.0).sum()


def _run_probe(device) -> bool:
    x = jnp.asarray([1.0, 2.0, 3.0])
    if device is not None:
        x = jax.device_put(x, device)
    result = float(_probe(x))
    return abs(result - 12.0) < 1e-3


def run_with_deadline(fn, timeout: float):
    """Run ``fn()`` on a daemon worker thread with a deadline.

    Returns ``fn()``'s value; raises ``TimeoutError`` when the deadline
    passes (the wedged dispatch thread is abandoned — daemon threads don't
    block interpreter exit, so the caller can still ``sys.exit(100)``).
    Exceptions from ``fn`` propagate unchanged. This is the dispatch-level
    analogue of the health probe's hang deadline: a wedged TPU can hang a
    device->host transfer indefinitely rather than raise."""
    out: list = []
    err: list = []

    def worker():
        try:
            out.append(fn())
        except BaseException as e:  # noqa: BLE001 — re-raised on the caller
            err.append(e)

    t = threading.Thread(target=worker, daemon=True, name="vsc-dispatch")
    t.start()
    t.join(timeout)
    if t.is_alive():
        raise TimeoutError(
            f"device dispatch exceeded its {timeout:.0f}s deadline")
    if err:
        raise err[0]
    return out[0]


def check_accelerator_health(device=None, timeout: float | None = None) -> bool:
    """Known-answer test: sum([1,2,3]*2) == 12 on the target device, within
    a deadline (hang => False, mirroring the reference's exit-100 contract)."""
    global _probe_succeeded_once
    if timeout is None:
        timeout = _WARM_TIMEOUT if _probe_succeeded_once else _DEFAULT_TIMEOUT
    # A plain daemon thread, not ThreadPoolExecutor: the executor's atexit
    # hook joins workers at interpreter exit, which would block the
    # sys.exit(100) this timeout exists to enable. A daemon thread is
    # abandoned freely on timeout.
    result: list[bool] = []

    def worker():
        try:
            result.append(_run_probe(device))
        except Exception:
            result.append(False)

    t = threading.Thread(target=worker, daemon=True,
                         name="vsc-health-probe")
    t.start()
    t.join(timeout)
    if t.is_alive() or not result or not result[0]:
        return False
    _probe_succeeded_once = True
    return True
