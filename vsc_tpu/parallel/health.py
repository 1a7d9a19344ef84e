"""
Accelerator health probe
========================

The TPU analogue of the reference's GPU known-answer test
(/root/reference/sbs_generator.py:41-68): a tiny jit computation with a
known result, run before dispatching work, returning False on wrong output
or any runtime error (driver wedged, slice lost). The orchestrator reacts
the way the reference does to exit code 100: terminate accelerator work,
cool down, retry (workflow_orchestrator.py:712-755).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["ACCEL_ERROR_EXIT_CODE", "check_accelerator_health"]

# Exit code signaling accelerator failure to the orchestrator (same contract
# as the reference's GPU_ERROR_EXIT_CODE, sbs_generator.py:41).
ACCEL_ERROR_EXIT_CODE = 100


@jax.jit
def _probe(x):
    return (x * 2.0).sum()


def check_accelerator_health(device=None) -> bool:
    """Known-answer test: sum([1,2,3]*2) == 12 on the target device."""
    try:
        x = jnp.asarray([1.0, 2.0, 3.0])
        if device is not None:
            x = jax.device_put(x, device)
        result = float(_probe(x))
        return abs(result - 12.0) < 1e-3
    except Exception:
        return False
