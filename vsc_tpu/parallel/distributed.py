"""
Multi-host initialization
=========================

The reference's "distributed backend" is the OS (subprocesses + filesystem,
SURVEY.md section 5); the TPU-native equivalent is jax.distributed across
hosts of a pod slice: collectives ride ICI within a slice and DCN across
slices, and the orchestrator's per-host step processes all see the same
global mesh.

This sandbox exposes a single chip, so multi-host paths cannot execute
here; the helper is exercised for its no-op single-host behavior and is the
documented entry point for pod deployments:

    from vsc_tpu.parallel.distributed import initialize
    initialize()                       # env-driven (TPU pod metadata), or
    initialize(coordinator="host0:1234", num_processes=4, process_id=i)

After initialization, vsc_tpu.parallel.mesh.make_mesh() sees every chip in
the slice via jax.devices(); batches sharded with parallel.auto.shard_batch
then span hosts (each host feeds its addressable shard).
"""

from __future__ import annotations

import os

__all__ = ["initialize", "is_multi_host"]

_initialized = False


def initialize(coordinator: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """Initialize jax.distributed when running multi-host; no-op (returns
    False) for single-process runs so all CLIs work unchanged on one host."""
    global _initialized
    if _initialized:
        return True
    explicit = coordinator is not None
    env_driven = bool(os.environ.get("JAX_COORDINATOR_ADDRESS")
                      or os.environ.get("COORDINATOR_ADDRESS")
                      or os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") > 0)
    if not explicit and not env_driven:
        return False
    import jax
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    return True


def is_multi_host() -> bool:
    import jax
    return jax.process_count() > 1
