"""
Automatic data-parallel batch placement
=======================================

The step CLIs call shard_batch() on every host batch: with one device it's
a plain transfer, with N devices the frame axis is sharded across a data
mesh so the subsequent jit dispatch runs SPMD — the TPU-native replacement
for the reference's "2 SBS processes on one GPU" concurrency model
(/root/reference/workflow_orchestrator.py:74-76). XLA propagates the input
sharding through the whole program, so the step code itself stays
device-count-agnostic.
"""

from __future__ import annotations

import functools

__all__ = ["device_count", "pad_to_multiple", "shard_batch"]


@functools.lru_cache(maxsize=1)
def _data_mesh():
    import jax
    if len(jax.devices()) <= 1:
        return None
    from vsc_tpu.parallel.mesh import make_mesh
    return make_mesh()  # all devices on the "data" axis


def device_count() -> int:
    import jax
    return len(jax.devices())


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def shard_batch(array):
    """Place a host batch onto the device(s); axis 0 sharded over "data"
    when a multi-device mesh exists. Axis 0 must divide evenly — callers
    pad their batch size to a device-count multiple."""
    import jax
    mesh = _data_mesh()
    if mesh is None:
        return jax.device_put(array)
    from jax.sharding import NamedSharding, PartitionSpec as P
    spec = [None] * array.ndim
    spec[0] = "data"
    return jax.device_put(array, NamedSharding(mesh, P(*spec)))
