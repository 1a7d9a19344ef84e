"""
Device mesh construction
========================

The framework's parallelism axes (replacing the reference's process-level
concurrency knobs MAX_DEPTH_PROCESSES/MAX_SBS_PROCESSES,
/root/reference/workflow_orchestrator.py:74-76):

  "data"   - frame-axis data parallelism: batches of video frames are
             sharded across chips; the primary scale-out axis.
  "model"  - tensor parallelism inside the depth ViT (attention heads /
             MLP hidden), used when per-chip latency matters more than
             throughput (small batches, interactive tester).

A (data, model) mesh covers both; model=1 is plain DP. The mesh rides ICI
within a slice; multi-host DCN layouts put "data" outermost so collectives
stay on ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "data_sharding", "replicated", "P"]


def make_mesh(data: int | None = None, model: int = 1,
              devices=None) -> Mesh:
    """Create a (data, model) mesh. With no arguments, uses every visible
    device for data parallelism."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs {data*model} devices, "
                         f"have {n}")
    grid = np.array(devices[: data * model]).reshape(data, model)
    return Mesh(grid, axis_names=("data", "model"))


def data_sharding(mesh: Mesh, ndim: int, batch_axis: int = 0) -> NamedSharding:
    """Shard axis `batch_axis` over "data", replicate the rest — the layout
    for frame batches."""
    spec = [None] * ndim
    spec[batch_axis] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
