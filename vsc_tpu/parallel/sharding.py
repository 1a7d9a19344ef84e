"""
Parameter and activation sharding rules
=======================================

Maps the model's *logical* axis names (annotated in vsc_tpu.models.vit via
flax partitioning metadata) onto mesh axes:

  "heads" -> "model"   (attention QKV/out projections split over heads)
  "mlp"   -> "model"   (MLP hidden dim split)
  "embed" -> replicated

This is the standard Megatron-style TP layout for a ViT: the per-block
pattern column-parallel (qkv, fc1) then row-parallel (proj, fc2) means XLA
inserts exactly one psum per attention block and one per MLP under pjit.
Frame batches shard over "data" (see parallel.mesh).
"""

from __future__ import annotations

import jax
from flax import linen as nn
from flax.core import meta
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["LOGICAL_RULES", "shard_params", "param_shardings"]

LOGICAL_RULES = (
    ("heads", "model"),
    ("mlp", "model"),
    ("embed", None),
)


def param_shardings(params, mesh: Mesh):
    """NamedSharding tree for a Flax param tree that carries logical-axis
    metadata (falls back to replication for unannotated leaves)."""
    logical_specs = nn.get_partition_spec(params)

    def to_named(spec):
        if not isinstance(spec, P):
            return NamedSharding(mesh, P())
        phys = nn.logical_to_mesh_axes(spec, rules=LOGICAL_RULES)
        return NamedSharding(mesh, phys if isinstance(phys, P) else P())

    return jax.tree.map(to_named, logical_specs,
                        is_leaf=lambda x: isinstance(x, P) or x is None)


def shard_params(params, mesh: Mesh):
    """Place (or re-place) a param tree onto the mesh according to the TP
    rules; boxed AxisMetadata leaves are unboxed to plain arrays."""
    unboxed = meta.unbox(params)
    shardings = param_shardings(params, mesh)
    return jax.device_put(unboxed, shardings)
