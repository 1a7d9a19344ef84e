"""Depth model tests: topology, batching, TP sharding on the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax.core import meta

from vsc_tpu.models import DepthPro, DepthProConfig, ViTConfig, preprocess_frames


@pytest.fixture(scope="module")
def tiny_model():
    cfg = DepthProConfig.tiny()
    model = DepthPro(cfg)
    dummy = jnp.zeros((1, cfg.img_size, cfg.img_size, 3), jnp.float32)
    boxed = model.init(jax.random.PRNGKey(0), dummy)["params"]
    return cfg, model, boxed


def test_config_invariants():
    DepthProConfig()  # production config must satisfy its own invariants
    with pytest.raises(ValueError):
        DepthProConfig(img_size=100, tile_size=24)  # img != 4*tile
    with pytest.raises(ValueError):
        DepthProConfig(img_size=96, tile_size=24,
                       encoder=ViTConfig(img_size=24, patch_size=8))  # grid 3


def test_forward_shapes_and_batching(tiny_model):
    cfg, model, boxed = tiny_model
    params = meta.unbox(boxed)
    x = jax.random.uniform(jax.random.PRNGKey(1),
                           (3, cfg.img_size, cfg.img_size, 3),
                           minval=-1.0, maxval=1.0)
    out = model.apply({"params": params}, x)
    # the deconv stack output scales with token count: S * 16 / patch_size
    # (== S for the production ViT/16)
    s_out = cfg.img_size * 16 // cfg.encoder.patch_size
    assert out["canonical_inverse_depth"].shape == (3, s_out, s_out)
    assert out["fov_deg"].shape == (3,)
    assert np.all(np.isfinite(np.asarray(out["fov_deg"])))
    assert np.all(np.asarray(out["canonical_inverse_depth"]) >= 0)

    # per-sample independence: batch result == single-sample result
    single = model.apply({"params": params}, x[1:2])
    np.testing.assert_allclose(
        np.asarray(out["canonical_inverse_depth"][1]),
        np.asarray(single["canonical_inverse_depth"][0]),
        atol=1e-4)


def test_preprocess_range():
    u8 = jnp.asarray([[[[0, 127, 255]]]], jnp.uint8)
    x = preprocess_frames(u8)
    np.testing.assert_allclose(np.asarray(x)[0, 0, 0],
                               [-1.0, -0.00392157, 1.0], atol=1e-5)


def test_tp_sharded_inference_matches_single(tiny_model):
    """TP over heads/MLP on the 8-device mesh must reproduce single-device
    numerics (the pjit program inserts the collectives)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from vsc_tpu.parallel.mesh import make_mesh
    from vsc_tpu.parallel.sharding import param_shardings

    cfg, model, boxed = tiny_model
    params = meta.unbox(boxed)
    x = jax.random.uniform(jax.random.PRNGKey(2),
                           (4, cfg.img_size, cfg.img_size, 3),
                           minval=-1.0, maxval=1.0)
    expected = np.asarray(
        model.apply({"params": params}, x)["canonical_inverse_depth"])

    mesh = make_mesh(data=4, model=2)
    sharded_params = jax.device_put(params, param_shardings(boxed, mesh))
    x_sharded = jax.device_put(
        x, NamedSharding(mesh, P("data", None, None, None)))

    @jax.jit
    def step(p, images):
        return model.apply({"params": p}, images)["canonical_inverse_depth"]

    got = np.asarray(step(sharded_params, x_sharded))
    np.testing.assert_allclose(got, expected, atol=2e-4)


def test_stub_models():
    from vsc_tpu.models.stub import gradient_depth, luminance_depth
    x = jnp.zeros((2, 16, 24, 3), jnp.float32)
    assert luminance_depth(x).shape == (2, 16, 24)
    g = np.asarray(gradient_depth(x))
    assert g.shape == (2, 16, 24)
    assert g[0, 0, 0] == 0.0 and g[0, -1, 0] == 1.0


def test_param_save_load_roundtrip(tiny_model, tmp_path):
    from vsc_tpu.models.convert import load_params, save_params
    cfg, model, boxed = tiny_model
    params = meta.unbox(boxed)
    save_params(params, tmp_path / "ckpt.npz")
    loaded = load_params(tmp_path / "ckpt.npz", params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_optin_fast_paths_equivalent(tiny_model, monkeypatch):
    """The measured-slower opt-in formulations (folded LN, composed deconv
    chains — see vit.py/depthpro.py notes from the r3 TPU bisect) must stay
    numerically equivalent to the default paths so the toggles remain safe
    to flip on other hardware generations."""
    cfg, model, boxed = tiny_model
    params = meta.unbox(boxed)
    x = np.random.default_rng(3).uniform(
        -1, 1, (1, cfg.img_size, cfg.img_size, 3)).astype(np.float32)

    def run():
        out = model.apply({"params": params}, jnp.asarray(x))
        return np.asarray(out["canonical_inverse_depth"])

    base = run()
    monkeypatch.setenv("VSC_TPU_FOLDED_LN", "1")
    monkeypatch.setenv("VSC_TPU_FUSED_UPSAMPLE", "1")
    jax.clear_caches()  # env toggles are read at trace time
    opt = run()
    monkeypatch.delenv("VSC_TPU_FOLDED_LN")
    monkeypatch.delenv("VSC_TPU_FUSED_UPSAMPLE")
    jax.clear_caches()
    np.testing.assert_allclose(opt, base, atol=1e-4, rtol=1e-4)
