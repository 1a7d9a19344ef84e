"""Checkpoint conversion, validated numerically against the transformers
DepthPro implementation (an independent, integration-tested port of Apple
ml-depth-pro): a randomly initialized torch DepthProForDepthEstimation is
converted into our Flax model and both must produce the same depth map and
FOV. The Apple-checkpoint key format is exercised by renaming the same
weights into ml-depth-pro naming, proving both mapping tables end-to-end.
SURVEY.md ranks weight conversion as hard part #1."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax.core import meta

from vsc_tpu.models import DepthPro, DepthProConfig, ViT, ViTConfig
from vsc_tpu.models.convert import (
    ConversionError,
    convert_torch_checkpoint,
    convert_vit_state,
)

torch = pytest.importorskip("torch")

# ---------------------------------------------------------------------------
# tiny architecture-faithful config: grid must be 24 so the HF merge padding
# (min(grid//4, 3)) coincides with the exact overlap trim (grid//8) and all
# of HF's post-merge interpolations are identities — at the production
# grid (384/16 = 24) this holds by construction.
TINY = DepthProConfig(
    img_size=192,
    tile_size=48,
    encoder=ViTConfig(img_size=48, patch_size=2, embed_dim=32, depth=4,
                      num_heads=2, layerscale_init=1.0),
    hook_block_ids=(0, 2),
    decoder_features=16,
    dims_encoder=(16, 24, 32, 32),
)


def make_hf_model(c: DepthProConfig = TINY):
    from transformers import DepthProConfig as HFConfig
    from transformers import DepthProForDepthEstimation
    from transformers import Dinov2Config

    vit = dict(image_size=c.tile_size, patch_size=c.encoder.patch_size,
               hidden_size=c.encoder.embed_dim,
               num_hidden_layers=c.encoder.depth,
               num_attention_heads=c.encoder.num_heads,
               intermediate_size=int(c.encoder.embed_dim
                                     * c.encoder.mlp_ratio),
               layerscale_value=c.encoder.layerscale_init,
               attn_implementation="eager")
    cfg = HFConfig(
        patch_size=c.tile_size,
        patch_model_config=Dinov2Config(**vit),
        image_model_config=Dinov2Config(**vit),
        fov_model_config=Dinov2Config(**vit),
        fusion_hidden_size=c.decoder_features,
        intermediate_hook_ids=[c.hook_block_ids[1], c.hook_block_ids[0]],
        intermediate_feature_dims=[c.dims_encoder[0], c.dims_encoder[0]],
        scaled_images_ratios=[0.25, 0.5, 1],
        scaled_images_overlap_ratios=[0.0, 0.5, 0.25],
        scaled_images_feature_dims=[c.dims_encoder[3],
                                    c.dims_encoder[2],
                                    c.dims_encoder[1]],
        merge_padding_value=3,
        use_fov_model=True,
        num_fov_head_layers=2,
    )
    torch.manual_seed(0)
    model = DepthProForDepthEstimation(cfg)
    model.eval()
    return model


def hf_state_to_apple(state: dict, cfg: DepthProConfig) -> dict:
    """Rename an HF DepthPro state dict into Apple ml-depth-pro naming
    (the depth_pro.pt key layout), re-fusing q/k/v — the format the
    reference's users hold locally."""
    from vsc_tpu.models.convert import _apple_mapping, _hf_mapping

    apple = {}

    def vit_rename(hf_prefix, ap_prefix):
        def g(name):
            return state[f"{hf_prefix}{name}"]

        apple[f"{ap_prefix}cls_token"] = g("embeddings.cls_token")
        apple[f"{ap_prefix}pos_embed"] = g("embeddings.position_embeddings")
        apple[f"{ap_prefix}patch_embed.proj.weight"] = g(
            "embeddings.patch_embeddings.projection.weight")
        apple[f"{ap_prefix}patch_embed.proj.bias"] = g(
            "embeddings.patch_embeddings.projection.bias")
        for i in range(cfg.encoder.depth):
            hf_b = f"{hf_prefix}encoder.layer.{i}."
            ap_b = f"{ap_prefix}blocks.{i}."
            for ln in ("norm1", "norm2"):
                apple[f"{ap_b}{ln}.weight"] = state[f"{hf_b}{ln}.weight"]
                apple[f"{ap_b}{ln}.bias"] = state[f"{hf_b}{ln}.bias"]
            apple[f"{ap_b}attn.qkv.weight"] = torch.cat(
                [state[f"{hf_b}attention.attention.{p}.weight"]
                 for p in ("query", "key", "value")], dim=0)
            apple[f"{ap_b}attn.qkv.bias"] = torch.cat(
                [state[f"{hf_b}attention.attention.{p}.bias"]
                 for p in ("query", "key", "value")], dim=0)
            apple[f"{ap_b}attn.proj.weight"] = state[
                f"{hf_b}attention.output.dense.weight"]
            apple[f"{ap_b}attn.proj.bias"] = state[
                f"{hf_b}attention.output.dense.bias"]
            apple[f"{ap_b}ls1.gamma"] = state[f"{hf_b}layer_scale1.lambda1"]
            apple[f"{ap_b}ls2.gamma"] = state[f"{hf_b}layer_scale2.lambda1"]
            for fc in ("fc1", "fc2"):
                apple[f"{ap_b}mlp.{fc}.weight"] = state[f"{hf_b}mlp.{fc}.weight"]
                apple[f"{ap_b}mlp.{fc}.bias"] = state[f"{hf_b}mlp.{fc}.bias"]
        apple[f"{ap_prefix}norm.weight"] = state[f"{hf_prefix}layernorm.weight"]
        apple[f"{ap_prefix}norm.bias"] = state[f"{hf_prefix}layernorm.bias"]

    vit_rename("depth_pro.encoder.patch_encoder.model.",
               "encoder.patch_encoder.")
    vit_rename("depth_pro.encoder.image_encoder.model.",
               "encoder.image_encoder.")
    vit_rename("fov_model.fov_encoder.model.", "fov.encoder.0.")

    # non-ViT tensors: compose hf->flax->apple through the two tables
    hf_table = _hf_mapping(cfg)
    flax_to_apple = {fk: tk for tk, (fk, _) in _apple_mapping(cfg).items()}
    for hf_key, (fk, _) in hf_table.items():
        apple[flax_to_apple[fk]] = state[hf_key]
    return apple


@pytest.fixture(scope="module")
def oracle():
    """(hf_model, torch input, expected depth/fov) computed once."""
    hf = make_hf_model()
    rng = np.random.default_rng(0)
    x = rng.uniform(-1.0, 1.0, (1, TINY.img_size, TINY.img_size, 3))
    x = x.astype(np.float32)
    with torch.no_grad():
        out = hf(torch.from_numpy(x).permute(0, 3, 1, 2))
    return hf, x, (out.predicted_depth.numpy(), out.field_of_view.numpy())


def _ours_from_checkpoint(ckpt_path):
    model = DepthPro(TINY)
    params = convert_torch_checkpoint(ckpt_path, model, verbose=False)
    return model, params


def test_hf_checkpoint_equivalence(oracle, tmp_path):
    """Our converted model must reproduce the transformers DepthPro
    (independent torch implementation) to float tolerance."""
    hf, x, (want_depth, want_fov) = oracle
    ckpt = tmp_path / "hf_depth_pro.pt"
    torch.save(hf.state_dict(), ckpt)
    model, params = _ours_from_checkpoint(ckpt)

    out = model.apply({"params": params}, jnp.asarray(x))
    got_depth = np.asarray(out["canonical_inverse_depth"])
    got_fov = np.asarray(out["fov_deg"])
    assert got_depth.shape == want_depth.shape
    np.testing.assert_allclose(got_fov, want_fov, atol=1e-3)
    np.testing.assert_allclose(got_depth, want_depth, atol=5e-3, rtol=1e-3)


def test_apple_checkpoint_equivalence(oracle, tmp_path):
    """The Apple ml-depth-pro key format (what depth_pro.pt holds) maps the
    same weights to the same outputs — no tensor keeps its random init."""
    hf, x, (want_depth, want_fov) = oracle
    apple_state = hf_state_to_apple(hf.state_dict(), TINY)
    ckpt = tmp_path / "depth_pro.pt"
    torch.save(apple_state, ckpt)
    model, params = _ours_from_checkpoint(ckpt)

    out = model.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out["fov_deg"]), want_fov,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["canonical_inverse_depth"]),
                               want_depth, atol=5e-3, rtol=1e-3)


def test_conversion_is_strict(oracle, tmp_path):
    """A checkpoint missing tensors must raise, not silently run with
    random weights (round-1 advisor finding)."""
    hf, _, _ = oracle
    state = hf_state_to_apple(hf.state_dict(), TINY)
    del state["decoder.fusions.2.resnet1.1.weight"]
    ckpt = tmp_path / "partial.pt"
    torch.save(state, ckpt)
    model = DepthPro(TINY)
    with pytest.raises(ConversionError):
        convert_torch_checkpoint(ckpt, model, verbose=False)
    # explicit opt-in downgrades to a warning
    params = convert_torch_checkpoint(ckpt, model, verbose=False,
                                      allow_partial=True)
    assert params is not None


# ---------------------------------------------------------------------------
# standalone ViT mapping numerics (timm naming), kept from round 1


def make_torch_vit_state(prefix, cfg: ViTConfig, rng):
    """Synthetic state dict in timm/DINOv2 layout for our tiny config."""
    D = cfg.embed_dim
    p = cfg.patch_size
    T = cfg.num_patches + 1
    H = int(D * cfg.mlp_ratio)

    def t(*shape):
        return torch.from_numpy(rng.normal(size=shape).astype(np.float32))

    s = {
        f"{prefix}cls_token": t(1, 1, D),
        f"{prefix}pos_embed": t(1, T, D),
        f"{prefix}patch_embed.proj.weight": t(D, 3, p, p),
        f"{prefix}patch_embed.proj.bias": t(D),
        f"{prefix}norm.weight": t(D),
        f"{prefix}norm.bias": t(D),
    }
    for i in range(cfg.depth):
        b = f"{prefix}blocks.{i}."
        s.update({
            f"{b}norm1.weight": t(D), f"{b}norm1.bias": t(D),
            f"{b}norm2.weight": t(D), f"{b}norm2.bias": t(D),
            f"{b}attn.qkv.weight": t(3 * D, D),
            f"{b}attn.qkv.bias": t(3 * D),
            f"{b}attn.proj.weight": t(D, D),
            f"{b}attn.proj.bias": t(D),
            f"{b}mlp.fc1.weight": t(H, D), f"{b}mlp.fc1.bias": t(H),
            f"{b}mlp.fc2.weight": t(D, H), f"{b}mlp.fc2.bias": t(D),
            f"{b}ls1.gamma": t(D), f"{b}ls2.gamma": t(D),
        })
    return s


def torch_vit_forward(state, prefix, cfg: ViTConfig, x_np):
    """Reference forward with torch ops directly from the state dict —
    ground truth for the converted Flax model."""
    import torch.nn.functional as F
    x = torch.from_numpy(x_np).permute(0, 3, 1, 2)  # NCHW
    w = {k[len(prefix):]: v for k, v in state.items() if k.startswith(prefix)}
    D = cfg.embed_dim
    Hh = cfg.num_heads

    x = F.conv2d(x, w["patch_embed.proj.weight"], w["patch_embed.proj.bias"],
                 stride=cfg.patch_size)
    B = x.shape[0]
    x = x.flatten(2).transpose(1, 2)  # [B, T, D]
    cls = w["cls_token"].expand(B, -1, -1)
    x = torch.cat([cls, x], dim=1) + w["pos_embed"]

    for i in range(cfg.depth):
        b = f"blocks.{i}."
        h = F.layer_norm(x, (D,), w[f"{b}norm1.weight"], w[f"{b}norm1.bias"],
                         eps=1e-6)
        qkv = F.linear(h, w[f"{b}attn.qkv.weight"], w[f"{b}attn.qkv.bias"])
        T = qkv.shape[1]
        qkv = qkv.reshape(B, T, 3, Hh, D // Hh)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q, k, v = (z.transpose(1, 2) for z in (q, k, v))
        att = F.scaled_dot_product_attention(q, k, v)
        att = att.transpose(1, 2).reshape(B, T, D)
        att = F.linear(att, w[f"{b}attn.proj.weight"], w[f"{b}attn.proj.bias"])
        x = x + att * w[f"{b}ls1.gamma"]
        h = F.layer_norm(x, (D,), w[f"{b}norm2.weight"], w[f"{b}norm2.bias"],
                         eps=1e-6)
        h = F.linear(h, w[f"{b}mlp.fc1.weight"], w[f"{b}mlp.fc1.bias"])
        h = F.gelu(h)
        h = F.linear(h, w[f"{b}mlp.fc2.weight"], w[f"{b}mlp.fc2.bias"])
        x = x + h * w[f"{b}ls2.gamma"]
    x = F.layer_norm(x, (D,), w["norm.weight"], w["norm.bias"], eps=1e-6)
    return x.numpy()


def test_vit_conversion_numerics(tmp_path):
    """Converted encoder must reproduce the torch forward exactly."""
    cfg = ViTConfig(img_size=24, patch_size=3, embed_dim=32, depth=2,
                    num_heads=2, layerscale_init=1.0)
    rng = np.random.default_rng(0)
    state = make_torch_vit_state("enc.", cfg, rng)

    # map into our flax tree
    model = ViT(cfg)
    x = rng.normal(size=(2, 24, 24, 3)).astype(np.float32)
    boxed = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    params = meta.unbox(boxed)

    mapped = convert_vit_state(
        {k: v.numpy() for k, v in state.items()}, "enc.", cfg.depth,
        cfg.num_heads)

    def set_path(tree, path, value):
        keys = path.split("/")
        node = tree
        for k in keys[:-1]:
            node = node[k]
        assert node[keys[-1]].shape == value.shape, path
        node[keys[-1]] = jnp.asarray(value)

    import flax
    params = flax.core.unfreeze(params)
    for path, val in mapped.items():
        set_path(params, path, val)

    got, _ = model.apply({"params": params}, jnp.asarray(x))
    want = torch_vit_forward(state, "enc.", cfg, x)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


# ---------------------------------------------------------------------------
# production-grid parity: full 1536-px input, 384-px tiles, patch 16 — the
# EXACT tile-mosaic geometry of the shipping model (reference workload:
# /root/reference/depth_map_generator.py:303-324, 1536x1536 ONNX) with a
# thin encoder so it runs on CPU in seconds. Every grid-dependent
# coincidence (trim = grid//8 = 3 vs HF merge padding min(grid//4, 3) = 3,
# 5x5 fine-tile cover at stride 0.75*tile, hook reshapes) is exercised at
# the production numbers, closing the risk that the TINY-config tests only
# pass at their own size.

PROD_GEOM = DepthProConfig(
    img_size=1536,
    tile_size=384,
    encoder=ViTConfig(img_size=384, patch_size=16, embed_dim=32, depth=4,
                      num_heads=2, layerscale_init=1.0),
    hook_block_ids=(0, 2),
    decoder_features=16,
    dims_encoder=(16, 24, 32, 32),
)


def test_production_grid_equivalence(tmp_path):
    hf = make_hf_model(PROD_GEOM)
    rng = np.random.default_rng(1)
    x = rng.uniform(-1.0, 1.0,
                    (1, PROD_GEOM.img_size, PROD_GEOM.img_size, 3))
    x = x.astype(np.float32)
    with torch.no_grad():
        out = hf(torch.from_numpy(x).permute(0, 3, 1, 2))
    want_depth = out.predicted_depth.numpy()

    ckpt = tmp_path / "prod_geom.pt"
    torch.save(hf.state_dict(), ckpt)
    model = DepthPro(PROD_GEOM)
    params = convert_torch_checkpoint(ckpt, model, verbose=False)
    got = np.asarray(model.apply({"params": params},
                                 jnp.asarray(x))["canonical_inverse_depth"])
    assert got.shape == want_depth.shape == (1, 1536, 1536)
    np.testing.assert_allclose(got, want_depth, atol=5e-3, rtol=1e-3)


def test_safetensors_checkpoint_equivalence(oracle, tmp_path):
    """apple/DepthPro-hf ships safetensors (models/bootstrap.py downloads
    it); converting it must match converting the same weights from .pt."""
    from safetensors.torch import save_file

    hf, x, (want_depth, _) = oracle
    state = {k: v.contiguous() for k, v in hf.state_dict().items()}
    ckpt = tmp_path / "model.safetensors"
    save_file(state, str(ckpt))
    model, params = _ours_from_checkpoint(ckpt)
    got = np.asarray(model.apply({"params": params},
                                 jnp.asarray(x))["canonical_inverse_depth"])
    np.testing.assert_allclose(got, want_depth, atol=5e-3, rtol=1e-3)
