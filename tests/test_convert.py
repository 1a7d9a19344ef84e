"""Checkpoint conversion machinery, validated against a synthetic torch
checkpoint with the timm/DINOv2 naming and layouts (real weights are not
reachable from this sandbox; SURVEY.md ranks weight conversion as hard part
#1, so the mapping itself is under test)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax.core import meta

from vsc_tpu.models import DepthPro, DepthProConfig, ViT, ViTConfig
from vsc_tpu.models.convert import convert_torch_checkpoint, convert_vit_state

torch = pytest.importorskip("torch")


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
        {k: v.numpy() for k, v in state.items()}, "enc.", cfg.depth)

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


def test_full_checkpoint_conversion_applies_encoders(tmp_path):
    cfg = DepthProConfig.tiny()
    rng = np.random.default_rng(1)
    state = {}
    state.update(make_torch_vit_state("encoder.patch_encoder.", cfg.encoder,
                                      rng))
    state.update(make_torch_vit_state("encoder.image_encoder.", cfg.encoder,
                                      rng))
    ckpt = tmp_path / "depth_pro.pt"
    torch.save(state, ckpt)

    model = DepthPro(cfg)
    params = convert_torch_checkpoint(ckpt, model, verbose=False)
    # the converted cls token must be the checkpoint's, not the zero init
    got = np.asarray(params["patch_encoder"]["cls_token"])
    want = state["encoder.patch_encoder.cls_token"].numpy()
    np.testing.assert_array_equal(got, want)
    # and the model still runs
    out = model.apply({"params": params},
                      jnp.zeros((1, cfg.img_size, cfg.img_size, 3)))
    assert out["canonical_inverse_depth"].shape == (1, cfg.img_size,
                                                    cfg.img_size)
