"""
Checkpoint conversion
=====================

Loads DepthPro weights into the Flax model. The reference downloads an ONNX
export from HuggingFace at runtime (/root/reference/depth_map_generator.py:39-64);
this environment has no network egress and no onnxruntime, so conversion is
gated on a local file in one of three formats:

  - Apple ml-depth-pro PyTorch checkpoint (``depth_pro.pt``): the original
    release, timm/DINOv2 ViT naming + the ``encoder.upsample_*`` /
    ``decoder.convs|fusions`` / ``head`` / ``fov`` module tree. Our Flax
    modules mirror that tree one-to-one, so EVERY tensor maps (no random
    init remains).
  - HuggingFace ``apple/DepthPro-hf`` (transformers DepthProForDepthEstimation)
    state dict: same weights, different module names (``depth_pro.encoder``,
    ``neck.feature_upsample``, ``fusion_stage``, ``fov_model``) and separate
    q/k/v projections that we re-fuse. This format is numerically validated
    in-sandbox against the installed transformers implementation
    (tests/test_convert.py).
  - a previously converted npz of our own parameter tree (save_params).

Conversion is STRICT: if any model parameter is left unmapped (or any
shape disagrees), it raises instead of silently proceeding with random
weights — a real checkpoint must produce real depth, never noise with a
console note. Set allow_partial=True (or VSC_TPU_ALLOW_PARTIAL_CONVERT=1)
for development experiments only.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

__all__ = ["load_params", "save_params", "convert_torch_checkpoint",
           "convert_vit_state", "convert_hf_dinov2_state", "ConversionError"]


class ConversionError(RuntimeError):
    pass


def _flatten(params):
    import jax
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for keypath, leaf in flat:
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in keypath)
        out[name] = leaf
    return out


def save_params(params, path: Path | str) -> None:
    """Flatten a Flax param tree into an npz archive."""
    np.savez_compressed(str(path), **{k: np.asarray(v)
                                      for k, v in _flatten(params).items()})


def load_params(path: Path | str, like_params):
    """Load an npz archive saved by save_params into the structure of
    ``like_params`` (shape-checked)."""
    import jax
    data = np.load(str(path))
    flat, _ = jax.tree_util.tree_flatten_with_path(like_params)
    leaves = []
    for keypath, leaf in flat:
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in keypath)
        if name not in data:
            raise KeyError(f"checkpoint missing parameter: {name}")
        arr = data[name]
        if arr.shape != leaf.shape:
            raise ValueError(
                f"shape mismatch for {name}: checkpoint {arr.shape} vs "
                f"model {leaf.shape}")
        leaves.append(arr.astype(np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(like_params), leaves)


# --------------------------------------------------------------------------
# layout transforms (torch -> flax)

def _t_linear(w):   # [out, in] -> [in, out]
    return np.asarray(w).T


def _t_conv(w):     # [O, I, kh, kw] -> [kh, kw, I, O]
    return np.asarray(w).transpose(2, 3, 1, 0)


def _t_convT(w):    # ConvTranspose2d [I, O, kh, kw] -> [kh, kw, I, O]
    return np.asarray(w).transpose(2, 3, 0, 1)


def _t_none(w):
    return np.asarray(w)


# --------------------------------------------------------------------------
# ViT sub-trees

def _interleave_qkv(arr: np.ndarray, num_heads: int) -> np.ndarray:
    """Fused-qkv LAST axis reorder: [q_all | k_all | v_all] (the torch/HF
    row-stacked convention, transposed to columns here) -> per-head
    interleaved [q_h0 | k_h0 | v_h0 | q_h1 | ...] blocks of 3*head_dim —
    the Megatron fused-qkv layout our attention consumes
    (vsc_tpu/ops/attention_pallas.qkv_short_seq_attention): a contiguous
    tensor-parallel shard of the column axis then holds whole heads."""
    d3 = arr.shape[-1]
    dh = d3 // (3 * num_heads)
    x = arr.reshape(arr.shape[:-1] + (3, num_heads, dh))
    x = np.moveaxis(x, -3, -2)  # [..., heads, 3, dh]
    return np.ascontiguousarray(x.reshape(arr.shape[:-1] + (d3,)))


def convert_vit_state(state: dict, prefix: str, depth: int,
                      num_heads: int) -> dict:
    """timm/DINOv2 ViT state-dict entries under `prefix` -> our flat Flax
    names (relative to the ViT module). Returns {flax_name: ndarray}.

    Layout conversions:
      Linear:  torch [out, in]      -> flax kernel [in, out]    (transpose)
      Conv2d:  torch [O, I, kh, kw] -> flax kernel [kh, kw, I, O]
      LayerNorm weight -> scale.
      Fused qkv: torch rows [q | k | v] -> per-head interleaved columns
                 (_interleave_qkv).
    """
    def t(name):
        return np.asarray(state[f"{prefix}{name}"])

    out = {}
    out["cls_token"] = t("cls_token")
    out["pos_embed"] = t("pos_embed")
    pe = t("patch_embed.proj.weight")          # [D, 3, p, p]
    out["patch_embed/kernel"] = pe.transpose(2, 3, 1, 0)
    out["patch_embed/bias"] = t("patch_embed.proj.bias")
    for i in range(depth):
        src = f"blocks.{i}."
        dst = f"block_{i}/"
        for ln in ("norm1", "norm2"):
            out[f"{dst}{ln}/scale"] = t(f"{src}{ln}.weight")
            out[f"{dst}{ln}/bias"] = t(f"{src}{ln}.bias")
        out[f"{dst}attn/qkv/kernel"] = _interleave_qkv(
            t(f"{src}attn.qkv.weight").T, num_heads)
        out[f"{dst}attn/qkv/bias"] = _interleave_qkv(
            t(f"{src}attn.qkv.bias"), num_heads)
        out[f"{dst}attn/proj/kernel"] = t(f"{src}attn.proj.weight").T
        out[f"{dst}attn/proj/bias"] = t(f"{src}attn.proj.bias")
        out[f"{dst}mlp/fc1/kernel"] = t(f"{src}mlp.fc1.weight").T
        out[f"{dst}mlp/fc1/bias"] = t(f"{src}mlp.fc1.bias")
        out[f"{dst}mlp/fc2/kernel"] = t(f"{src}mlp.fc2.weight").T
        out[f"{dst}mlp/fc2/bias"] = t(f"{src}mlp.fc2.bias")
        # DINOv2 LayerScale: timm names it ls1/ls2.gamma (older exports:
        # gamma_1/gamma_2 directly on the block)
        for ls, legacy in (("ls1", "gamma_1"), ("ls2", "gamma_2")):
            if f"{prefix}{src}{ls}.gamma" in state:
                out[f"{dst}{ls}/gamma"] = t(f"{src}{ls}.gamma")
            elif f"{prefix}{src}{legacy}" in state:
                out[f"{dst}{ls}/gamma"] = t(f"{src}{legacy}")
    out["norm/scale"] = t("norm.weight")
    out["norm/bias"] = t("norm.bias")
    return out


def convert_hf_dinov2_state(state: dict, prefix: str, depth: int,
                            num_heads: int) -> dict:
    """transformers Dinov2Model state-dict entries under `prefix` -> our
    flat Flax names. Separate q/k/v projections are re-fused into the
    per-head interleaved layout our attention consumes
    (_interleave_qkv)."""
    def t(name):
        return np.asarray(state[f"{prefix}{name}"])

    out = {}
    out["cls_token"] = t("embeddings.cls_token")
    out["pos_embed"] = t("embeddings.position_embeddings")
    pe = t("embeddings.patch_embeddings.projection.weight")
    out["patch_embed/kernel"] = pe.transpose(2, 3, 1, 0)
    out["patch_embed/bias"] = t("embeddings.patch_embeddings.projection.bias")
    for i in range(depth):
        src = f"encoder.layer.{i}."
        dst = f"block_{i}/"
        for ln in ("norm1", "norm2"):
            out[f"{dst}{ln}/scale"] = t(f"{src}{ln}.weight")
            out[f"{dst}{ln}/bias"] = t(f"{src}{ln}.bias")
        qkv_w = np.concatenate(
            [t(f"{src}attention.attention.{p}.weight") for p in
             ("query", "key", "value")], axis=0)
        qkv_b = np.concatenate(
            [t(f"{src}attention.attention.{p}.bias") for p in
             ("query", "key", "value")], axis=0)
        out[f"{dst}attn/qkv/kernel"] = _interleave_qkv(qkv_w.T, num_heads)
        out[f"{dst}attn/qkv/bias"] = _interleave_qkv(qkv_b, num_heads)
        out[f"{dst}attn/proj/kernel"] = t(f"{src}attention.output.dense.weight").T
        out[f"{dst}attn/proj/bias"] = t(f"{src}attention.output.dense.bias")
        out[f"{dst}ls1/gamma"] = t(f"{src}layer_scale1.lambda1")
        out[f"{dst}ls2/gamma"] = t(f"{src}layer_scale2.lambda1")
        out[f"{dst}mlp/fc1/kernel"] = t(f"{src}mlp.fc1.weight").T
        out[f"{dst}mlp/fc1/bias"] = t(f"{src}mlp.fc1.bias")
        out[f"{dst}mlp/fc2/kernel"] = t(f"{src}mlp.fc2.weight").T
        out[f"{dst}mlp/fc2/bias"] = t(f"{src}mlp.fc2.bias")
    out["norm/scale"] = t("layernorm.weight")
    out["norm/bias"] = t("layernorm.bias")
    return out


# --------------------------------------------------------------------------
# full-model mapping tables: {torch_key: (flax_key, transform)}

def _apple_mapping(cfg) -> dict:
    """Apple ml-depth-pro checkpoint (depth_pro.pt) non-ViT tensors."""
    m: dict[str, tuple[str, callable]] = {}

    def conv(tk, fk, bias):
        m[f"{tk}.weight"] = (f"{fk}/kernel", _t_conv)
        if bias:
            m[f"{tk}.bias"] = (f"{fk}/bias", _t_none)

    def convT(tk, fk, bias):
        m[f"{tk}.weight"] = (f"{fk}/kernel", _t_convT)
        if bias:
            m[f"{tk}.bias"] = (f"{fk}/bias", _t_none)

    # encoder upsample stack (Sequential: index 0 = 1x1 proj, rest deconvs)
    for name, n_up in (("upsample_latent0", 3), ("upsample_latent1", 2),
                       ("upsample0", 1), ("upsample1", 1), ("upsample2", 1)):
        conv(f"encoder.{name}.0", f"encoder/{name}/proj", bias=False)
        for i in range(n_up):
            convT(f"encoder.{name}.{i + 1}", f"encoder/{name}/deconv{i}",
                  bias=False)
    convT("encoder.upsample_lowres", "encoder/upsample_lowres", bias=True)
    conv("encoder.fuse_lowres", "encoder/fuse_lowres", bias=True)

    # decoder: convs.0 is the Identity (latent0 already at decoder width)
    for i in range(1, 5):
        conv(f"decoder.convs.{i}", f"decoder/conv_{i}", bias=False)
    for i in range(5):
        fk = f"decoder/fusion_{i}"
        # resnetN is Sequential(ReLU, Conv, ReLU, Conv): convs at .1/.3
        for rn in ("resnet1", "resnet2"):
            conv(f"decoder.fusions.{i}.{rn}.1", f"{fk}/{rn}/conv1", bias=True)
            conv(f"decoder.fusions.{i}.{rn}.3", f"{fk}/{rn}/conv2", bias=True)
        if i != 0:
            convT(f"decoder.fusions.{i}.deconv", f"{fk}/deconv", bias=False)
        conv(f"decoder.fusions.{i}.out_conv", f"{fk}/out_conv", bias=True)

    # depth head (Sequential indices 0/1/2/4; 3 and 5 are ReLUs)
    conv("head.0", "head_conv1", bias=True)
    convT("head.1", "head_deconv", bias=True)
    conv("head.2", "head_conv2", bias=True)
    conv("head.4", "head_out", bias=True)

    if cfg.use_fov_head:
        if cfg.use_fov_encoder:
            m["fov.encoder.1.weight"] = ("fov/encoder_linear/kernel", _t_linear)
            m["fov.encoder.1.bias"] = ("fov/encoder_linear/bias", _t_none)
            conv("fov.downsample.0", "fov/downsample_conv", bias=True)
            conv("fov.head.0", "fov/head_conv0", bias=True)
            conv("fov.head.2", "fov/head_conv1", bias=True)
            conv("fov.head.4", "fov/head_out", bias=True)
        else:
            # without the fov encoder the downsample conv folds into head.0
            conv("fov.head.0", "fov/downsample_conv", bias=True)
            conv("fov.head.2", "fov/head_conv0", bias=True)
            conv("fov.head.4", "fov/head_conv1", bias=True)
            conv("fov.head.6", "fov/head_out", bias=True)
    return m


def _hf_mapping(cfg) -> dict:
    """transformers DepthProForDepthEstimation non-ViT tensors."""
    m: dict[str, tuple[str, callable]] = {}

    def conv(tk, fk, bias):
        m[f"{tk}.weight"] = (f"{fk}/kernel", _t_conv)
        if bias:
            m[f"{tk}.bias"] = (f"{fk}/bias", _t_none)

    def convT(tk, fk, bias):
        m[f"{tk}.weight"] = (f"{fk}/kernel", _t_convT)
        if bias:
            m[f"{tk}.bias"] = (f"{fk}/bias", _t_none)

    up = "depth_pro.neck.feature_upsample"
    convT(f"{up}.image_block.layers.0", "encoder/upsample_lowres", bias=True)
    # scaled_images are listed lowest-resolution first in HF; ours follow
    # Apple's upsample2 (coarse) / upsample1 (mid) / upsample0 (fine)
    for hf_i, name in ((0, "upsample2"), (1, "upsample1"), (2, "upsample0")):
        conv(f"{up}.scaled_images.{hf_i}.layers.0",
             f"encoder/{name}/proj", bias=False)
        convT(f"{up}.scaled_images.{hf_i}.layers.1",
              f"encoder/{name}/deconv0", bias=False)
    # intermediate[0] = 2-deconv chain (hook_block_ids[1]),
    # intermediate[1] = 3-deconv chain (hook_block_ids[0])
    for hf_i, (name, n_up) in ((0, ("upsample_latent1", 2)),
                               (1, ("upsample_latent0", 3))):
        conv(f"{up}.intermediate.{hf_i}.layers.0",
             f"encoder/{name}/proj", bias=False)
        for k in range(n_up):
            convT(f"{up}.intermediate.{hf_i}.layers.{k + 1}",
                  f"encoder/{name}/deconv{k}", bias=False)
    conv("depth_pro.neck.fuse_image_with_low_res", "encoder/fuse_lowres",
         bias=True)
    # projections are lowest-res first: 0 -> conv_4 (global) ... 3 -> conv_1;
    # index 4 is the Identity
    for hf_i, mine in ((0, 4), (1, 3), (2, 2), (3, 1)):
        conv(f"depth_pro.neck.feature_projection.projections.{hf_i}",
             f"decoder/conv_{mine}", bias=False)

    # fusion stage: intermediate[0..3] = our fusion_4..fusion_1 (coarse to
    # fine), final = fusion_0 (no deconv)
    def fusion(tk, fk, deconv):
        for hf_rn, rn in (("residual_layer1", "resnet1"),
                          ("residual_layer2", "resnet2")):
            conv(f"{tk}.{hf_rn}.convolution1", f"{fk}/{rn}/conv1", bias=True)
            conv(f"{tk}.{hf_rn}.convolution2", f"{fk}/{rn}/conv2", bias=True)
        if deconv:
            convT(f"{tk}.deconv", f"{fk}/deconv", bias=False)
        conv(f"{tk}.projection", f"{fk}/out_conv", bias=True)

    for hf_i, mine in ((0, 4), (1, 3), (2, 2), (3, 1)):
        fusion(f"fusion_stage.intermediate.{hf_i}", f"decoder/fusion_{mine}",
               deconv=True)
    fusion("fusion_stage.final", "decoder/fusion_0", deconv=False)

    conv("head.layers.0", "head_conv1", bias=True)
    convT("head.layers.1", "head_deconv", bias=True)
    conv("head.layers.2", "head_conv2", bias=True)
    conv("head.layers.4", "head_out", bias=True)

    if cfg.use_fov_head:
        conv("fov_model.conv", "fov/downsample_conv", bias=True)
        conv("fov_model.head.layers.0", "fov/head_conv0", bias=True)
        conv("fov_model.head.layers.2", "fov/head_conv1", bias=True)
        conv("fov_model.head.layers.4", "fov/head_out", bias=True)
        if cfg.use_fov_encoder:
            m["fov_model.fov_encoder.neck.weight"] = (
                "fov/encoder_linear/kernel", _t_linear)
            m["fov_model.fov_encoder.neck.bias"] = (
                "fov/encoder_linear/bias", _t_none)
    return m


def _interp_pos_embed(pos: np.ndarray, want_tokens: int) -> np.ndarray:
    """Bicubic-resize a [1, 1+S^2, D] position table to [1, want_tokens, D]
    (checkpoints may be trained at a different tile resolution)."""
    if pos.shape[1] == want_tokens:
        return pos
    from vsc_tpu.models.vit import interpolate_pos_embedding
    src_grid = int(round((pos.shape[1] - 1) ** 0.5))
    dst_grid = int(round((want_tokens - 1) ** 0.5))
    return np.asarray(interpolate_pos_embedding(pos, src_grid, dst_grid))


def _detect_format(state: dict) -> str:
    if any(k.startswith(("depth_pro.", "fusion_stage.")) for k in state):
        return "hf"
    if any(k.startswith("encoder.patch_encoder.") for k in state):
        return "apple"
    raise ConversionError(
        "unrecognized checkpoint format: expected Apple ml-depth-pro keys "
        "(encoder.patch_encoder.*) or transformers DepthPro keys "
        "(depth_pro.*/fusion_stage.*)")


def convert_state_dict(state: dict, model) -> dict:
    """Torch state dict (Apple or HF format) -> {flax_flat_name: ndarray}.
    Pure mapping; completeness is enforced by convert_torch_checkpoint."""
    cfg = model.cfg
    depth = cfg.encoder.depth
    fmt = _detect_format(state)
    converted: dict[str, np.ndarray] = {}

    if fmt == "apple":
        vits = [("encoder.patch_encoder.", "encoder/patch_encoder/"),
                ("encoder.image_encoder.", "encoder/image_encoder/")]
        if cfg.use_fov_head and cfg.use_fov_encoder:
            vits.append(("fov.encoder.0.", "fov/encoder_vit/"))
        for tprefix, fprefix in vits:
            if f"{tprefix}cls_token" not in state:
                continue  # absent ViT: reported as unmapped params below
            for rel, arr in convert_vit_state(
                    state, tprefix, depth, cfg.encoder.num_heads).items():
                converted[f"{fprefix}{rel}"] = arr
        table = _apple_mapping(cfg)
    else:
        vits = [("depth_pro.encoder.patch_encoder.model.",
                 "encoder/patch_encoder/"),
                ("depth_pro.encoder.image_encoder.model.",
                 "encoder/image_encoder/")]
        if cfg.use_fov_head and cfg.use_fov_encoder:
            vits.append(("fov_model.fov_encoder.model.", "fov/encoder_vit/"))
        for tprefix, fprefix in vits:
            if f"{tprefix}embeddings.cls_token" not in state:
                continue  # absent ViT: reported as unmapped params below
            for rel, arr in convert_hf_dinov2_state(
                    state, tprefix, depth, cfg.encoder.num_heads).items():
                converted[f"{fprefix}{rel}"] = arr
        table = _hf_mapping(cfg)

    for tkey, (fkey, transform) in table.items():
        if tkey not in state:
            # completeness (and the strict/partial policy) is enforced by
            # convert_torch_checkpoint against the model's parameter tree
            continue
        converted[fkey] = transform(state[tkey])
    return converted


def convert_torch_checkpoint(ckpt_path: Path | str, model, rng=None,
                             verbose: bool = True,
                             allow_partial: bool | None = None):
    """Convert a DepthPro torch checkpoint (Apple ml-depth-pro or
    transformers format) into our parameter tree. Raises ConversionError
    unless EVERY model parameter is covered with matching shape (after
    position-embedding interpolation) — a real checkpoint must yield real
    depth. allow_partial=True (or VSC_TPU_ALLOW_PARTIAL_CONVERT=1) downgrades
    missing tensors to a warning for development experiments."""
    import torch
    import jax
    import jax.numpy as jnp

    if allow_partial is None:
        allow_partial = os.environ.get(
            "VSC_TPU_ALLOW_PARTIAL_CONVERT", "") not in ("", "0")

    ckpt_path = Path(ckpt_path)
    if not ckpt_path.exists():
        raise FileNotFoundError(ckpt_path)
    if ckpt_path.suffix == ".safetensors":
        # the format apple/DepthPro-hf ships (models/bootstrap.py);
        # torch loader handles bf16/f16 tensors numpy can't represent
        from safetensors.torch import load_file
        state = {k: v.float() for k, v in load_file(str(ckpt_path)).items()}
    else:
        try:
            # weights_only: never execute pickled code from a downloaded .pt
            state = torch.load(str(ckpt_path), map_location="cpu",
                               weights_only=True)
        except TypeError:  # torch < 1.13 has no weights_only kwarg
            state = torch.load(str(ckpt_path), map_location="cpu")
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    state = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
             for k, v in state.items()}

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, model.cfg.img_size, model.cfg.img_size, 3),
                      jnp.float32)
    from flax.core import meta
    params = meta.unbox(model.init(rng, dummy)["params"])
    flat = _flatten(params)

    converted = convert_state_dict(state, model)

    applied = 0
    problems = []
    for name, want_leaf in flat.items():
        want = tuple(want_leaf.shape)
        if name not in converted:
            problems.append(f"unmapped model parameter: {name} {want}")
            continue
        arr = converted[name]
        if "pos_embed" in name and arr.shape != want:
            arr = _interp_pos_embed(arr, want[1])
        if tuple(arr.shape) != want:
            problems.append(
                f"shape mismatch {name}: checkpoint {arr.shape} vs "
                f"model {want}")
            continue
        flat[name] = arr.astype(np.asarray(want_leaf).dtype)
        applied += 1

    unused = sorted(set(converted) - set(flat))
    if problems:
        msg = (f"checkpoint conversion incomplete "
               f"({applied}/{len(flat)} tensors mapped):\n  "
               + "\n  ".join(problems[:20]))
        if not allow_partial:
            raise ConversionError(
                msg + "\nRefusing to run with partially-random weights; set "
                "VSC_TPU_ALLOW_PARTIAL_CONVERT=1 to override for experiments.")
        print(f"WARNING: {msg}")
    if verbose:
        print(f"convert_torch_checkpoint: {applied}/{len(flat)} tensors "
              f"converted, 0 kept initialization"
              if not problems else
              f"convert_torch_checkpoint: {applied}/{len(flat)} tensors "
              f"converted ({len(problems)} kept initialization)")
        if unused:
            print(f"  note: {len(unused)} converted tensors unused by the "
                  f"model (e.g. {unused[0]})")

    leaves_paths, treedef = jax.tree_util.tree_flatten_with_path(params)
    new_leaves = []
    for keypath, _ in leaves_paths:
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in keypath)
        new_leaves.append(jnp.asarray(flat[name]))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
