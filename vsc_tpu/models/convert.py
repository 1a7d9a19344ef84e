"""
Checkpoint conversion
=====================

Loads DepthPro weights into the Flax model. The reference downloads an ONNX
export from HuggingFace at runtime (/root/reference/depth_map_generator.py:39-64);
this environment has no network egress and no onnxruntime, so conversion is
gated on a local file in either

  - Apple ml-depth-pro PyTorch checkpoint format (``depth_pro.pt``) via
    torch (CPU): the ViT encoders (timm/DINOv2 module naming — ~97% of the
    629M parameters) convert via the exact mapping below; our DPT decoder
    is a re-design, so decoder/head/FOV tensors that have no 1:1 structural
    counterpart keep their initialization and are reported; or
  - a previously converted npz of our own parameter tree (save_params).

The mapping machinery is unit-tested against synthetic checkpoints with the
timm naming/shapes (tests/test_convert.py); numerical validation against
real weights needs a weights-capable environment.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

__all__ = ["load_params", "save_params", "convert_torch_checkpoint",
           "convert_vit_state"]


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


def convert_vit_state(state: dict, prefix: str, depth: int) -> dict:
    """timm/DINOv2 ViT state-dict entries under `prefix` -> our flat Flax
    names (relative to the ViT module). Returns {flax_name: ndarray}.

    Layout conversions:
      Linear:  torch [out, in]      -> flax kernel [in, out]    (transpose)
      Conv2d:  torch [O, I, kh, kw] -> flax kernel [kh, kw, I, O]
      LayerNorm weight -> scale.
    The fused qkv packs rows as [q | k | v] in both frameworks (our
    reshape (..., 3, heads, head_dim) consumes the same order).
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
        out[f"{dst}attn/qkv/kernel"] = t(f"{src}attn.qkv.weight").T
        out[f"{dst}attn/qkv/bias"] = t(f"{src}attn.qkv.bias")
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


def _interp_pos_embed(pos: np.ndarray, want_tokens: int) -> np.ndarray:
    """Bicubic-resize a [1, 1+S^2, D] position table to [1, want_tokens, D]
    (checkpoints are trained at a different tile resolution)."""
    if pos.shape[1] == want_tokens:
        return pos
    import jax
    from vsc_tpu.models.vit import interpolate_pos_embedding
    src_grid = int(round((pos.shape[1] - 1) ** 0.5))
    dst_grid = int(round((want_tokens - 1) ** 0.5))
    return np.asarray(interpolate_pos_embedding(pos, src_grid, dst_grid))


def convert_torch_checkpoint(ckpt_path: Path | str, model, rng=None,
                             verbose: bool = True):
    """Convert an Apple ml-depth-pro torch checkpoint into our parameter
    tree. Encoder tensors (patch + image + optional fov ViTs) are mapped
    exactly; unmatched tensors keep their random init and are reported."""
    import torch
    import jax
    import jax.numpy as jnp

    ckpt_path = Path(ckpt_path)
    if not ckpt_path.exists():
        raise FileNotFoundError(ckpt_path)
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
    depth = model.cfg.encoder.depth

    converted: dict[str, np.ndarray] = {}
    for tprefix, fprefix in (("encoder.patch_encoder.", "patch_encoder/"),
                             ("encoder.image_encoder.", "image_encoder/")):
        if f"{tprefix}cls_token" not in state:
            continue
        for rel, arr in convert_vit_state(state, tprefix, depth).items():
            converted[f"{fprefix}{rel}"] = arr

    applied = 0
    skipped_shape = []
    for name, arr in converted.items():
        if name not in flat:
            continue
        want = flat[name].shape
        if "pos_embed" in name and arr.shape != want:
            arr = _interp_pos_embed(arr, want[1])
        if arr.shape != tuple(want):
            skipped_shape.append((name, arr.shape, tuple(want)))
            continue
        flat[name] = arr.astype(np.asarray(flat[name]).dtype)
        applied += 1

    missing = sorted(set(flat) - set(converted))
    if verbose:
        print(f"convert_torch_checkpoint: {applied} tensors converted, "
              f"{len(missing)} kept initialization "
              f"(decoder/head/FOV re-design), "
              f"{len(skipped_shape)} shape-skipped")
        for name, got, want in skipped_shape[:5]:
            print(f"  shape mismatch {name}: ckpt {got} vs model {want}")

    # rebuild the tree from the (partially) replaced flat dict
    import jax
    leaves_paths, treedef = jax.tree_util.tree_flatten_with_path(params)
    new_leaves = []
    for keypath, leaf in leaves_paths:
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in keypath)
        new_leaves.append(jnp.asarray(flat[name]))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
