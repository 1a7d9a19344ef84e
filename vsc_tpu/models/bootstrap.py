"""Runtime weight acquisition: self-bootstrap like the reference.

The reference downloads its model from the HuggingFace hub on first run and
then just works (/root/reference/depth_map_generator.py:39-64,
``hf_hub_download(repo_id='Jens-Duttke/DepthPro-ONNX-HighPerf', ...)``).
This module gives the TPU framework the same zero-configuration behavior
with the upstream weights the reference's ONNX export was made from:

1. ``$VSC_TPU_DEPTH_CHECKPOINT`` (explicit local checkpoint) wins.
2. A previously converted npz cache (``~/.cache/vsc_tpu/depthpro_hf.npz``)
   is used next — conversion is one-time, later runs are offline-capable.
3. Otherwise ``apple/DepthPro-hf``'s safetensors are downloaded via
   huggingface_hub (respecting HF_HOME / proxies / tokens), converted by
   :mod:`vsc_tpu.models.convert`, and cached as npz.
4. With no network, a precise offline remediation message is printed and
   the caller falls back to the (explicitly labeled) luminance stub.
"""

from __future__ import annotations

import os
from pathlib import Path

CHECKPOINT_ENV = "VSC_TPU_DEPTH_CHECKPOINT"
HF_REPO = "apple/DepthPro-hf"
HF_FILE = "model.safetensors"


def cache_dir() -> Path:
    return Path(os.environ.get("VSC_TPU_CACHE",
                               "~/.cache/vsc_tpu")).expanduser()


def npz_cache_path() -> Path:
    # _v2: the fused-qkv column layout changed to per-head interleaved
    # (models/convert._interleave_qkv) — a cache converted before that
    # would silently produce garbage attention, so the name is versioned
    return cache_dir() / "depthpro_hf_v2.npz"


def resolve_checkpoint(verbose: bool = True) -> str | None:
    """Return a loadable checkpoint path (npz / .pt / .safetensors) or None.

    Mirrors the reference's first-run bootstrap: when nothing is configured
    locally, attempt the hub download. Returns None (stub fallback) only
    after printing the exact offline remediation.
    """
    explicit = os.environ.get(CHECKPOINT_ENV)
    if explicit:
        return explicit
    cached = npz_cache_path()
    if cached.exists():
        if verbose:
            print(f"Using cached converted weights: {cached}")
        return str(cached)
    try:
        from huggingface_hub import hf_hub_download
        if verbose:
            print(f"Downloading depth model weights from {HF_REPO} "
                  "(first run only; cached by huggingface_hub)...")
        return hf_hub_download(repo_id=HF_REPO, filename=HF_FILE)
    except Exception as e:  # network-less sandbox, proxy failure, ...
        if verbose:
            print("\033[33m"
                  f"Could not download {HF_REPO}/{HF_FILE}: {e}\n"
                  "To use real depth weights offline, either:\n"
                  f"  * set {CHECKPOINT_ENV}=/path/to/depth_pro.pt "
                  "(Apple ml-depth-pro checkpoint), or\n"
                  f"  * set {CHECKPOINT_ENV}=/path/to/model.safetensors "
                  "(apple/DepthPro-hf), or\n"
                  f"  * place a converted cache at {cached}\n"
                  "\033[0m")
        return None


def maybe_cache_npz(source_path: str | Path, params) -> None:
    """After converting a hub-downloaded torch checkpoint, persist the
    converted params as npz so later runs skip download + conversion.

    Only fires for files inside the huggingface_hub cache (an explicit
    user checkpoint is the user's to manage); writes atomically.
    """
    src = str(source_path)
    # hub layout marker: <cache>/hub/models--org--name/snapshots/...
    # (match the layout, not the cache dir name — HF_HOME/HF_HUB_CACHE can
    # point anywhere, e.g. /data/hf, and 'huggingface' in the path would
    # then never fire)
    marker = os.sep + "models--"
    if marker not in src:
        return
    from vsc_tpu.models.convert import save_params
    dest = npz_cache_path()
    dest.parent.mkdir(parents=True, exist_ok=True)
    # must end in .npz or np.savez appends the extension itself
    tmp = dest.with_name(dest.stem + ".tmp.npz")
    try:
        save_params(params, tmp)
        os.replace(tmp, dest)
        print(f"Converted weights cached: {dest}")
    except OSError as e:  # cache is an optimization, never fatal
        print(f"(could not write weight cache {dest}: {e})")
        tmp.unlink(missing_ok=True)
