"""
Step 2 — depth map generation (TPU)
===================================

Replaces the reference's onnxruntime DepthPro inference
(/root/reference/depth_map_generator.py) with the batched JAX model:

  reference: 1 frame/call, fp16 ONNX, host-side preprocess + resize +
             normalize (depth_map_generator.py:67-98, 194-250)
  here:      B frames/dispatch; preprocess (resize to 1536^2, /127.5-1),
             inference, resize-back, min-max normalization and u8/u16
             quantization all fused in ONE jit program on the TPU — only
             the final quantized depth maps cross back to the host.

Same CLI (--cpu, --start-frame/--end-frame, --no-interactive), same resume
rule (skip frames whose output exists, depth_map_generator.py:349-360), same
output naming/format (8-bit PNG or 16-bit deflate TIFF + read-back verify).

Model selection: a DepthPro checkpoint is used when configured (see
vsc_tpu.models.convert); otherwise the luminance stub keeps the pipeline
fully functional (this environment has no network egress to fetch weights —
the reference would fail outright here, depth_map_generator.py:43-64).
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
from pathlib import Path

from vsc_tpu.config import ConfigError, get_path, load_config
from vsc_tpu.utils.frame_utils import extract_frame_number

DEFAULT_BATCH = 8
CHECKPOINT_ENV = "VSC_TPU_DEPTH_CHECKPOINT"


def build_depth_fn(model_name: str, input_size: int, out_h: int, out_w: int,
                   use_16bit: bool, checkpoint: str | None):
    """Returns f(u8 frames [B, H, W, 3]) -> quantized depth [B, H, W]
    (uint8 or uint16), fully jit-compiled."""
    from vsc_tpu.utils.jax_setup import setup_jax
    setup_jax()  # persistent XLA cache: warm starts after the first run
    import jax
    import jax.numpy as jnp
    from vsc_tpu.ops.resize import resize

    if model_name == "depthpro":
        from vsc_tpu.models import DepthPro, DepthProConfig, ViTConfig
        from vsc_tpu.models.convert import load_params
        if input_size % 512 != 0:
            raise ValueError(
                "DepthPro input size must be a multiple of 512 (tile = "
                "size/4, ViT/16 token grid must be a multiple of 8); the "
                f"production size is 1536. Got {input_size}.")
        # use_fov_head=False: the pipeline min-max normalizes the depth map
        # (depth_map_generator.py:217-230), so the FOV branch (a third
        # ViT-L) cannot affect the output — canonical inverse depth is
        # computed before the metric scaling. Saves ~1/36 of the ViT work
        # and 304M params of HBM. Checkpoints with fov weights still load
        # (unused tensors are reported, not errors).
        # bf16 compute on TPU (the MXU's native inference precision; params
        # stay f32, accumulation is f32). The saved depth map is min-max
        # normalized so relative precision is what matters. Override with
        # VSC_TPU_DEPTH_DTYPE=float32.
        want = os.environ.get(
            "VSC_TPU_DEPTH_DTYPE",
            "bfloat16" if jax.default_backend() == "tpu" else "float32")
        dtype = jnp.bfloat16 if want == "bfloat16" else jnp.float32
        cfg = DepthProConfig(img_size=input_size,
                             tile_size=input_size // 4,
                             encoder=ViTConfig(img_size=input_size // 4,
                                               dtype=dtype),
                             use_fov_head=False,
                             dtype=dtype)
        model = DepthPro(cfg)
        rng = jax.random.PRNGKey(0)
        dummy = jnp.zeros((1, input_size, input_size, 3), jnp.float32)
        variables = model.init(rng, dummy)
        from flax.core import meta
        params = meta.unbox(variables["params"])
        if checkpoint:
            if str(checkpoint).endswith((".pt", ".pth", ".safetensors")):
                from vsc_tpu.models.bootstrap import maybe_cache_npz
                from vsc_tpu.models.convert import convert_torch_checkpoint
                params = convert_torch_checkpoint(checkpoint, model)
                # hub-downloaded weights: cache the converted npz so later
                # runs are offline-capable (models/bootstrap.py)
                maybe_cache_npz(checkpoint, params)
            else:
                params = load_params(checkpoint, params)
        params = jax.device_put(params)

        def infer(p, x):
            return model.apply({"params": p}, x)["canonical_inverse_depth"]
    elif model_name == "stub":
        from vsc_tpu.models.stub import luminance_depth
        params = ()

        def infer(p, x):
            return luminance_depth(x)
    else:
        raise ValueError(f"unknown depth model: {model_name}")

    max_val = 65535.0 if use_16bit else 255.0
    out_dtype = jnp.uint16 if use_16bit else jnp.uint8

    # params MUST be a jit argument, not a closure: closed-over arrays are
    # captured as program constants (2.5 GB of HLO for the full model).
    @jax.jit
    def depth_fn_impl(p, frames_u8):
        x = frames_u8.astype(jnp.float32)
        # model-size resize + DepthPro normalization (/127.5 - 1,
        # depth_map_generator.py:90-94) — on device, bilinear like cv2
        x = resize(x, input_size, input_size, "bilinear", channel_last=True)
        x = x / 127.5 - 1.0
        depth = infer(p, x)                                # [B, S, S]
        # resize back to the original frame size (bilinear), then per-frame
        # min-max normalize + quantize (depth_map_generator.py:217-236)
        depth = resize(depth, out_h, out_w, "bilinear")
        d_min = depth.min(axis=(1, 2), keepdims=True)
        d_max = depth.max(axis=(1, 2), keepdims=True)
        rng_ = jnp.maximum(d_max - d_min, 1e-12)
        norm = (depth - d_min) / rng_
        return jnp.round(norm * max_val).astype(out_dtype)

    return lambda frames_u8: depth_fn_impl(params, frames_u8)


def run(workflow_path: Path, config: dict, *, start_frame=None, end_frame=None,
        batch_size=DEFAULT_BATCH, interactive=True,
        model_name: str | None = None, input_size: int = 1536) -> bool:
    import cv2
    import numpy as np
    from tqdm import tqdm
    from vsc_tpu.io.image import write_depth_verified
    from vsc_tpu.io.prefetch import SaveError, run_pipeline
    from vsc_tpu.utils.jax_setup import setup_jax

    # BEFORE the first backend touch (the jax.devices() banner below):
    # setup_jax applies VSC_TPU_FORCE_CPU — applied any later, the pinned
    # accelerator platform would already be initialized and the hermetic-
    # test escape hatch (and the XLA cache config) would silently not take.
    setup_jax()

    input_dir = get_path(workflow_path, config, "frames")
    output_dir = get_path(workflow_path, config, "depth_maps")
    use_16bit = config["depth"]["save_16bit"]
    if not input_dir.exists():
        print(f"ERROR: Frames directory not found: {input_dir}")
        return False
    output_dir.mkdir(parents=True, exist_ok=True)

    ext = ".tif" if use_16bit else ".png"
    all_files = sorted(input_dir.glob("frame_*.png"))
    if start_frame is not None or end_frame is not None:
        all_files = [f for f in all_files
                     if (start_frame is None or extract_frame_number(f) >= start_frame)
                     and (end_frame is None or extract_frame_number(f) <= end_frame)]

    todo = []
    skipped = 0
    for f in all_files:
        out = output_dir / f"depth_{f.stem}{ext}"
        if out.exists():
            skipped += 1
        else:
            todo.append((f, out))
    print(f"Found: {len(all_files)} images, {skipped} already processed, "
          f"{len(todo)} to process")
    print(f"Output Format: {'16-bit TIFF' if use_16bit else '8-bit PNG'}")
    if not todo:
        print("All images already processed.")
        return True

    # Probe the frame geometry from the first frame (one video => one size).
    probe = cv2.imread(str(todo[0][0]), cv2.IMREAD_COLOR)
    if probe is None:
        print(f"ERROR: cannot read {todo[0][0]}")
        return False
    H, W = probe.shape[:2]

    # Self-bootstrap like the reference (depth_map_generator.py:39-64):
    # explicit env checkpoint > converted npz cache > hub download; only
    # when all fail does the stub (explicitly labeled) take over.
    from vsc_tpu.models.bootstrap import resolve_checkpoint
    checkpoint = (os.environ.get(CHECKPOINT_ENV) if model_name == "stub"
                  else resolve_checkpoint())
    if model_name is None:
        model_name = "depthpro" if checkpoint else "stub"
    if model_name == "stub":
        print("\033[33mNo depth checkpoint available "
              f"(${CHECKPOINT_ENV} unset, no cache, no network); "
              "using luminance stub model.\033[0m")
    import jax
    print(f"Using: {jax.devices()[0].platform} "
          f"({len(jax.devices())} device(s)), model={model_name}, "
          f"batch={batch_size}")

    depth_fn = build_depth_fn(model_name, input_size, H, W, use_16bit,
                              checkpoint)

    from vsc_tpu.parallel.auto import device_count, pad_to_multiple, shard_batch
    ndev = device_count()

    def load_batch(chunk):
        # pad ragged final batches up to the FULL batch size: a second shape
        # would compile a second multi-minute program through the relay
        # pad_to_multiple AFTER the max so every dispatch shape is both the
        # full batch size and ndev-divisible (batch_size itself may not be)
        n = pad_to_multiple(max(len(chunk), batch_size), ndev)
        frames = np.empty((n, H, W, 3), np.uint8)
        for i, (src, _) in enumerate(chunk):
            img = cv2.imread(str(src), cv2.IMREAD_COLOR)
            if img is None:
                raise IOError(f"cannot read {src}")
            frames[i] = img[:, :, ::-1]  # BGR -> RGB
        frames[len(chunk):] = frames[max(len(chunk) - 1, 0)]
        return frames

    def compute(batch):
        return depth_fn(shard_batch(batch))

    def split_results(result, chunk):
        host = np.asarray(result)  # blocks until the batch is done
        return [(host[i], chunk[i][1]) for i in range(len(chunk))]

    from vsc_tpu.io.image import write_quantized_depth

    def save_one(entry):
        depth_map, out_path = entry
        # already resized+normalized+quantized on device: direct write+verify
        return write_quantized_depth(depth_map, out_path)

    from vsc_tpu.utils.profiling import trace
    pbar = tqdm(total=len(all_files), initial=skipped, unit="img",
                mininterval=0.5)
    try:
        with trace("depth_map_generator"):
            done = run_pipeline(
                todo, load_batch, compute, save_one, split_results,
                batch_size=batch_size, interactive=interactive,
                progress_cb=pbar.update)
    except SaveError:
        pbar.close()
        return False
    pbar.close()
    print(f"Done! Processed {done} of {len(todo)} images.")
    return True


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="Generate depth maps from RGB frames (TPU)")
    parser.add_argument("workflow_path", type=Path)
    parser.add_argument("--start-frame", type=int, default=None)
    parser.add_argument("--end-frame", type=int, default=None)
    parser.add_argument("--cpu", action="store_true",
                        help="Force CPU inference")
    parser.add_argument("--no-interactive", action="store_true")
    parser.add_argument("--batch-size", type=int, default=DEFAULT_BATCH)
    parser.add_argument("--model", choices=("depthpro", "stub"), default=None,
                        help="Depth model (default: depthpro with checkpoint, "
                             "else stub)")
    parser.add_argument("--input-size", type=int, default=1536,
                        help="Model input resolution (reference: 1536)")
    args = parser.parse_args(argv)

    if args.cpu:
        from vsc_tpu.utils.jax_setup import force_cpu
        force_cpu()

    if not args.workflow_path.is_dir():
        print(f"ERROR: Workflow directory not found: {args.workflow_path}")
        return 1
    try:
        config = load_config(args.workflow_path)
    except ConfigError as e:
        print(f"ERROR: {e}")
        return 1
    ok = run(args.workflow_path, config,
             start_frame=args.start_frame, end_frame=args.end_frame,
             batch_size=args.batch_size, interactive=not args.no_interactive,
             model_name=args.model, input_size=args.input_size)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
