"""
Step 3 — SBS stereo generation (TPU)
====================================

Drives the fused, batched stereo pipeline (vsc_tpu.ops.stereo) over all
frame/depth pairs. Replaces /root/reference/sbs_generator.py: same CLI
(--cpu, --no-interactive), same pair discovery (.tif preferred over .png),
same skip-existing resume, same free_space deletion modes, and the same
accelerator-health-check -> exit-code-100 contract the orchestrator relies
on (sbs_generator.py:41-68, 312-317) — except the health probe is a TPU
known-answer jit (vsc_tpu.parallel.health) and frames are processed in
device batches rather than one at a time.
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

from vsc_tpu.config import ConfigError, StereoParams, get_path, load_config

DEFAULT_BATCH = 4


def find_frame_pairs(frames_dir: Path, depth_dir: Path):
    """(frame_path, depth_path, frame_num_str) for every frame that has a
    depth map; reports missing ranges like the reference
    (sbs_generator.py:71-116)."""
    pairs = []
    missing = 0
    first_missing = last_missing = None
    for frame_path in sorted(frames_dir.glob("frame_*.png")):
        num = frame_path.stem.removeprefix("frame_")
        depth_path = depth_dir / f"depth_frame_{num}.tif"
        if not depth_path.exists():
            depth_path = depth_dir / f"depth_frame_{num}.png"
            if not depth_path.exists():
                if first_missing is None:
                    first_missing = num
                last_missing = num
                missing += 1
                continue
        pairs.append((frame_path, depth_path, num))
    if missing:
        print(f"Missing depth maps: {missing} frames in range "
              f"frame_{first_missing} to frame_{last_missing}")
    return pairs


def run(workflow_path: Path, config: dict, *, batch_size=DEFAULT_BATCH,
        interactive=True) -> int:
    """Returns process exit code (0 ok, 1 error, 100 accelerator failure)."""
    import cv2
    import numpy as np
    from tqdm import tqdm

    from vsc_tpu.io.image import load_image_pair
    from vsc_tpu.io.prefetch import PipelineAbort, SaveError, run_pipeline
    from vsc_tpu.ops.stereo import generate_sbs
    from vsc_tpu.parallel.health import ACCEL_ERROR_EXIT_CODE, \
        check_accelerator_health
    from vsc_tpu.utils.console import suppress_cv2_logging

    from vsc_tpu.utils.jax_setup import setup_jax
    setup_jax()  # persistent XLA cache: warm starts after the first run

    frames_dir = get_path(workflow_path, config, "frames")
    depth_dir = get_path(workflow_path, config, "depth_maps")
    output_dir = get_path(workflow_path, config, "sbs")
    for d, name in ((frames_dir, "Frames"), (depth_dir, "Depth")):
        if not d.exists():
            print(f"ERROR: {name} directory not found: {d}")
            return 1
    output_dir.mkdir(parents=True, exist_ok=True)

    params = StereoParams.from_config(config["stereo"])
    print(f"Parameters: {params}")

    free_space_mode = config.get("free_space", {}).get("sbs_generator", "none")
    if free_space_mode != "none":
        print(f"Free space mode: {free_space_mode}")

    all_pairs = find_frame_pairs(frames_dir, depth_dir)
    todo = []
    skipped = 0
    for fp, dp, num in all_pairs:
        if (output_dir / f"sbs_{num}.png").exists():
            skipped += 1
        else:
            todo.append((fp, dp, num))
    print(f"Found: {len(all_pairs)} frame pairs, {skipped} already processed, "
          f"{len(todo)} to process")
    if not todo:
        print("All frames already processed.")
        return 0

    import jax
    print(f"Using: {jax.devices()[0].platform} "
          f"({len(jax.devices())} device(s)), batch={batch_size}")

    if not check_accelerator_health():
        print("\nERROR: accelerator health check failed")
        return ACCEL_ERROR_EXIT_CODE

    accel_failed = []

    from vsc_tpu.parallel.auto import device_count, pad_to_multiple, shard_batch
    ndev = device_count()

    def load_batch(chunk):
        rgbs, depths = [], []
        for fp, dp, _ in chunk:
            rgb, depth = load_image_pair(fp, dp)
            rgbs.append(rgb)
            depths.append(depth)
        # pad ragged final batches up to the FULL batch size: a second shape
        # would compile a second multi-minute program through the relay
        # pad_to_multiple AFTER the max so every dispatch shape is both the
        # full batch size and ndev-divisible (batch_size itself may not be)
        target = pad_to_multiple(max(len(rgbs), batch_size), max(ndev, 1))
        while len(rgbs) < target:
            rgbs.append(rgbs[-1])
            depths.append(depths[-1])
        return np.stack(rgbs), np.stack(depths)

    def compute(batch):
        # per-dispatch health probe: the TPU equivalent of the per-frame GPU
        # known-answer test (sbs_generator.py:312-317)
        if not check_accelerator_health():
            accel_failed.append(True)
            raise PipelineAbort("accelerator health check failed")
        rgbs, depths = batch
        return generate_sbs(shard_batch(rgbs), shard_batch(depths), params)

    def split_results(result, chunk):
        host = np.asarray(result)
        return [(host[i], chunk[i]) for i in range(len(chunk))]

    def save_one(entry):
        sbs, (fp, dp, num) = entry
        out_path = output_dir / f"sbs_{num}.png"
        with suppress_cv2_logging():
            ok = cv2.imwrite(str(out_path), sbs[:, :, ::-1])  # RGB -> BGR
        if not ok:
            return False
        if free_space_mode in ("frame", "all"):
            fp.unlink(missing_ok=True)
        if free_space_mode in ("depth", "all"):
            dp.unlink(missing_ok=True)
        return True

    from vsc_tpu.utils.profiling import trace
    pbar = tqdm(total=len(all_pairs), initial=skipped, unit="img",
                mininterval=0.5)
    try:
        with trace("sbs_generator"):
            done = run_pipeline(todo, load_batch, compute, save_one,
                                split_results, batch_size=batch_size,
                                interactive=interactive,
                                progress_cb=pbar.update)
    except SaveError:
        pbar.close()
        return 1
    pbar.close()
    if accel_failed:
        print("\nERROR: accelerator health check failed - device lost")
        return ACCEL_ERROR_EXIT_CODE
    print(f"Done! Processed {done} of {len(todo)} frames.")
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="Generate side-by-side stereo frames (TPU)")
    parser.add_argument("workflow_path", type=Path)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--no-interactive", action="store_true")
    parser.add_argument("--batch-size", type=int, default=DEFAULT_BATCH)
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
    return run(args.workflow_path, config, batch_size=args.batch_size,
               interactive=not args.no_interactive)


if __name__ == "__main__":
    sys.exit(main())
