"""
Streaming converter (TPU-native fast path)
==========================================

Fuses frame extraction, depth estimation, SBS generation and chunk encoding
into ONE streaming process with no PNG intermediates:

  vscmedia decode (raw RGB pipe) -> device batches -> depth jit -> SBS jit
    -> raw RGB pipe -> vscmedia x265 encoder -> chunks/sbs_XXXXXX_YYYYYY.mkv

This is the "streaming upgrade" SURVEY.md section 2 calls out: the
reference's biggest structural inefficiency is the PNG round-trip between
every step (frames/ -> depth_maps/ -> sbs/ each hit disk as images,
~5 GB/1000 frames at 1080p, README.md:358). Here only encoded video chunks
touch disk; resume still works at chunk granularity because the output
uses the standard chunk naming, and the standard video_concatenator
finishes the job (including the audio mux).

The classic step-by-step CLIs remain the compatible path; this command is
the performance path:

    python stream_convert.py <workflow>          # all remaining frames
    python stream_convert.py <workflow> --chunk-size 300
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

from vsc_tpu.config import ConfigError, StereoParams, get_path, load_config


class AccelFailure(RuntimeError):
    """Accelerator health probe failed mid-stream (exit 100 contract)."""


# Health-probe cadence: roughly every this many frames (the reference probes
# per frame, sbs_generator.py:312-317; per ~64 frames amortizes the ~38 ms
# probe round-trip to <1 ms/frame while still catching a wedge in seconds).
PROBE_EVERY_FRAMES = int(os.environ.get("VSC_TPU_STREAM_PROBE_FRAMES", "64"))
# Per-dispatch deadline once warm (first dispatch may compile for minutes
# through the remote-compile relay; a warm batch takes ~2 s).
DISPATCH_TIMEOUT = float(os.environ.get("VSC_TPU_DISPATCH_TIMEOUT", "120"))
DISPATCH_COLD_TIMEOUT = float(
    os.environ.get("VSC_TPU_DISPATCH_COLD_TIMEOUT", "900"))


def _free_space_cleanup(workflow_path: Path, config: dict, upto: int) -> None:
    """Streaming produces no intermediates, but a workflow partially
    processed by the step pipeline may hold frames/depth/SBS PNGs that the
    encoded chunks now supersede. Honor the step pipeline's free_space
    semantics for frames <= upto: sbs_generator mode deletes frames/depth,
    chunk_generator 'sbs'/'all' deletes SBS images (keeping the last frame
    for chunk overlap, reference chunk_generator.py:455-466)."""
    from vsc_tpu.config import get_path
    from vsc_tpu.utils.frame_utils import extract_frame_number

    fs = config.get("free_space", {})
    sbs_mode = fs.get("sbs_generator", "none")
    chunk_mode = fs.get("chunk_generator", "none")
    targets = []
    if sbs_mode in ("frame", "all"):
        targets.append((get_path(workflow_path, config, "frames"), upto))
    if sbs_mode in ("depth", "all"):
        targets.append((get_path(workflow_path, config, "depth_maps"), upto))
    if chunk_mode in ("sbs", "all"):
        targets.append((get_path(workflow_path, config, "sbs"), upto - 1))
    for directory, limit in targets:
        if not directory.is_dir():
            continue
        for f in directory.iterdir():
            n = extract_frame_number(f.name)
            if 0 < n <= limit:
                f.unlink(missing_ok=True)


def run(workflow_path: Path, config: dict, *, batch_size: int = 4,
        chunk_size: int = 1500, model_name: str | None = None,
        input_size: int = 1536, concat: bool = True) -> bool:
    import numpy as np
    from tqdm import tqdm

    from vsc_tpu.io.media import RawFrameSink, decode_frames
    from vsc_tpu.io.probe import probe_video
    from vsc_tpu.parallel.auto import device_count, pad_to_multiple, shard_batch
    from vsc_tpu.parallel.health import (check_accelerator_health,
                                         run_with_deadline)
    from vsc_tpu.pipeline.chunk_generator import find_chunks
    from vsc_tpu.pipeline.depth_map_generator import CHECKPOINT_ENV, build_depth_fn
    from vsc_tpu.ops.stereo import generate_sbs
    from vsc_tpu.utils.profiling import Throughput, trace

    input_video = get_path(workflow_path, config, "input_video")
    chunks_dir = get_path(workflow_path, config, "chunks")
    chunks_dir.mkdir(parents=True, exist_ok=True)

    info = probe_video(input_video)
    if not info:
        print(f"ERROR: cannot probe input video: {input_video}")
        return False
    W, H = info["width"], info["height"]
    framerate = info["r_frame_rate"]
    total = int(info["nb_frames"])

    # resume point from existing chunks (frame numbers are 1-based like the
    # extracted-PNG convention; chunk end N means frames 1..N are encoded)
    existing = find_chunks(chunks_dir)
    done_upto = max((e for _, e, _ in existing), default=0)
    if done_upto >= total > 0:
        print("All frames already encoded into chunks.")
    else:
        # same self-bootstrap as the step pipeline: env > npz cache > hub
        from vsc_tpu.models.bootstrap import resolve_checkpoint
        checkpoint = (os.environ.get(CHECKPOINT_ENV) if model_name == "stub"
                      else resolve_checkpoint())
        if model_name is None:
            model_name = "depthpro" if checkpoint else "stub"
        params = StereoParams.from_config(config["stereo"])
        # quantize depth to the same grid the configured disk format would
        # use, so this path matches the step-by-step pipeline bit-for-bit
        use_16bit = bool(config["depth"]["save_16bit"])
        if not check_accelerator_health():
            raise AccelFailure("accelerator health check failed")
        depth_fn = build_depth_fn(model_name, input_size, H, W, use_16bit,
                                  checkpoint)
        # every dispatch shape: full batch, divisible by the device count
        # (the batch axis shards over the data mesh: depth via jit SPMD,
        # SBS via its shard_map form)
        dispatch_n = pad_to_multiple(batch_size, max(device_count(), 1))
        print(f"Streaming {input_video.name}: {W}x{H} @ {framerate}, "
              f"{total} frames, resume from {done_upto}, "
              f"model={model_name}, batch={batch_size}")

        crf = config["encoding"]["crf"]
        preset = config["encoding"]["preset"]

        # Chunk convention matches chunk_generator's: every chunk after the
        # first STARTS at the previous chunk's end frame (1-frame overlap,
        # reference chunk_generator.py:111-137) so resumes that mix the step
        # pipeline and this streaming path never produce the mixed
        # overlap/non-overlap sequence video_concatenator rejects. When
        # resuming we re-decode the boundary frame (decode starts one frame
        # early); within a run the last encoded SBS frame is carried over.
        resume_decode_from = max(done_upto - 1, 0)
        frame_iter = decode_frames(input_video, W, H, start=resume_decode_from)
        pbar = tqdm(total=total, initial=done_upto, unit="frame",
                    mininterval=0.5)
        meter = Throughput()
        frame_no = done_upto    # highest fully-encoded frame number

        # Failure detection (VERDICT r2 #7): a known-answer probe every
        # ~PROBE_EVERY_FRAMES frames PLUS a hang deadline around every
        # dispatch, so a mid-chunk device wedge exits 100 in seconds, not at
        # the 1500-frame chunk boundary (reference probes per frame,
        # sbs_generator.py:312-317).
        probe_every = max(1, -(-PROBE_EVERY_FRAMES // max(batch_size, 1)))
        batches_since_probe = 0
        warmed = [False]  # first dispatch may compile through the relay

        def compute_batch(rgb_np, n):
            def _run():
                sharded = shard_batch(rgb_np)
                depth = depth_fn(sharded)
                return np.asarray(generate_sbs(sharded, depth, params))[:n]
            deadline = (DISPATCH_TIMEOUT if warmed[0]
                        else max(DISPATCH_TIMEOUT, DISPATCH_COLD_TIMEOUT))
            try:
                out = run_with_deadline(_run, deadline)
            except TimeoutError as e:
                raise AccelFailure(str(e)) from e
            warmed[0] = True
            return out

        carry_sbs = None        # encoded SBS of frame `frame_no` (overlap dup)
        if done_upto > 0:
            # boundary frame comes back out of the decoder first; it must be
            # re-rendered (its SBS bytes are not in memory)
            raw = next(frame_iter, None)
            if raw is None:
                print("ERROR: cannot re-decode chunk boundary frame")
                return False
            rgb = np.frombuffer(raw, np.uint8).reshape(1, H, W, 3)
            carry_sbs = compute_batch(np.repeat(rgb, dispatch_n, axis=0), 1)

        with trace("stream_convert"):
            while frame_no < total or total == 0:
                if not check_accelerator_health():
                    raise AccelFailure("accelerator health check failed")
                batches_since_probe = 0
                # one chunk: chunk_size NEW frames (+ the duplicated boundary
                # frame on chunks after the first) into an atomic .mkv
                start_frame = frame_no if frame_no > 0 else 1
                end_target = min(frame_no + chunk_size, total) if total \
                    else frame_no + chunk_size
                out = chunks_dir / f"sbs_{start_frame:06d}_{end_target:06d}.mkv"
                sink = RawFrameSink(out, 2 * W, H, framerate,
                                    crf=crf, preset=preset)
                produced = 0  # NEW frames encoded into this chunk
                try:
                    if carry_sbs is not None:
                        sink.write(carry_sbs.tobytes())
                    eof = False
                    last_sbs = None
                    while frame_no + produced < end_target:
                        raws = []
                        while len(raws) < batch_size:
                            if frame_no + produced + len(raws) >= end_target:
                                break
                            raw = next(frame_iter, None)
                            if raw is None:
                                eof = True
                                break
                            raws.append(raw)
                        if not raws:
                            break
                        rgb = np.frombuffer(b"".join(raws), np.uint8)
                        rgb = rgb.reshape(len(raws), H, W, 3)
                        n = len(raws)
                        if n < dispatch_n:  # pad for static dispatch shape
                            pad = np.repeat(rgb[-1:], dispatch_n - n, axis=0)
                            rgb = np.concatenate([rgb, pad], axis=0)
                        if batches_since_probe >= probe_every:
                            if not check_accelerator_health():
                                raise AccelFailure(
                                    "accelerator health check failed")
                            batches_since_probe = 0
                        sbs = compute_batch(rgb, n)
                        batches_since_probe += 1
                        sink.write(sbs.tobytes())
                        last_sbs = sbs[-1:]
                        produced += n
                        pbar.update(n)
                        meter.add(n)
                        pbar.set_postfix_str(f"{meter.rate:.2f} fps")
                        if eof:
                            break
                except AccelFailure:
                    # propagate the exit-100 contract past the generic handler
                    sink.close(success=False)
                    pbar.close()
                    raise
                except Exception as e:
                    sink.close(success=False)
                    pbar.close()
                    print(f"ERROR: streaming conversion failed: {e}")
                    return False

                if produced == 0:
                    sink.close(success=False)
                    break
                carry_sbs = last_sbs
                actual_end = frame_no + produced
                if actual_end != end_target:
                    # short final chunk: fix the name to the true range
                    sink.close(success=True)
                    fixed = chunks_dir / f"sbs_{start_frame:06d}_{actual_end:06d}.mkv"
                    out.rename(fixed)
                else:
                    sink.close(success=True)
                frame_no = actual_end
                _free_space_cleanup(workflow_path, config, frame_no)
                if eof:
                    break  # decoder ran dry
        pbar.close()
        print(f"Encoded up to frame {frame_no}.")

    if concat:
        from vsc_tpu.pipeline import video_concatenator
        return video_concatenator.run(workflow_path, config)
    return True


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="Streaming video->stereo conversion (no PNG intermediates)")
    parser.add_argument("workflow_path", type=Path)
    parser.add_argument("--cpu", action="store_true")
    # batch 8 measured best depth MFU on v5e (62.9% vs 60.6% at 4); SBS is
    # batch-insensitive, HBM fits at 1080p supersampled
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--chunk-size", type=int, default=1500)
    parser.add_argument("--model", choices=("depthpro", "stub"), default=None)
    parser.add_argument("--input-size", type=int, default=1536)
    parser.add_argument("--no-concat", action="store_true",
                        help="Stop after chunk encoding")
    args = parser.parse_args(argv)

    from vsc_tpu.utils.jax_setup import force_cpu, setup_jax
    if args.cpu:
        force_cpu()
    setup_jax()  # persistent XLA cache + VSC_TPU_FORCE_CPU test hermeticity
    if not args.workflow_path.is_dir():
        print(f"ERROR: Workflow directory not found: {args.workflow_path}")
        return 1
    try:
        config = load_config(args.workflow_path)
    except ConfigError as e:
        print(f"ERROR: {e}")
        return 1
    try:
        ok = run(args.workflow_path, config, batch_size=args.batch_size,
                 chunk_size=args.chunk_size, model_name=args.model,
                 input_size=args.input_size, concat=not args.no_concat)
    except AccelFailure as e:
        from vsc_tpu.parallel.health import ACCEL_ERROR_EXIT_CODE
        print(f"ERROR: {e}")
        return ACCEL_ERROR_EXIT_CODE
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
