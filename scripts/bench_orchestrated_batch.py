#!/usr/bin/env python3
"""
BASELINE.json config 5: orchestrated multi-video batch, measured e2e
====================================================================

The reference scenario is `workflow_orchestrator.py workflows.yaml` over
several videos at once — concurrent step subprocesses, one 4K video and an
audio mux included (/root/reference/workflow_orchestrator.py:1314-1376).
This script builds N synthetic videos (one 4K, with audio), orchestrates
the FULL pipeline end-to-end (classic disk-chunked mode and, separately,
`--streaming`), and prints ONE JSON line per mode with wall-clock.

Sizing: this sandbox host has ONE CPU core and x265 runs on it, so frame
counts are small and the encoder preset is ultrafast — the measurement is
the orchestration + device pipeline, labeled as such (BASELINE.md's
"host-side encode ceiling" documents the encode bound separately).
Depth runs the stub model at 384 (no weights in the sandbox; the depth
TFLOPs are benchmarked by bench.py).
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def build_videos(tmp: Path, frames: int, frames_4k: int):
    from vsc_tpu.io.media import vscmedia_path
    binary = str(vscmedia_path())
    specs = [("v1.mkv", 640, 360, frames, True),
             ("v2.mkv", 640, 360, frames, False),
             ("v4k.mkv", 3840, 2160, frames_4k, True)]
    paths = []
    for name, w, h, n, audio in specs:
        out = tmp / name
        cmd = [binary, "makevideo", "--output", str(out), "--width", str(w),
               "--height", str(h), "--frames", str(n), "--framerate", "24"]
        if audio:
            cmd.append("--audio")
        subprocess.run(cmd, check=True, capture_output=True)
        paths.append(out)
    return paths


def run_batch(tmp: Path, videos, streaming: bool) -> dict:
    import yaml

    from vsc_tpu.config import load_config, save_config
    from vsc_tpu.pipeline.workflow_init import init_workflow

    mode = "streaming" if streaming else "classic"
    wfs = []
    total_frames = 0
    for v in videos:
        wf = init_workflow(v, tmp / f"wf_{mode}_{v.stem}")
        cfg = load_config(wf)
        cfg["encoding"]["preset"] = "ultrafast"  # 1-core host, see docstring
        save_config(wf, cfg)
        wfs.append(wf)
    yaml_path = tmp / f"workflows_{mode}.yaml"
    yaml_path.write_text(yaml.safe_dump({str(w): None for w in wfs}))

    # no checkpoint in the sandbox -> the depth CLI self-selects the
    # luminance stub (depth_map_generator.run model_name=None policy)
    cmd = [sys.executable, str(Path(__file__).resolve().parents[1]
                               / "workflow_orchestrator.py"), str(yaml_path)]
    if streaming:
        cmd.append("--streaming")
    t0 = time.perf_counter()
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    wall = time.perf_counter() - t0

    outputs = {}
    from vsc_tpu.io.probe import probe_video
    ok = True
    for v, wf in zip(videos, wfs):
        out = v.parent / f"{v.stem}_stereo.mkv"
        if out.exists():
            info = probe_video(out)
            outputs[v.name] = {"width": info["width"],
                               "frames": info.get("nb_frames"),
                               "has_audio": info.get("has_audio")}
            total_frames += info.get("nb_frames") or 0
            out.unlink()  # so the other mode regenerates it
        else:
            ok = ok and False
            outputs[v.name] = {"error": "missing output"}
    return {"mode": mode, "ok": ok and r.returncode == 0,
            "wall_s": round(wall, 1),
            "frames_total": total_frames,
            "fps_e2e": round(total_frames / wall, 3),
            "outputs": outputs,
            "orchestrator_tail": r.stdout[-300:] if r.returncode else ""}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--frames-4k", type=int, default=12)
    ap.add_argument("--modes", default="classic,streaming")
    args = ap.parse_args()

    tmp = Path(tempfile.mkdtemp(prefix="bench_orch_"))
    videos = build_videos(tmp, args.frames, args.frames_4k)
    for mode in args.modes.split(","):
        res = run_batch(tmp, videos, streaming=(mode == "streaming"))
        print(json.dumps({
            "metric": "orchestrated multi-video batch e2e "
                      "(BASELINE.json config 5)",
            "value": res["fps_e2e"],
            "unit": "frames/sec wall-clock (3 videos incl. 4K + audio mux, "
                    "stub depth 384, x265 ultrafast on 1 core)",
            "detail": res,
        }))


if __name__ == "__main__":
    main()
