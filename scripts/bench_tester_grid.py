#!/usr/bin/env python3
"""
BASELINE.json config 4: the sbs_tester parameter-grid workload, measured
===========================================================================

The reference scenario is the interactive tester regenerating the preview
after each slider change (/root/reference/sbs_tester.py:523-707 — one GPU
process_frame per parameter set, per frame). Our headless equivalent runs
the same workload as batched TPU dispatches (`sbs_tester.py --grid`); this
script builds a synthetic 1080p workflow, runs a representative grid, and
prints ONE JSON line with the steady-state numbers.

Notes on honesty: every distinct StereoParams is a separate XLA program
(output geometry depends on the values), so first-call times include the
remote-relay compile — reported separately; `steady_fps` is what an
interactive user gets after the (cached-on-disk) compile. Grid size is
kept small for relay-compile reasons; scale with --grid.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--grid", type=str,
                    default="max_disparity=30,50;depth_gamma=0.5,1.0")
    args = ap.parse_args()

    from vsc_tpu.config import load_config
    from vsc_tpu.io.media import vscmedia_path
    from vsc_tpu.pipeline import depth_map_generator, frame_extractor
    from vsc_tpu.pipeline.sbs_tester import run_grid
    from vsc_tpu.pipeline.workflow_init import init_workflow

    tmp = Path(tempfile.mkdtemp(prefix="bench_grid_"))
    clip = tmp / "clip.mkv"
    subprocess.run(
        [str(vscmedia_path()), "makevideo", "--output", str(clip),
         "--width", str(args.width), "--height", str(args.height),
         "--frames", str(args.frames), "--framerate", "24"],
        check=True, capture_output=True)
    wf = init_workflow(clip, tmp / "wf")
    config = load_config(wf)
    assert frame_extractor.run(wf, config)
    assert depth_map_generator.run(wf, config, interactive=False,
                                   model_name="stub", input_size=384)

    out_dir = tmp / "grid_out"
    t0 = time.perf_counter()
    ok = run_grid(wf, config, args.grid, args.frames, out_dir)
    wall = time.perf_counter() - t0
    assert ok
    report = json.loads((out_dir / "grid_report.json").read_text())
    steady = [r["frames_per_s"] for r in report]
    print(json.dumps({
        "metric": "sbs_tester parameter grid (BASELINE.json config 4)",
        "value": round(sum(steady) / len(steady), 3),
        "unit": "frames/sec steady-state (mean over parameter sets)",
        "detail": {
            "resolution": f"{args.width}x{args.height}",
            "grid": args.grid,
            "param_sets": len(report),
            "frames_per_set": args.frames,
            "steady_fps_per_set": steady,
            "first_call_s_per_set": [r["first_call_s"] for r in report],
            "sweep_wall_s_incl_compiles": round(wall, 1),
            "reference_scenario": "/root/reference/sbs_tester.py:523-707",
        },
    }))


if __name__ == "__main__":
    main()
