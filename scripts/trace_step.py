#!/usr/bin/env python
"""TPU profiler trace of the production train step + device-time attribution
(VERDICT r1 item 8).

Runs the production-shaped train step (ABC conf dims, 1024 rays) for
TRACE_STEPS steps inside a `jax.profiler` window, then parses the emitted
chrome-trace (plugins/profile/*/…trace.json.gz) and prints a per-op
device-time table: total device-track time per op name over the window,
divided by the number of profiled steps. This replaces the ablation-only
attribution of the residual non-kernel time (scripts/ablate_step.py) with a
trace-backed one.

The chained production loop dispatches the SAME compiled step body inside a
lax.scan (train/runner.py); profiling per-dispatch here traces that body
with per-op resolution, which is exactly the per-step cost attribution the
chained program amortizes.

Env: TRACE_STEPS (20), TRACE_OUT (/tmp/emap_trace), TRACE_BATCH (1024).
Usage: python scripts/trace_step.py            # profile + summarize (TPU)
       python scripts/trace_step.py summarize <dir>   # re-summarize only
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

STEPS = int(os.environ.get("TRACE_STEPS", "20"))
OUT = os.path.abspath(os.environ.get("TRACE_OUT", "/tmp/emap_trace"))
BATCH = int(os.environ.get("TRACE_BATCH", "1024"))


def _device_tracks(trace: dict):
    """Yield (pid, track_name) for device (TPU/accelerator) chrome-trace
    process tracks; host python/runtime threads are excluded."""
    names = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            names[ev["pid"]] = ev.get("args", {}).get("name", "")
    for pid, name in names.items():
        low = name.lower()
        if any(k in low for k in ("tpu", "device", "xla", "/device:")):
            if "host" not in low:
                yield pid, name


def summarize(trace_dir: str, steps: int) -> dict:
    """Per-op device time per step, grouped by trace lane.

    The chrome trace nests three device lanes — "XLA Modules" (whole
    program spans), "XLA Ops" (the real per-op attribution), and "Steps"
    (per-dispatch markers) — so summing everything double-counts; each lane
    is reported separately and the Ops lane is the attribution table."""
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        raise SystemExit(f"no .trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    dev_pids = dict(_device_tracks(trace))
    if not dev_pids:  # CPU smoke fallback: take every named process track
        dev_pids = {
            ev["pid"]: ev.get("args", {}).get("name", "?")
            for ev in trace.get("traceEvents", [])
            if ev.get("ph") == "M" and ev.get("name") == "process_name"
        }
    tid_names = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            tid_names[(ev["pid"], ev["tid"])] = (
                ev.get("args", {}).get("name", "?")
            )
    per_lane_op = defaultdict(lambda: defaultdict(float))
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        lane = tid_names.get((ev["pid"], ev.get("tid")), "?")
        per_lane_op[lane][ev.get("name", "?")] += float(ev.get("dur", 0.0))
    report = {"steps": steps, "lanes": {}}
    for lane, per_op in sorted(per_lane_op.items()):
        total = sum(per_op.values())
        print(f"\n== lane '{lane}': {total/1e3/steps:.3f} ms/step total")
        print(f"{'ms/step':>9}  {'%':>5}  op")
        kept = []
        for name, us in sorted(per_op.items(), key=lambda kv: -kv[1])[:20]:
            print(f"{us/1e3/steps:9.3f}  {100*us/total:5.1f}  {name[:90]}")
            kept.append({"op": name,
                         "ms_per_step": round(us / 1e3 / steps, 4),
                         "pct": round(100 * us / total, 2)})
        report["lanes"][lane] = {
            "total_ms_per_step": round(total / 1e3 / steps, 3), "ops": kept,
        }
    return report


def profile() -> None:
    import jax

    from emap_tpu.train.runner import Runner
    from emap_tpu.train.step import build_packed_train_step

    # Reuse the e2e production-shaped conf so the traced step is the same
    # program the CLI compiles (build_conf from the shared driver).
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from e2e_synthetic import build_conf

    scene_dir = os.path.join(OUT, "scene")
    conf = build_conf(scene_dir, steps=1000, batch=BATCH)
    runner = Runner(conf, mode="train")
    step_fn = build_packed_train_step(
        runner.tcfg, runner.rcfg, runner.ucfg, runner.scene.n_images,
        mesh=runner.mesh,
    )

    state = runner.state
    for _ in range(5):  # warm up (compile) outside the trace window
        state, vec = step_fn(state, runner.pool)
    jax.block_until_ready(vec)
    jax.profiler.start_trace(OUT)
    for _ in range(STEPS):
        state, vec = step_fn(state, runner.pool)
    jax.block_until_ready(vec)
    jax.profiler.stop_trace()
    print(f"trace written to {OUT}")
    report = summarize(OUT, STEPS)
    with open(os.path.join(OUT, "trace_summary.json"), "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "summarize":
        summarize(sys.argv[2] if len(sys.argv) > 2 else OUT,
                  int(os.environ.get("TRACE_STEPS", str(STEPS))))
    else:
        profile()
