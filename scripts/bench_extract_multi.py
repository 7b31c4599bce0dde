#!/usr/bin/env python
"""Measure the selector-extraction cost: per-candidate passes vs the shared
multi-threshold pass (VERDICT r3 item 6 'Done' criterion: >=3x single-chip
on the DTU-conf protocol).

Runs the FIELD-QUERY side of selector extraction (grid + features + point
shift, the device-bound ~95% of the 10:55 measured r3 wall; the host fit is
identical either way) on a trained checkpoint at the DTU conf's 256^3
protocol, both ways, plus the probe build, and prints one JSON line.

Env: BEM_CONF (path to a *_standin.conf, default e2e_dtu200k_s7), BEM_RES
(conf's resolution), BEM_THRESHOLDS (the conf's auto_threshold menu).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

CONF = os.environ.get("BEM_CONF", "e2e_dtu200k_s7/DTU_standin.conf")
THRESHOLDS = [float(t) for t in os.environ.get(
    "BEM_THRESHOLDS", "0.005 0.0075 0.01 0.015 0.02 0.03").split()]


def main() -> None:
    from emap_tpu import config
    from emap_tpu.extract.pointcloud import (
        extract_pointcloud,
        extract_pointcloud_multi,
    )
    from emap_tpu.train.runner import Runner

    conf = config.parse_file(CONF)
    runner = Runner(conf, mode="extract_edge")
    runner.load_checkpoint()
    ee = conf["edge_extraction"]
    res = int(os.environ.get("BEM_RES", ee["resolution"]))
    kw = dict(
        sampling_N=ee["sampling_N"], sampling_delta=ee["sampling_delta"],
        is_pointshift=ee["is_pointshift"], iters=ee["iters"],
        is_linedirection=ee["is_linedirection"],
    )
    params = runner.state.params["udf"]

    # warm both compiled paths once at a tiny grid so the comparison is
    # steady-state (persistent cache makes this cheap on repeats)
    extract_pointcloud(params, runner.ucfg, resolution=32,
                       udf_threshold=THRESHOLDS[-1], **kw)
    extract_pointcloud_multi(params, runner.ucfg, resolution=32,
                             thresholds=THRESHOLDS, **kw)

    t0 = time.time()
    sizes_old = {}
    for thr in THRESHOLDS:
        pts, _ = extract_pointcloud(
            params, runner.ucfg, resolution=res, udf_threshold=thr, **kw
        )
        sizes_old[str(thr)] = len(pts)
    t_old = time.time() - t0

    t0 = time.time()
    out = extract_pointcloud_multi(
        params, runner.ucfg, resolution=res, thresholds=THRESHOLDS, **kw
    )
    t_new = time.time() - t0
    sizes_new = {str(t): len(v[0]) for t, v in out.items()}

    row = {
        "conf": CONF, "resolution": res, "k_candidates": len(THRESHOLDS),
        "per_candidate_s": round(t_old, 1),
        "shared_multi_s": round(t_new, 1),
        "speedup": round(t_old / t_new, 2),
        "sizes_match": sizes_old == sizes_new,
        "sizes": sizes_new,
    }
    print(json.dumps(row))
    with open("parity_results/bench_extract_multi.json", "w") as f:
        json.dump(row, f, indent=1)


if __name__ == "__main__":
    main()
