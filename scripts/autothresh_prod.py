#!/usr/bin/env python
"""Production-protocol auto-threshold suite: re-extract the trained
production checkpoints (prod_suite/s*, e2e_prod_abc for seed 42 — conf
verbatim ABC, 50k x 1024, res-128 extraction) with
edge_extraction.auto_threshold candidates instead of the fixed 0.02, and
score both against the analytic wireframe GT.

Reports, per seed: the fixed-threshold production F@5mm (from the recorded
report.json), the auto-selected threshold, its F@5mm, and the oracle best —
the production-settings counterpart of scripts/validate_autothresh.py.

Env: AP_DIRS (default "e2e_prod_abc prod_suite/s7 prod_suite/s99
prod_suite/s3 prod_suite/s1234" — missing dirs skipped), AP_THRESHOLDS
("0.02 0.03 0.04 0.05"). Writes prod_suite/autothresh_prod.json.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

from e2e_synthetic import score_extraction  # noqa: E402

DIRS = os.environ.get(
    "AP_DIRS",
    "e2e_prod_abc prod_suite/s7 prod_suite/s99 prod_suite/s3 "
    "prod_suite/s1234",
).split()
THRESHOLDS = [float(t) for t in
              os.environ.get("AP_THRESHOLDS", "0.02 0.03 0.04 0.05").split()]


def run_dir(out: str) -> dict | None:
    from emap_tpu import config
    from emap_tpu.extract.autothresh import (
        build_probe_points,
        pick_candidate,
        score_edges_2d,
        score_edges_3d,
    )
    from emap_tpu.train.runner import Runner

    import glob as _glob

    confs = _glob.glob(os.path.join(REPO, out, "*_standin.conf"))
    report_path = os.path.join(REPO, out, "report.json")
    if not (confs and os.path.isfile(report_path)):
        print(f"skip {out} (no conf/report)", flush=True)
        return None
    conf = config.parse_file(confs[0])
    report = json.load(open(report_path))
    runner = Runner(conf, mode="extract_edge")
    runner.load_checkpoint()
    ee = conf.get_config("edge_extraction")
    # AP_RES overrides the conf's extraction resolution (e.g. the DTU conf
    # pins 256^3, ~80 min/extraction on the CPU fallback; the selector's
    # ranking question is internally consistent at any single resolution —
    # only f5_production_fixed, recorded at the conf resolution, stops
    # being apples-to-apples)
    res = int(os.environ.get("AP_RES", "0")) or ee.get_int("resolution")
    probe = build_probe_points(
        runner.state.params["udf"], runner.ucfg,
        res, max(THRESHOLDS),
        sampling_N=ee.get_int("sampling_N"),
        sampling_delta=ee.get_float("sampling_delta"),
    )
    print(json.dumps({"dir": out, "n_probe": len(probe)}), flush=True)

    rows = []
    for thr in THRESHOLDS:
        edge_dict = runner.extract_edge(
            resolution=res,
            udf_threshold=thr,
            sampling_N=ee.get_int("sampling_N"),
            sampling_delta=ee.get_float("sampling_delta"),
            is_pointshift=ee.get_bool("is_pointshift"),
            iters=ee.get_int("iters"),
            is_linedirection=ee.get_bool("is_linedirection"),
            visible_checking=ee.get_bool("visible_checking"),
        )
        gt = score_extraction(runner.base_exp_dir, edge_dict, "cube")
        s2d = score_edges_2d(edge_dict, runner.scene.data_dir,
                             runner.scene.detector)
        s3d = score_edges_3d(edge_dict, probe)
        rows.append({"udf_threshold": thr, "f5_gt": gt["fscore_0.005"],
                     "f10_gt": gt["fscore_0.01"],
                     # fragment counts: the seed-3 r4 production run picked
                     # an over-fragmented candidate (70 lines vs 22-34 on
                     # healthy seeds); record them so any future
                     # fragmentation-aware selection rule can be replayed
                     # on archived tables (the pre-r4 tables lack these)
                     "n_lines": len(edge_dict.get("lines_end_pts", [])),
                     "n_curves": len(edge_dict.get("curves_ctl_pts", [])),
                     **s2d, **s3d})
        print(json.dumps({"dir": out, **rows[-1]}), flush=True)

    f5 = np.array([r["f5_gt"] for r in rows])
    pick = pick_candidate(rows)  # THE shipped rule
    return {
        "dir": out,
        "seed": report.get("seed", 42),  # the r4 seed-42 report predates the key
        "f5_production_fixed": report["score"]["fscore_0.005"],
        "picked_threshold": THRESHOLDS[pick],
        "f5_picked": float(f5[pick]),
        "f5_oracle_best": float(f5.max()),
        "rows": rows,
    }


def main() -> None:
    results = [r for r in (run_dir(d) for d in DIRS) if r]
    fixed = [r["f5_production_fixed"] for r in results]
    picked = [r["f5_picked"] for r in results]
    summary = {
        "thresholds": THRESHOLDS,
        "results": results,
        "mean_f5_fixed": round(float(np.mean(fixed)), 4),
        "mean_f5_picked": round(float(np.mean(picked)), 4),
        "std_f5_fixed": round(float(np.std(fixed)), 4),
        "std_f5_picked": round(float(np.std(picked)), 4),
    }
    out_path = os.environ.get(
        "AP_OUT", os.path.join(REPO, "prod_suite", "autothresh_prod.json")
    )
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: summary[k] for k in summary if k != "results"}))


if __name__ == "__main__":
    main()
