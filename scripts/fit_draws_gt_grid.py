#!/usr/bin/env python
"""GT-score EVERY (threshold x fit-seed) cell of the selector grid on a
trained checkpoint — the oracle table behind the extract_edge(fit_draws=K)
decision. Complements scripts/validate_fit_draws.py (which runs the product
path and reports only the picked cell) by revealing what the picker left on
the table, per cell, on a production-grade checkpoint.

Env: FG_DIR (run dir; default prod_suite_r4/live_s3), FG_SEEDS
("42 0 1 2"), FG_OBJ ("cube"), FG_OUT
(parity_results/fit_draws_gt_grid.json).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

if os.environ.get("FG_PLATFORM"):  # e.g. cpu while the chip is busy —
    import jax                     # config wins over the axon sitecustomize

    jax.config.update("jax_platforms", os.environ["FG_PLATFORM"])

import numpy as np  # noqa: E402

from e2e_synthetic import score_extraction  # noqa: E402

RUN_DIR = os.environ.get("FG_DIR", "prod_suite_r4/live_s3")
SEEDS = [int(s) for s in os.environ.get("FG_SEEDS", "42 0 1 2").split()]
OBJ = os.environ.get("FG_OBJ", "cube")
OUT = os.environ.get("FG_OUT", "parity_results/fit_draws_gt_grid.json")


def main() -> None:
    import glob as _glob

    from emap_tpu import config
    from emap_tpu.extract.autothresh import (
        build_probe_points,
        score_edges_2d,
        score_edges_3d,
    )
    from emap_tpu.extract.parametric import get_parametric_edge
    from emap_tpu.extract.pointcloud import extract_pointcloud_multi
    from emap_tpu.train.runner import Runner

    conf_path = _glob.glob(os.path.join(REPO, RUN_DIR, "*_standin.conf"))[0]
    conf = config.parse_file(conf_path)
    runner = Runner(conf, mode="extract_edge")
    runner.load_checkpoint()
    ee = conf.get_config("edge_extraction")
    res = ee.get_int("resolution")
    thresholds = [float(t) for t in ee.get_list("auto_threshold")]

    multi = extract_pointcloud_multi(
        runner.state.params["udf"], runner.ucfg,
        resolution=res, thresholds=thresholds,
        sampling_N=ee.get_int("sampling_N"),
        sampling_delta=ee.get_float("sampling_delta"),
        is_pointshift=ee.get_bool("is_pointshift"),
        iters=ee.get_int("iters"),
        is_linedirection=ee.get_bool("is_linedirection"),
    )
    probe = build_probe_points(
        runner.state.params["udf"], runner.ucfg, res, max(thresholds),
        sampling_N=ee.get_int("sampling_N"),
        sampling_delta=ee.get_float("sampling_delta"),
    )

    rows = []
    for thr in thresholds:
        points, line_dirs = multi[thr]
        ld_colors = (line_dirs + 1.0) / 2.0
        for s in SEEDS:
            t0 = time.time()
            _, edge_dict = get_parametric_edge(
                points, ld_colors, res, runner.scene.detector,
                runner.scene.data_dir,
                visible_checking=ee.get_bool("visible_checking"), seed=s,
            )
            # score_extraction reads results/parametric_edges.json from
            # disk — stage each cell's dict in a throwaway dir
            with tempfile.TemporaryDirectory() as tmp:
                os.makedirs(os.path.join(tmp, "results"), exist_ok=True)
                with open(os.path.join(tmp, "results",
                                       "parametric_edges.json"), "w") as f:
                    json.dump(edge_dict, f)
                gt = score_extraction(tmp, edge_dict, OBJ)
            row = {
                "udf_threshold": thr,
                "fit_seed": s,
                "n_points": int(len(points)),
                "n_lines": len(edge_dict["lines_end_pts"]),
                "n_curves": len(edge_dict["curves_ctl_pts"]),
                "f5_gt": gt["fscore_0.005"],
                "f10_gt": gt["fscore_0.01"],
                "p5_gt": gt["precision_0.005"],
                "r5_gt": gt["recall_0.005"],
                **score_edges_2d(edge_dict, runner.scene.data_dir,
                                 runner.scene.detector),
                **score_edges_3d(edge_dict, probe),
                "fit_s": round(time.time() - t0, 1),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

    from scipy.stats import spearmanr

    f5 = [r["f5_gt"] for r in rows]
    f3d = [r["f3d"] for r in rows]
    out = {
        "run_dir": RUN_DIR,
        "n_probe": int(len(probe)),
        "spearman_f3d_f5_all": round(
            float(spearmanr(f3d, f5).statistic), 3),
        "rows": rows,
    }
    os.makedirs(os.path.dirname(OUT) or ".", exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "rows"}),
          flush=True)


if __name__ == "__main__":
    main()
