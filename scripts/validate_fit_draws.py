#!/usr/bin/env python
"""Live validation of extract_edge(fit_draws=K) on a trained production
checkpoint: run the FULL selector path (conf's auto_threshold menu x K fit
draws, shared dense grid) and GT-score the picked draw against the as-run
single-draw extraction recorded in the run's report.json.

Complements scripts/fit_draws_diag.py (the statistical case on 6 committed
stage-3 clouds): this exercises the product path a user gets from
`main.py --mode extract_edge` with `edge_extraction.fit_draws` set,
end-to-end on a real checkpoint. Reference contract being hedged: the
reference's fit stage is ONE fixed-seed roll of a chaotic host fit
(edge_fitting/main.py:93-228, seed 42).

Env: VD_DIR (run dir with *_standin.conf + report.json + exp checkpoint;
default prod_suite_r4/live_s3), VD_DRAWS ("4"), VD_OBJ ("cube"),
VD_OUT (parity_results/fit_draws_live.json).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from e2e_synthetic import score_extraction  # noqa: E402

RUN_DIR = os.environ.get("VD_DIR", "prod_suite_r4/live_s3")
DRAWS = int(os.environ.get("VD_DRAWS", "4"))
OBJ = os.environ.get("VD_OBJ", "cube")
OUT = os.environ.get("VD_OUT", "parity_results/fit_draws_live.json")


def main() -> None:
    import glob as _glob

    from emap_tpu import config
    from emap_tpu.train.runner import Runner

    conf_path = _glob.glob(os.path.join(REPO, RUN_DIR, "*_standin.conf"))[0]
    conf = config.parse_file(conf_path)
    report = json.load(open(os.path.join(REPO, RUN_DIR, "report.json")))
    runner = Runner(conf, mode="extract_edge")

    ee = conf.get_config("edge_extraction")
    t0 = time.time()
    edge_dict = runner.extract_edge(
        resolution=ee.get_int("resolution"),
        udf_threshold=ee.get_float("udf_threshold"),
        sampling_N=ee.get_int("sampling_N"),
        sampling_delta=ee.get_float("sampling_delta"),
        is_pointshift=ee.get_bool("is_pointshift"),
        iters=ee.get_int("iters"),
        is_linedirection=ee.get_bool("is_linedirection"),
        visible_checking=ee.get_bool("visible_checking"),
        auto_threshold=[float(t) for t in ee.get_list("auto_threshold", [])],
        platform=ee.get_string("platform", ""),
        fit_draws=DRAWS,
    )
    wall = time.time() - t0

    sel = json.load(open(os.path.join(
        runner.base_exp_dir, "results", "threshold_selection.json")))
    gt = score_extraction(runner.base_exp_dir, edge_dict, OBJ)
    out = {
        "run_dir": RUN_DIR,
        "fit_draws": DRAWS,
        "picked_thr": sel["picked"],
        "picked_fit_seed": sel["picked_fit_seed"],
        "extract_wall_s": round(wall, 1),
        "as_run_single_draw": {
            "picked_thr": None,
            "f5": report["score"]["fscore_0.005"],
            "f10": report["score"]["fscore_0.01"],
            "chamfer": report["score"]["chamfer"],
            "n_lines": report["score"]["n_lines"],
            "n_curves": report["score"]["n_curves"],
            "extract_wall_s": report.get("extract_wall_s"),
        },
        "with_draws": {
            "f5": gt["fscore_0.005"],
            "f10": gt["fscore_0.01"],
            "chamfer": gt["chamfer"],
            "n_lines": len(edge_dict["lines_end_pts"]),
            "n_curves": len(edge_dict["curves_ctl_pts"]),
        },
        "rows": [
            {k: r[k] for k in
             ("udf_threshold", "fit_seed", "n_lines", "n_curves",
              "f2d", "f3d", "picked") if k in r}
            for r in sel["candidates"]
        ],
    }
    print(json.dumps(out, indent=1), flush=True)
    os.makedirs(os.path.dirname(OUT) or ".", exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
