#!/usr/bin/env python
"""Iso-checkpoint extraction-protocol A/B on a production rings run
(round 5).

The first production-protocol rings numbers (prod_rings_r5: res-128,
menu 0.02-0.05, selector + fit_draws=4) came in ~0.40-0.41 F@5mm — BELOW
the res-96 harness suite's selector mean 0.490 (e2e_rings50k) — while
F@10 is ~0.91 and fragment counts are ~3x the harness's. Hypothesis: the
fit/merge stage's distance knobs all scale with 1/resolution
(reference extract_parametric_edge.py:229-237 — fit dist 10/res, voxel
2/res, merge 5.0/res), so res-128 runs a TIGHTER fit that splits the
three GT circles into many short primitives whose sub-5mm placement is
worse, even though the FIELD is fine.

This isolates protocol from field: the SAME production checkpoint is
extracted at res 128 and res 96 over the same threshold menu (fit seed
42, no draws) and every cell is GT-scored.

Env: AB_DIR (prod_rings_r5/s42), AB_OBJ (rings), AB_OUT
(parity_results/rings_protocol_ab.json).
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

if os.environ.get("AB_PLATFORM"):  # e.g. cpu while the chip is busy with
    import jax                     # a 200k train — must beat the axon
                                   # sitecustomize (config wins over env)
    jax.config.update("jax_platforms", os.environ["AB_PLATFORM"])

from e2e_synthetic import score_extraction  # noqa: E402

RUN_DIR = os.environ.get("AB_DIR", "prod_rings_r5/s42")
OBJ = os.environ.get("AB_OBJ", "rings")
OUT = os.environ.get("AB_OUT", "parity_results/rings_protocol_ab.json")
RESOLUTIONS = [int(r) for r in
               os.environ.get("AB_RES", "128 96").split()]
# AB_FIT_RES decouples the FIT-stage constants from the grid: for each
# grid resolution above, additionally fit the SAME point cloud with the
# constants of these resolutions (fit dist 10/res, voxel 2/res, merge
# 5/res all scale with the value passed to get_parametric_edge — the
# grid only sets point density). Empty = fit at the grid res only.
FIT_RES = [int(r) for r in os.environ.get("AB_FIT_RES", "").split()]


def main() -> None:
    import tempfile

    from emap_tpu import config
    from emap_tpu.extract.parametric import get_parametric_edge
    from emap_tpu.extract.pointcloud import extract_pointcloud_multi
    from emap_tpu.train.runner import Runner

    conf_path = glob.glob(os.path.join(REPO, RUN_DIR, "*_standin.conf"))[0]
    conf = config.parse_file(conf_path)
    runner = Runner(conf, mode="extract_edge")
    runner.load_checkpoint()
    ee = conf.get_config("edge_extraction")
    thresholds = [float(t) for t in ee.get_list("auto_threshold")]

    out = {"run_dir": RUN_DIR, "thresholds": thresholds, "rows": []}
    for res in RESOLUTIONS:
        t0 = time.time()
        multi = extract_pointcloud_multi(
            runner.state.params["udf"], runner.ucfg,
            resolution=res, thresholds=thresholds,
            sampling_N=ee.get_int("sampling_N"),
            sampling_delta=ee.get_float("sampling_delta"),
            is_pointshift=ee.get_bool("is_pointshift"),
            iters=ee.get_int("iters"),
            is_linedirection=ee.get_bool("is_linedirection"),
        )
        grid_s = round(time.time() - t0, 1)
        for thr in thresholds:
            points, line_dirs = multi[float(thr)]
            ld_colors = (line_dirs + 1.0) / 2.0
            for fit_res in ([res] + [fr for fr in FIT_RES if fr != res]):
                t0 = time.time()
                _, edge_dict = get_parametric_edge(
                    points, ld_colors, fit_res, runner.scene.detector,
                    runner.scene.data_dir,
                    visible_checking=ee.get_bool("visible_checking"),
                    seed=42,
                )
                with tempfile.TemporaryDirectory() as tmp:
                    os.makedirs(os.path.join(tmp, "results"), exist_ok=True)
                    with open(os.path.join(
                            tmp, "results", "parametric_edges.json"),
                            "w") as f:
                        json.dump(edge_dict, f)
                    gt = score_extraction(tmp, edge_dict, OBJ)
                row = {
                    "resolution": res, "fit_resolution": fit_res,
                    "udf_threshold": thr,
                    "n_points": int(len(points)),
                    "n_lines": len(edge_dict["lines_end_pts"]),
                    "n_curves": len(edge_dict["curves_ctl_pts"]),
                    "f5_gt": gt["fscore_0.005"],
                    "f10_gt": gt["fscore_0.01"],
                    "grid_s": grid_s, "fit_s": round(time.time() - t0, 1),
                }
                out["rows"].append(row)
                print(json.dumps(row), flush=True)

    os.makedirs(os.path.dirname(os.path.join(REPO, OUT)), exist_ok=True)
    with open(os.path.join(REPO, OUT), "w") as f:
        json.dump(out, f, indent=1)
    best = {}
    for r in out["rows"]:
        key = f"grid{r['resolution']}/fit{r['fit_resolution']}"
        best.setdefault(key, []).append(r["f5_gt"])
    print(json.dumps({k: max(v) for k, v in best.items()}))


if __name__ == "__main__":
    sys.exit(main() or 0)
