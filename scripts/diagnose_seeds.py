#!/usr/bin/env python
"""Per-seed diagnosis of the production-schedule quality tail (VERDICT r1
item 2): is a weak seed's low F@5mm a training-side defect (the field itself
is worse at the edges) or extraction-side fragility (the fixed extraction
hyperparameters interact badly with an otherwise-fine field)?

For each seed: train the production 50k e2e schedule (reusing the checkpoint
if present), then
  * field metrics  : |udf| statistics at the analytic GT edge points — a
    direct, extraction-free measure of how well training carved the edges
    (reference analog: the field the extraction consumes,
    extract_pointcloud.py:36-55);
  * threshold sweep: extraction + ABC-protocol scoring at udf_threshold in
    DIAG_THRESHOLDS — the reference pins 0.02-0.04 per dataset
    (confs/*.conf edge_extraction.udf_threshold); sensitivity here means the
    tail is extraction-side.

Env: DIAG_SEEDS ("3 99 42"), DIAG_STEPS (50000), DIAG_THRESHOLDS
("0.02 0.03 0.04 0.05"), DIAG_OUT (./diag_seeds). Writes
diag_seeds/seed{N}.json + a combined diag_seeds/summary.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

from e2e_synthetic import build_conf, score_extraction  # noqa: E402

SEEDS = [int(s) for s in os.environ.get("DIAG_SEEDS", "3 99 42").split()]
STEPS = int(os.environ.get("DIAG_STEPS", "50000"))
THRESHOLDS = [float(t) for t in
              os.environ.get("DIAG_THRESHOLDS", "0.02 0.03 0.04 0.05").split()]
OUT = os.path.abspath(os.environ.get("DIAG_OUT", "./diag_seeds"))
OBJ = os.environ.get("DIAG_OBJ", "cube")
RES = int(os.environ.get("DIAG_RES", "96"))


def field_metrics(runner) -> dict:
    """|udf| at the analytic GT edge points: the training-side signal."""
    import jax
    import jax.numpy as jnp

    from emap_tpu.data.synthetic import (
        sample_cube_edge_points,
        sample_ring_edge_points,
    )
    from emap_tpu.fields.udf import udf_value

    gt = (sample_ring_edge_points(0.5, spacing=0.005) if OBJ == "rings"
          else sample_cube_edge_points(0.5, spacing=0.005))
    fn = jax.jit(lambda p, x: udf_value(p, x, runner.ucfg))
    vals = np.abs(np.asarray(
        fn(runner.state.params["udf"], jnp.asarray(gt, jnp.float32))
    ))
    return {
        "gt_udf_mean": round(float(vals.mean()), 6),
        "gt_udf_median": round(float(np.median(vals)), 6),
        "gt_udf_p90": round(float(np.percentile(vals, 90)), 6),
        "gt_udf_max": round(float(vals.max()), 6),
        "gt_udf_frac_above_0.02": round(float((vals > 0.02).mean()), 4),
        "gt_udf_frac_above_0.04": round(float((vals > 0.04).mean()), 4),
    }


def diagnose(seed: int) -> dict:
    from emap_tpu.train.runner import Runner

    out_dir = os.path.join(OUT, f"s{seed}")
    conf = build_conf(out_dir, steps=STEPS, batch=512, seed=seed, obj=OBJ,
                      res=RES)
    ckpt = os.path.join(out_dir, "exp", "cube000", "emap", "checkpoints",
                        "ckpt_best.npz")
    if not os.path.isfile(ckpt):
        runner = Runner(conf, mode="train")
        runner.train()
        runner.save_checkpoint(0.0)
    runner = Runner(conf, mode="extract_edge")
    runner.load_checkpoint()
    row: dict = {"seed": seed, "steps": STEPS, **field_metrics(runner)}

    for thr in THRESHOLDS:
        edge_dict = runner.extract_edge(
            resolution=RES, udf_threshold=thr, sampling_N=50,
            sampling_delta=0.005, is_pointshift=True, iters=2,
            is_linedirection=True, visible_checking=False,
        )
        score = score_extraction(runner.base_exp_dir, edge_dict, OBJ)
        row[f"thr_{thr}"] = score
        print(json.dumps({"seed": seed, "thr": thr,
                          "f5": score["fscore_0.005"],
                          "f10": score["fscore_0.01"],
                          "n_lines": score["n_lines"],
                          "n_curves": score["n_curves"]}), flush=True)

    with open(os.path.join(OUT, f"seed{seed}.json"), "w") as f:
        json.dump(row, f, indent=1)
    return row


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    rows = [diagnose(s) for s in SEEDS]
    summary = {
        "seeds": SEEDS,
        "steps": STEPS,
        "thresholds": THRESHOLDS,
        "rows": rows,
    }
    with open(os.path.join(OUT, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({
        s["seed"]: {
            "gt_udf_mean": s["gt_udf_mean"],
            "best_f5": max(s[f"thr_{t}"]["fscore_0.005"]
                           for t in THRESHOLDS),
            "f5_at_default": s["thr_0.03"]["fscore_0.005"]
            if "thr_0.03" in s else None,
        }
        for s in rows
    }))


if __name__ == "__main__":
    main()
