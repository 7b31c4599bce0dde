#!/usr/bin/env python
"""Validate the GT-free auto-threshold selector (extract/autothresh.py) on
the three diagnosed 50k production checkpoints (diag_seeds/, BASELINE.md
"Weak-seed tail diagnosis").

For each seed: build the GT-free probe set once, re-extract at every
candidate threshold, score each candidate three ways — the ABC-protocol GT
F@5mm (what we want to maximize but cannot see in production), the 2D
pseudo-F against the observed edge maps (the gross-failure gate), and the
3D probe pseudo-F (the ranking signal) — then report, per seed: the rank
correlation of f3d vs GT F, the threshold pick_candidate (the shipped rule)
selects, and the F@5mm delta of the pick vs the fixed-threshold harness
default (0.03).

Env: AT_SEEDS ("3 99 42"), AT_THRESHOLDS ("0.02 0.03 0.04 0.05"), AT_OUT
(./diag_seeds — must hold the trained checkpoints), AT_RES (96).
Writes AT_OUT/autothresh_validation.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

if os.environ.get("AT_PLATFORM"):  # e.g. cpu during tunnel outages — must
    import jax                     # win over the axon sitecustomize

    jax.config.update("jax_platforms", os.environ["AT_PLATFORM"])

import numpy as np  # noqa: E402

from e2e_synthetic import build_conf, score_extraction  # noqa: E402

SEEDS = [int(s) for s in os.environ.get("AT_SEEDS", "3 99 42").split()]
THRESHOLDS = [float(t) for t in
              os.environ.get("AT_THRESHOLDS", "0.02 0.03 0.04 0.05").split()]
OUT = os.path.abspath(os.environ.get("AT_OUT", "./diag_seeds"))
OBJ = os.environ.get("AT_OBJ", "cube")
RES = int(os.environ.get("AT_RES", "96"))
DEFAULT_THR = float(os.environ.get("AT_DEFAULT", "0.03"))


def validate(seed: int) -> dict:
    from emap_tpu.extract.autothresh import (
        build_probe_points,
        score_edges_2d,
        score_edges_3d,
    )
    from emap_tpu.train.runner import Runner

    out_dir = os.path.join(OUT, f"s{seed}")
    conf = build_conf(out_dir, steps=50000, batch=512, seed=seed, obj=OBJ,
                      res=RES)
    runner = Runner(conf, mode="extract_edge")
    runner.load_checkpoint()
    probe = build_probe_points(
        runner.state.params["udf"], runner.ucfg, RES, max(THRESHOLDS)
    )
    print(json.dumps({"seed": seed, "n_probe": len(probe)}), flush=True)

    rows = []
    for thr in THRESHOLDS:
        edge_dict = runner.extract_edge(
            resolution=RES, udf_threshold=thr, sampling_N=50,
            sampling_delta=0.005, is_pointshift=True, iters=2,
            is_linedirection=True, visible_checking=False,
        )
        gt = score_extraction(runner.base_exp_dir, edge_dict, OBJ)
        s2d = score_edges_2d(edge_dict, runner.scene.data_dir,
                             runner.scene.detector)
        s3d = score_edges_3d(edge_dict, probe)
        row = {"udf_threshold": thr, "f5_gt": gt["fscore_0.005"],
               "f10_gt": gt["fscore_0.01"],
               # fragment counts (see autothresh_prod.py): lets any future
               # fragmentation-aware selection rule be replayed on the table
               "n_lines": len(edge_dict.get("lines_end_pts", [])),
               "n_curves": len(edge_dict.get("curves_ctl_pts", [])),
               **s2d, **s3d}
        rows.append(row)
        print(json.dumps({"seed": seed, **row}), flush=True)

    from emap_tpu.extract.autothresh import pick_candidate

    f5 = np.array([r["f5_gt"] for r in rows])
    f3d = np.array([r["f3d"] for r in rows])
    # THE shipped rule, imported verbatim (production anchors the
    # signal-free fallback to the conf's own fixed threshold)
    pick = pick_candidate(rows, default_thr=DEFAULT_THR)
    default_i = THRESHOLDS.index(DEFAULT_THR)
    # Spearman by hand (scipy-free): correlation of the two rank vectors
    rk = lambda v: np.argsort(np.argsort(v)).astype(float)  # noqa: E731
    ra, rb = rk(f5), rk(f3d)
    spearman = float(np.corrcoef(ra, rb)[0, 1])
    return {
        "seed": seed,
        "rows": rows,
        "picked_threshold": THRESHOLDS[pick],
        "f5_picked": float(f5[pick]),
        "f5_default": float(f5[default_i]),
        "f5_oracle_best": float(f5.max()),
        "delta_vs_default": round(float(f5[pick] - f5[default_i]), 4),
        "regret_vs_oracle": round(float(f5.max() - f5[pick]), 4),
        "spearman_f3d_vs_f5": round(spearman, 3),
    }


def main() -> None:
    results = [validate(s) for s in SEEDS]
    summary = {
        "thresholds": THRESHOLDS,
        "default_threshold": DEFAULT_THR,
        "results": results,
        "mean_f5_default": round(
            float(np.mean([r["f5_default"] for r in results])), 4),
        "mean_f5_picked": round(
            float(np.mean([r["f5_picked"] for r in results])), 4),
        "mean_f5_oracle": round(
            float(np.mean([r["f5_oracle_best"] for r in results])), 4),
    }
    with open(os.path.join(OUT, "autothresh_validation.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: summary[k] for k in
                      ("mean_f5_default", "mean_f5_picked",
                       "mean_f5_oracle")}))


if __name__ == "__main__":
    main()
