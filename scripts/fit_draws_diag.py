#!/usr/bin/env python
"""Measure the fit-stage chaos band at a FIXED point cloud, and whether the
GT-free selector scores can rank fit draws (round 4).

Motivation: the documented ±0.1 F@5mm "extraction re-roll" band
(BASELINE.md cross-platform section) was attributed to sub-roundoff cloud
perturbations feeding the chaotic host fit (greedy polyline growth + RANSAC,
reference edge_fitting/main.py:93-228 — both seeded from
`get_parametric_edge(seed=42)`). If the chaos lives in the fit, then varying
ONLY the fit seed on one fixed cloud samples the same band — and the
GT-free probe scorer (extract/autothresh.py) might pick a good draw the way
it already picks thresholds. This script measures both claims before any
product change:

  1. the per-cloud GT F@5mm spread across K fit seeds (the band, isolated
     from every field/platform effect), and
  2. the regret of `pick_candidate` applied to (one threshold x K draws)
     rows vs the oracle draw.

Inputs are the committed cross-platform stage-3 dumps
(diag_platform/rings_s*_{cpu,tpu}.npz: final cloud + line dirs + |udf| after
shift) — no TPU or checkpoint needed; the probe set is certified from the
dump's own final_df exactly like build_probe_points does post-shift.

Env: FD_DUMPS (space-sep paths; default: the 6 rings dumps), FD_SEEDS
("42 0 1 2 3 4 5 6"), FD_OBJ (rings), FD_RES (96), FD_THRESH (0.03),
FD_OUT (parity_results/fit_draws_diag.json).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

from e2e_synthetic import score_extraction  # noqa: E402

DUMPS = os.environ.get(
    "FD_DUMPS",
    " ".join(
        f"diag_platform/rings_s{s}_{p}.npz"
        for s in (42, 3, 99) for p in ("tpu", "cpu")
    ),
).split()
SEEDS = [int(s) for s in os.environ.get("FD_SEEDS",
                                        "42 0 1 2 3 4 5 6").split()]
OBJ = os.environ.get("FD_OBJ", "rings")
RES = int(os.environ.get("FD_RES", "96"))
THRESH = float(os.environ.get("FD_THRESH", "0.03"))
OUT = os.environ.get("FD_OUT", "parity_results/fit_draws_diag.json")


def ensure_scene() -> str:
    """Regenerate the deterministic synthetic scene the dumps were scored
    against (the suite dirs that held it are cleaned between rounds)."""
    from emap_tpu.data.synthetic import make_synthetic_scene

    data_dir = os.path.join("/tmp", f"fit_draws_scene_{OBJ}", "data")
    make_synthetic_scene(data_dir, scan="cube000", n_views=24, H=128, W=128,
                         obj=OBJ)
    # scorers expect the per-scan dir (meta_data.json lives in it)
    return os.path.join(data_dir, "cube000")


def draws_for_dump(path: str, data_dir: str) -> dict:
    from emap_tpu.extract.autothresh import (
        _certify_probe,
        pick_candidate,
        score_edges_2d,
        score_edges_3d,
    )
    from emap_tpu.extract.parametric import get_parametric_edge

    d = np.load(path)
    xyz, line_dirs, final_df = d["xyz"], d["line_dirs"], d["final_df"]
    ld_colors = (line_dirs + 1.0) / 2.0
    probe = _certify_probe(xyz, final_df, 2e-3, THRESH)

    rows = []
    for s in SEEDS:
        t0 = time.time()
        _, edge_dict = get_parametric_edge(
            xyz, ld_colors, RES, "DexiNed", data_dir,
            visible_checking=False, seed=s,
        )
        with tempfile.TemporaryDirectory() as tmp:
            os.makedirs(os.path.join(tmp, "results"), exist_ok=True)
            with open(os.path.join(tmp, "results",
                                   "parametric_edges.json"), "w") as f:
                json.dump(edge_dict, f)
            gt = score_extraction(tmp, edge_dict, OBJ)
        row = {
            "udf_threshold": THRESH,  # pick_candidate's anchor key
            "fit_seed": s,
            "f5_gt": gt["fscore_0.005"],
            "f10_gt": gt["fscore_0.01"],
            "n_lines": len(edge_dict["lines_end_pts"]),
            "n_curves": len(edge_dict["curves_ctl_pts"]),
            **score_edges_2d(edge_dict, data_dir, "DexiNed"),
            **score_edges_3d(edge_dict, probe),
            "fit_s": round(time.time() - t0, 1),
        }
        rows.append(row)
        print(json.dumps({"dump": os.path.basename(path), **row}),
              flush=True)

    f5 = np.array([r["f5_gt"] for r in rows])
    f3d = np.array([r["f3d"] for r in rows])
    picked = pick_candidate(rows, default_thr=None)
    base = SEEDS.index(42) if 42 in SEEDS else 0
    from scipy.stats import spearmanr

    rho = spearmanr(f3d, f5).statistic if len(set(f3d)) > 1 else float("nan")
    summary = {
        "dump": path,
        "n_points": int(len(xyz)),
        "n_probe": int(len(probe)),
        "f5_min": float(f5.min()),
        "f5_max": float(f5.max()),
        "f5_std": round(float(f5.std()), 4),
        "f5_seed42": float(f5[base]),
        "f5_picked": float(f5[picked]),
        "picked_seed": SEEDS[picked],
        "f5_oracle": float(f5.max()),
        "regret": round(float(f5.max() - f5[picked]), 4),
        "spearman_f3d_f5": None if np.isnan(rho) else round(float(rho), 3),
        "rows": rows,
    }
    print(json.dumps({k: v for k, v in summary.items() if k != "rows"}),
          flush=True)
    return summary


def main() -> None:
    data_dir = ensure_scene()
    results = [draws_for_dump(p, data_dir) for p in DUMPS]

    f5_42 = np.array([r["f5_seed42"] for r in results])
    f5_pk = np.array([r["f5_picked"] for r in results])
    f5_or = np.array([r["f5_oracle"] for r in results])
    agg = {
        "n_dumps": len(results),
        "k_draws": len(SEEDS),
        "mean_f5_seed42": round(float(f5_42.mean()), 4),
        "mean_f5_picked": round(float(f5_pk.mean()), 4),
        "mean_f5_oracle": round(float(f5_or.mean()), 4),
        "mean_band_halfwidth": round(float(np.mean(
            [(r["f5_max"] - r["f5_min"]) / 2 for r in results])), 4),
        "mean_within_cloud_std": round(float(np.mean(
            [r["f5_std"] for r in results])), 4),
    }
    print(json.dumps(agg), flush=True)
    os.makedirs(os.path.dirname(OUT) or ".", exist_ok=True)
    with open(OUT, "w") as f:
        json.dump({"agg": agg, "per_dump": results}, f, indent=1)


if __name__ == "__main__":
    main()
