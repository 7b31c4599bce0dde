#!/usr/bin/env python
"""Replay draw-ranking rule VARIANTS over every archived (threshold x
fit-seed) table with GT columns — the offline A/B that decides how
extract_edge(fit_draws=K) should pick among fit draws before any conf
default moves.

Tables: tests/fixtures/autothresh_tables/fit_draws_rings.json (6 rings
clouds x 8 draws at one threshold) and
parity_results/fit_draws_gt_grid.json (cube production checkpoint,
4 thresholds x 4 draws). Rules are closures over the row list returning a
picked index; every rule is scored by GT regret vs the oracle cell and by
the delta vs the fixed seed-42 draw at the rule's picked threshold.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

from emap_tpu.extract.autothresh import pick_candidate  # noqa: E402


def load_tables() -> list[dict]:
    tables = []
    fix = json.load(open(os.path.join(
        REPO, "tests/fixtures/autothresh_tables/fit_draws_rings.json")))
    for res in fix["results"]:
        tables.append({"name": res["seed"], "default_thr": 0.03,
                       "rows": res["rows"]})
    grid_path = os.path.join(REPO, "parity_results/fit_draws_gt_grid.json")
    if os.path.isfile(grid_path):
        g = json.load(open(grid_path))
        tables.append({"name": f"{g['run_dir']} (grid)",
                       "default_thr": 0.02, "rows": g["rows"]})
    return tables


def rule_current(rows, default_thr):
    return pick_candidate(rows, default_thr=default_thr)


def rule_no_frag(rows, default_thr):
    return pick_candidate(rows, default_thr=default_thr, frag_tie_delta=0.0)


def rule_frag_threshold_only(rows, default_thr):
    """Two-stage: pick the threshold with the full rule on each threshold's
    BEST-f3d draw (fragment tie-break across thresholds, its original
    calibration), then among that threshold's draws take the f3d argmax."""
    by_thr: dict[float, list[int]] = {}
    for i, r in enumerate(rows):
        by_thr.setdefault(r["udf_threshold"], []).append(i)
    reps = [max(idx, key=lambda i: rows[i]["f3d"]) for idx in by_thr.values()]
    rep_rows = [rows[i] for i in reps]
    j = pick_candidate(rep_rows, default_thr=default_thr)
    thr = rep_rows[j]["udf_threshold"]
    return max(by_thr[thr], key=lambda i: rows[i]["f3d"])


def rule_recall_gated(rows, default_thr):
    """Coverage-first among draws: full rule picks the threshold, then the
    draw maximizing recall3d among draws whose precision3d clears 90% of
    the threshold's best (fragmentation ignored — under-fragmented draws
    lose recall3d, over-fragmented lose precision3d)."""
    k = pick_candidate(rows, default_thr=default_thr)
    thr = rows[k]["udf_threshold"]
    idx = [i for i, r in enumerate(rows) if r["udf_threshold"] == thr]
    p_max = max(rows[i]["precision3d"] for i in idx)
    ok = [i for i in idx if rows[i]["precision3d"] >= 0.9 * p_max]
    return max(ok, key=lambda i: rows[i]["recall3d"])


def rule_fixed_seed(rows, default_thr):
    """Control: full rule on the seed-42 rows only (fit_draws=1)."""
    idx = [i for i, r in enumerate(rows) if r.get("fit_seed", 42) == 42]
    sub = [rows[i] for i in idx]
    return idx[pick_candidate(sub, default_thr=default_thr)]


RULES = {
    "current(frag=0.1)": rule_current,
    "no_frag": rule_no_frag,
    "frag_thr_only": rule_frag_threshold_only,
    "recall_gated": rule_recall_gated,
    "fixed_seed42": rule_fixed_seed,
}


def main() -> None:
    tables = load_tables()
    out = {}
    for name, rule in RULES.items():
        regs, vs_fixed, picks = [], [], []
        for t in tables:
            rows = t["rows"]
            i = rule(rows, t["default_thr"])
            f5 = [r["f5_gt"] for r in rows]
            fixed_i = rule_fixed_seed(rows, t["default_thr"])
            regs.append(max(f5) - f5[i])
            vs_fixed.append(f5[i] - f5[fixed_i])
            picks.append((t["name"], rows[i]["udf_threshold"],
                          rows[i].get("fit_seed"), round(f5[i], 4),
                          round(regs[-1], 4)))
        out[name] = {
            "mean_regret": round(float(np.mean(regs)), 4),
            "max_regret": round(float(np.max(regs)), 4),
            "oracle_hits": int(sum(r < 1e-9 for r in regs)),
            "mean_vs_fixed42": round(float(np.mean(vs_fixed)), 4),
            "min_vs_fixed42": round(float(np.min(vs_fixed)), 4),
            "picks": picks,
        }
        print(json.dumps({name: {k: v for k, v in out[name].items()
                                 if k != "picks"}}), flush=True)
    with open(os.path.join(REPO, "parity_results/fit_draws_rules.json"),
              "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
