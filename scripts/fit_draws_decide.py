#!/usr/bin/env python
"""Decide fit_draws for the DTU/Replica confs from GT draw-tables
(VERDICT r4 item 3/4: 'decide on data, not absence of data').

Input: the (threshold x fit-seed) GT grids produced by
scripts/fit_draws_gt_grid.py on fresh 200k checkpoints
(parity_results/fit_draws_{dtu,replica}200k_grid.json). For each table
this replays the EXACT shipped selection rule (pick_candidate_draws over
the full grid, conf default threshold as the signal-free anchor) and
tallies:

  picked      GT F@5mm of the cell the shipped rule selects with
              fit_draws=4
  anchor      GT F@5mm of (picked threshold, seed 42) — what fit_draws=1
              would produce at the same threshold pick
  fixed       GT F@5mm of (conf udf_threshold, seed 42) — the no-selector
              no-draws baseline
  oracle      max GT F@5mm over the whole grid

Ship fit_draws=4 iff picked >= anchor on every table (the ABC guard
contract) with positive mean gain; otherwise keep 1 and record why.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

TABLES = {
    "DTU": ("parity_results/fit_draws_dtu200k_grid.json", 0.015),
    "Replica": ("parity_results/fit_draws_replica200k_grid.json", 0.01),
}


def main() -> int:
    from emap_tpu.extract.autothresh import pick_candidate_draws

    out = {}
    for conf_name, (path, default_thr) in TABLES.items():
        full = os.path.join(REPO, path)
        if not os.path.exists(full):
            print(f"{conf_name}: table missing ({path}) — run "
                  f"scripts/fit_draws_gt_grid.py first")
            continue
        with open(full) as f:
            table = json.load(f)
        rows = table["rows"]
        i = pick_candidate_draws(rows, default_thr=default_thr)
        thr = rows[i]["udf_threshold"]
        picked = rows[i]["f5_gt"]
        anchor = next(r["f5_gt"] for r in rows
                      if r["udf_threshold"] == thr and r["fit_seed"] == 42)
        fixed = next(
            (r["f5_gt"] for r in rows
             if abs(r["udf_threshold"] - default_thr) < 1e-9
             and r["fit_seed"] == 42),
            None,
        )
        oracle = max(r["f5_gt"] for r in rows)
        out[conf_name] = {
            "table": path,
            "picked_thr": thr,
            "picked_seed": rows[i]["fit_seed"],
            "f5_picked": picked,
            "f5_anchor_at_picked_thr": anchor,
            "f5_fixed_conf_thr": fixed,
            "f5_oracle": oracle,
            "gain_vs_anchor": round(picked - anchor, 4),
            "regret_vs_oracle": round(oracle - picked, 4),
            "spearman_f3d_f5": table.get("spearman_f3d_f5_all"),
            "n_probe": table.get("n_probe"),
        }
        print(f"{conf_name}: picked ({thr}, seed {rows[i]['fit_seed']}) "
              f"GT {picked:.4f} | anchor {anchor:.4f} | fixed "
              f"{fixed if fixed is None else round(fixed, 4)} | oracle "
              f"{oracle:.4f}")

    if out:
        dest = os.path.join(REPO, "parity_results", "fit_draws_decision.json")
        with open(dest, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
