#!/usr/bin/env python
"""Aggregate the multi-seed parity scores into a two-sided statistical
table (VERDICT r1 item 1).

Reads parity_results/score_{ref,ours*}_*.json (the per-run outputs of
scripts/parity_reference.py / precision_ab.sh), groups by (scene, side),
and prints per-side mean ± std F@5/10mm plus the two-sided verdict: ours ≥
reference, or |Δmean| within the pooled std. Writes
parity_results/parity_twosided.json.

Conventions: cube controls are score_ours_r3_seed*.json, rings controls
score_ours_rings_seed*.json + the seed-42 rows recorded in
parity_results/parity_table{_rings}_8k.json; reference rows are
score_ref_<obj>_seed*.json + the original seed-42 refs in the same r2
tables.
"""

from __future__ import annotations

import glob
import json
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
RES = os.path.join(os.path.dirname(__file__), "..", "parity_results")


def _stats(vals):
    n = len(vals)
    mean = sum(vals) / n
    std = (math.fsum((v - mean) ** 2 for v in vals) / (n - 1)) ** 0.5 \
        if n > 1 else 0.0
    return round(mean, 4), round(std, 4), n


def _seed_of(d: dict, path: str) -> int:
    if "seed" in d:
        return int(d["seed"])
    return int(os.path.basename(path).rsplit("seed", 1)[1].split(".")[0])


def collect() -> dict:
    sides = {("cube", "ours"): {}, ("cube", "ref"): {},
             ("rings", "ours"): {}, ("rings", "ref"): {}}
    for f in glob.glob(os.path.join(RES, "score_ours_r3_seed*.json")):
        d = json.load(open(f))
        sides[("cube", "ours")][_seed_of(d, f)] = d
    for f in glob.glob(os.path.join(RES, "score_ours_rings_seed*.json")):
        d = json.load(open(f))
        sides[("rings", "ours")][_seed_of(d, f)] = d
    for f in glob.glob(os.path.join(RES, "score_ref_*_seed*.json")):
        d = json.load(open(f))
        obj = "rings" if "rings" in os.path.basename(f) else "cube"
        sides[(obj, "ref")][_seed_of(d, f)] = d
    # seed-42 rows from the original r2/r3 tables (recorded before the
    # per-seed score files existed; both store {"parity": {"ref":…,"ours":…}})
    t8k = json.load(open(os.path.join(RES, "parity_table_8k.json")))
    sides[("cube", "ref")].setdefault(42, t8k["parity"]["ref"])
    tr = json.load(open(os.path.join(RES, "parity_table_rings_8k.json")))
    sides[("rings", "ref")].setdefault(42, tr["parity"]["ref"])
    sides[("rings", "ours")].setdefault(42, tr["parity"]["ours"])
    return sides


def main() -> None:
    sides = collect()
    out = {}
    for obj in ("cube", "rings"):
        out[obj] = {}
        for side in ("ref", "ours"):
            rows = sides[(obj, side)]
            if not rows:
                continue
            f5 = [r["fscore_0.005"] for r in rows.values()
                  if "fscore_0.005" in r]
            f10 = [r["fscore_0.01"] for r in rows.values()
                   if "fscore_0.01" in r]
            m5, s5, n = _stats(f5)
            m10, s10, _ = _stats(f10)
            out[obj][side] = {
                "seeds": sorted(rows), "n": n,
                "f5_mean": m5, "f5_std": s5,
                "f10_mean": m10, "f10_std": s10,
                "f5_per_seed": {str(k): rows[k].get("fscore_0.005")
                                for k in sorted(rows)},
            }
        if "ref" in out[obj] and "ours" in out[obj]:
            r, o = out[obj]["ref"], out[obj]["ours"]
            pooled = ((r["f5_std"] ** 2 + o["f5_std"] ** 2) / 2) ** 0.5
            delta = round(o["f5_mean"] - r["f5_mean"], 4)
            out[obj]["verdict"] = {
                "delta_f5_mean": delta,
                "pooled_std": round(pooled, 4),
                "parity": bool(delta >= 0 or abs(delta) <= pooled),
            }
    print(json.dumps(out, indent=1))
    with open(os.path.join(RES, "parity_twosided.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
