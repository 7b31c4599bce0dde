#!/bin/bash
# 5-seed full-schedule e2e suite at the r4 production field tier (bf16
# train-path field query, the conf default since the r4 flip). Refreshes
# BASELINE's 5-seed stats, which were measured at the historical ("" /
# model-tier) field precision, and answers VERDICT r1 item 2's acceptance
# bar ("worst-seed F@5mm >= 0.65 on the 5-seed suite, or a documented root
# cause").
#
# Usage: bash scripts/e2e_suite_newtier.sh [seeds]   (default "42 7 99 3 1234")
set -u
cd "$(dirname "$0")/.."
SEEDS=${1:-"42 7 99 3 1234"}
mkdir -p e2e_newtier
for seed in $SEEDS; do
  out="$(pwd)/e2e_newtier/s${seed}"
  score="$(pwd)/e2e_newtier/score_seed${seed}.json"
  if [ -f "$score" ]; then
    echo "=== skip seed ${seed} (already scored) ==="
    continue
  fi
  echo "=== e2e new-tier seed ${seed} -> ${out} ==="
  E2E_SEED=$seed E2E_FIELD_PREC=default E2E_STEPS=50000 E2E_BATCH=512 \
  E2E_OUT=$out python scripts/e2e_synthetic.py \
    > "$out.log" 2>&1 || { echo "RUN FAILED seed ${seed}"; continue; }
  tail -n 1 "$out.log" > "$score"
  tail -c 400 "$score"; echo
done
echo "=== new-tier e2e suite done ==="
