#!/bin/bash
# 5-seed FULL-SCHEDULE (50k) rings suite on the production stack (r4 bf16
# field tier), VERDICT r2 item 1: production-scale curve-path quality was a
# single sample (F@5mm 0.407). Same harness/protocol as the recorded
# e2e_newtier cube suite (scripts/e2e_suite_newtier.sh), only the scene
# object differs. The with-selector half runs afterwards from the saved
# checkpoints via scripts/validate_autothresh.py (AT_OBJ=rings).
#
# Usage: bash scripts/rings50k_suite.sh [seeds]   (default "42 7 99 3 1234")
set -u
cd "$(dirname "$0")/.."
SEEDS=${1:-"42 7 99 3 1234"}
mkdir -p e2e_rings50k
for seed in $SEEDS; do
  out="$(pwd)/e2e_rings50k/s${seed}"
  score="$(pwd)/e2e_rings50k/score_seed${seed}.json"
  if [ -f "$score" ]; then
    echo "=== skip seed ${seed} (already scored) ==="
    continue
  fi
  echo "=== rings 50k seed ${seed} -> ${out} ==="
  E2E_SEED=$seed E2E_OBJ=rings E2E_FIELD_PREC=default E2E_STEPS=50000 \
  E2E_BATCH=512 E2E_OUT=$out python scripts/e2e_synthetic.py \
    > "$out.log" 2>&1 || { echo "RUN FAILED seed ${seed}"; continue; }
  tail -n 1 "$out.log" > "$score"
  tail -c 400 "$score"; echo
done
echo "=== rings 50k suite done ==="
