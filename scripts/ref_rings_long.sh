#!/bin/bash
# Long-schedule torch-reference rings runs (VERDICT r3 item 3).
#
# The r3 claim "the rings-50k gap is schedule-length, not framework" was
# one-sided: the torch reference had only ever been run at 8k on rings.
# This trains the reference PAST 8k (default 16k x 256, ~2h nice'd per seed
# at the measured ~0.4 s/iter) on the identical synthetic rings scene and
# scores it with the identical extraction+eval protocol (fixed thr 0.03,
# res 96 — same as parity_results/score_ref_rings_seed*.json), CPU-pinned
# so the TPU suite keeps the chip.
#
# Usage: bash scripts/ref_rings_long.sh [steps] [seeds]
#   steps default 16000; seeds default "42 7"
set -u
cd "$(dirname "$0")/.."
STEPS=${1:-16000}
SEEDS=${2:-"42 7"}
mkdir -p parity_results parity_ref_runs
for seed in $SEEDS; do
  out="$(pwd)/parity_ref_runs/rings${STEPS}_s${seed}"
  score="$(pwd)/parity_results/score_ref_rings${STEPS}_seed${seed}.json"
  if [ -f "$score" ]; then
    echo "=== skip rings${STEPS} seed ${seed} (already scored) ==="
    continue
  fi
  echo "=== ref train rings ${STEPS} seed ${seed} -> ${out} ==="
  if [ ! -f "$out/ref_final.pth" ]; then
    PARITY_OBJ=rings PARITY_SEED=$seed PARITY_OUT=$out \
    PARITY_STEPS=$STEPS PARITY_BATCH=256 \
      nice -n 19 python scripts/parity_reference.py ref \
      > "$out.train.log" 2>&1 || { echo "TRAIN FAILED rings${STEPS}/${seed}"; continue; }
  fi
  echo "=== ref score rings ${STEPS} seed ${seed} ==="
  PARITY_OBJ=rings PARITY_SEED=$seed PARITY_OUT=$out \
  PARITY_STEPS=$STEPS PARITY_BATCH=256 PARITY_SCORE_OUT=$score \
  PARITY_PLATFORM=cpu \
    nice -n 19 python scripts/parity_reference.py score ref \
    > "$out.score.log" 2>&1 || echo "SCORE FAILED rings${STEPS}/${seed}"
  tail -c 400 "$score" 2>/dev/null; echo
done
echo "=== long-schedule reference rings done ==="
