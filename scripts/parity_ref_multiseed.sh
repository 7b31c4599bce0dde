#!/bin/bash
# Multi-seed torch-reference parity runs (VERDICT r1 item 1).
#
# Trains the torch reference (CPU) at 3 extra seeds on BOTH parity scenes
# (cube + rings, 8k x 256 schedule -- same as parity_results/parity_table_8k),
# then scores each with the shared extraction+eval protocol. ~50-70 min per
# run on this 1-core host; runs are serialized and nice'd so foreground work
# keeps priority.
#
# Usage: bash scripts/parity_ref_multiseed.sh [objs] [seeds]
#   objs  default "cube rings"; seeds default "7 99 1234"
set -u
cd "$(dirname "$0")/.."
OBJS=${1:-"cube rings"}
SEEDS=${2:-"7 99 1234"}
mkdir -p parity_results parity_ref_runs
for obj in $OBJS; do
  for seed in $SEEDS; do
    out="$(pwd)/parity_ref_runs/${obj}_s${seed}"
    score="$(pwd)/parity_results/score_ref_${obj}_seed${seed}.json"
    if [ -f "$score" ]; then
      echo "=== skip ${obj} seed ${seed} (already scored) ==="
      continue
    fi
    echo "=== ref train ${obj} seed ${seed} -> ${out} ==="
    if [ ! -f "$out/ref_final.pth" ]; then
      PARITY_OBJ=$obj PARITY_SEED=$seed PARITY_OUT=$out \
      PARITY_STEPS=8000 PARITY_BATCH=256 \
        nice -n 19 python scripts/parity_reference.py ref \
        > "$out.train.log" 2>&1 || { echo "TRAIN FAILED ${obj}/${seed}"; continue; }
    fi
    echo "=== ref score ${obj} seed ${seed} ==="
    PARITY_OBJ=$obj PARITY_SEED=$seed PARITY_OUT=$out \
    PARITY_STEPS=8000 PARITY_BATCH=256 PARITY_SCORE_OUT=$score \
      nice -n 19 python scripts/parity_reference.py score ref \
      > "$out.score.log" 2>&1 || echo "SCORE FAILED ${obj}/${seed}"
    tail -c 400 "$score" 2>/dev/null; echo
  done
done
echo "=== multiseed reference parity done ==="
