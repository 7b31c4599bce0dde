#!/bin/bash
# Seed-matched e2e A/B of precision tiers (VERDICT r1 item 3).
#
# Controls (production defaults: sampler=default, field=high, bwd inherits)
# are the existing parity_results/score_ours_r3_seed*.json rows (same 8k x
# 256 schedule, same seeds). This sweep reruns the SAME seeds with
#   sampler_highest : sampler_precision=highest  (f32 importance queries)
#   bwd_highest     : bwd_precision=highest      (f32 train-kernel adjoint;
#                     auto-gate routes through XLA)
# and scores each with the shared extraction+eval protocol, so the F@5mm
# delta of each bf16 tier is measured end-to-end rather than op-level.
#
# Usage: bash scripts/precision_ab.sh [tiers] [seeds]
set -u
cd "$(dirname "$0")/.."
TIERS=${1:-"sampler_highest bwd_highest"}
SEEDS=${2:-"42 7 99 3 1234"}
OBJ=${3:-cube}   # rings for the curve-only scene; scores get an _<obj> suffix
mkdir -p parity_results precision_ab
for tier in $TIERS; do
  # SCORE_EXTRA: env for the extraction+scoring pass. Train-time tiers
  # (field_default) must NOT leak into extraction — the A/B isolates the
  # tier's effect on the TRAINED FIELD; extraction always runs the
  # production tier. Sampler/bwd knobs don't exist on the extraction path,
  # so reusing them there is harmless.
  case $tier in
    sampler_highest) EXTRA="PARITY_SAMPLER_PREC=highest"; SCORE_EXTRA=$EXTRA ;;
    bwd_highest)     EXTRA="PARITY_BWD_PREC=highest"; SCORE_EXTRA=$EXTRA ;;
    field_default)   EXTRA="PARITY_FIELD_PREC=default"; SCORE_EXTRA="" ;;
    # fuse_pe_on: the r5 production default (in-kernel PE encode/Jacobian)
    # — controls are the pre-flip score_ours_r3_seed*.json rows. Train-time
    # only; extraction never touches the train kernel.
    fuse_pe_on)      EXTRA="PARITY_FUSE_PE=1"; SCORE_EXTRA="" ;;
    control)         EXTRA=""; SCORE_EXTRA="" ;;
    *) echo "unknown tier $tier"; exit 1 ;;
  esac
  for seed in $SEEDS; do
    sfx=""; [ "$OBJ" != "cube" ] && sfx="_${OBJ}"
    out="$(pwd)/precision_ab/${tier}${sfx}_s${seed}"
    score="$(pwd)/parity_results/score_ab_${tier}${sfx}_seed${seed}.json"
    if [ -f "$score" ]; then
      echo "=== skip ${tier} seed ${seed} (already scored) ==="
      continue
    fi
    echo "=== ours train ${tier} seed ${seed} ==="
    env $EXTRA PARITY_OBJ=$OBJ PARITY_SEED=$seed PARITY_OUT=$out \
      PARITY_STEPS=8000 PARITY_BATCH=256 \
      python scripts/parity_reference.py ours > "$out.train.log" 2>&1 \
      || { echo "TRAIN FAILED ${tier}/${seed}"; tail -3 "$out.train.log"; continue; }
    echo "=== ours score ${tier} seed ${seed} ==="
    env $SCORE_EXTRA PARITY_OBJ=$OBJ PARITY_SEED=$seed PARITY_OUT=$out \
      PARITY_STEPS=8000 PARITY_BATCH=256 PARITY_SCORE_OUT=$score \
      python scripts/parity_reference.py score ours > "$out.score.log" 2>&1 \
      || { echo "SCORE FAILED ${tier}/${seed}"; tail -3 "$out.score.log"; }
    tail -c 300 "$score" 2>/dev/null; echo
  done
done
echo "=== precision A/B done ==="
