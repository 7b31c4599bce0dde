#!/bin/bash
# Multi-seed PRODUCTION-schedule suite: confs/ABC.conf verbatim (50k x 1024
# rays, res-128 thr-0.02 extraction) at varied training seeds, via
# scripts/run_production.py. Seed 42 is the recorded e2e_prod_abc row
# (F@5mm 0.8385); this adds the other seeds for the 5-seed production
# stats at the PRODUCTION extraction settings (the e2e_synthetic harness
# runs a smaller 512-ray/res-96/thr-0.03 protocol and is noisier).
#
# Usage: bash scripts/prod_suite.sh [seeds]   (default "7 99 3 1234")
#   OUT_BASE env (default prod_suite) picks the suite directory — r4 runs
#   at the current shipped defaults (fuse_pe via conf + selector on) go to
#   a fresh dir so the r3 fixed-threshold rows stay comparable.
set -u
cd "$(dirname "$0")/.."
SEEDS=${1:-"7 99 3 1234"}
OUT_BASE=${OUT_BASE:-prod_suite}
mkdir -p "$OUT_BASE"
for seed in $SEEDS; do
  out="$(pwd)/${OUT_BASE}/s${seed}"
  report="$out/report.json"
  if [ -f "$report" ]; then
    echo "=== skip seed ${seed} (already run) ==="
    continue
  fi
  echo "=== production ABC seed ${seed} -> ${out} ==="
  PROD_CONF=ABC PROD_SEED=$seed PROD_OUT=$out \
    python scripts/run_production.py > "$out.log" 2>&1 \
    || { echo "RUN FAILED seed ${seed}"; continue; }
  tail -c 600 "$report" 2>/dev/null; echo
done
echo "=== production suite done ==="
