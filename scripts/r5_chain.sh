#!/bin/bash
# Round-5 serialized TPU chain (single chip, single CPU core — one job at
# a time). VERDICT r4 items 3/6/4 in priority order:
#   1. Production-protocol rings suite (ABC.conf verbatim, obj=rings),
#      seeds 42/7/99 — the curve path's first production-CLI numbers.
#   2. 200k widening: DTU + Replica conf verbatim at fresh seed 99
#      (checkpoints KEPT for step 3).
#   3. GT fit-draw tables (threshold menu x 4 fit seeds) on the fresh
#      200k checkpoints — the evidence behind shipping fit_draws>1 (or
#      keeping 1) in DTU/Replica confs.
#   4. If time remains: second fresh seed (3) per 200k conf -> n=4.
# Each stage skips if its artifact already exists, so the chain is
# resumable after interruption.
set -u
cd "$(dirname "$0")/.."
LOG=r5_chain.log
log() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

mkdir -p prod_rings_r5 r5_200k parity_results

log "=== r5 chain start ==="

# ---- 1. rings production suite --------------------------------------
for seed in 42 7 99; do
  out="$(pwd)/prod_rings_r5/s${seed}"
  if [ -f "$out/report.json" ]; then log "rings s$seed: skip"; continue; fi
  log "rings s$seed: start"
  PROD_CONF=ABC PROD_OBJ=rings PROD_SEED=$seed PROD_OUT="$out" \
    python scripts/run_production.py > "$out.log" 2>&1 \
    || { log "rings s$seed: FAILED rc=$?"; continue; }
  log "rings s$seed: done $(python -c "import json;r=json.load(open('$out/report.json'));print(r['score']['fscore_0.005'])" 2>/dev/null)"
done

# ---- 2. 200k widening, seed 99 --------------------------------------
for conf in DTU Replica; do
  lc=$(echo "$conf" | tr 'A-Z' 'a-z')
  out="$(pwd)/r5_200k/${lc}_s99"
  if [ -f "$out/report.json" ]; then log "200k $conf s99: skip"; continue; fi
  log "200k $conf s99: start"
  PROD_CONF=$conf PROD_SEED=99 PROD_OUT="$out" \
    python scripts/run_production.py > "$out.log" 2>&1 \
    || { log "200k $conf s99: FAILED rc=$?"; continue; }
  log "200k $conf s99: done $(python -c "import json;r=json.load(open('$out/report.json'));print(r['score']['fscore_0.005'])" 2>/dev/null)"
done

# ---- 3. GT fit-draw tables on the fresh 200k checkpoints ------------
for conf in dtu replica; do
  outj="parity_results/fit_draws_${conf}200k_grid.json"
  rundir="r5_200k/${conf}_s99"
  if [ -f "$outj" ]; then log "grid $conf: skip"; continue; fi
  if [ ! -f "$rundir/report.json" ]; then log "grid $conf: no run dir"; continue; fi
  log "grid $conf: start"
  FG_DIR="$rundir" FG_OBJ=cube FG_SEEDS="42 0 1 2" FG_OUT="$outj" \
    python scripts/fit_draws_gt_grid.py > "parity_results/fit_draws_${conf}200k_grid.log" 2>&1 \
    || { log "grid $conf: FAILED rc=$?"; continue; }
  log "grid $conf: done"
done

# ---- 4. optional second fresh seed per 200k conf --------------------
for conf in DTU Replica; do
  lc=$(echo "$conf" | tr 'A-Z' 'a-z')
  out="$(pwd)/r5_200k/${lc}_s3"
  if [ -f "$out/report.json" ]; then log "200k $conf s3: skip"; continue; fi
  log "200k $conf s3: start"
  PROD_CONF=$conf PROD_SEED=3 PROD_OUT="$out" \
    python scripts/run_production.py > "$out.log" 2>&1 \
    || { log "200k $conf s3: FAILED rc=$?"; continue; }
  log "200k $conf s3: done $(python -c "import json;r=json.load(open('$out/report.json'));print(r['score']['fscore_0.005'])" 2>/dev/null)"
done

log "=== r5 chain complete ==="
