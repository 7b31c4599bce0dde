#!/bin/bash
# Round-5 follow-on: wait for the main chain, then widen the production
# rings suite to n=5 (seeds 3, 1234).
set -u
cd "$(dirname "$0")/.."
LOG=r5_chain.log
log() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }
CHAIN_PID=$(cat /tmp/r5_chain.pid 2>/dev/null || echo "")
if [ -n "$CHAIN_PID" ]; then
  while kill -0 "$CHAIN_PID" 2>/dev/null; do sleep 60; done
fi
for seed in 3 1234; do
  out="$(pwd)/prod_rings_r5/s${seed}"
  if [ -f "$out/report.json" ]; then log "rings s$seed: skip"; continue; fi
  log "rings s$seed: start (chain2)"
  PROD_CONF=ABC PROD_OBJ=rings PROD_SEED=$seed PROD_OUT="$out" \
    python scripts/run_production.py > "$out.log" 2>&1 \
    || { log "rings s$seed: FAILED rc=$?"; continue; }
  log "rings s$seed: done $(python -c "import json;r=json.load(open('$out/report.json'));print(r['score']['fscore_0.005'])" 2>/dev/null)"
done
log "=== r5 chain2 complete ==="
