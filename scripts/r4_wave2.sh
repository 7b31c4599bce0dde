#!/bin/bash
# Round-4 wave 2 (runs after scripts/r4_post_chain.sh frees the chip):
# follow-ups to the rings-8k ZERO-extraction finding (both seeds, thr 0.03,
# 96^3 grid: no voxel with |udf| < menu max at 8k on the production net).
#
#   1. High-threshold selector sweep on the two 8k checkpoints: where does
#      the band actually sit at 8k, and is the 8k field usable at ANY tau?
#      (If yes: the menu just has to track the descending band. If no: short
#      schedules are genuinely undertrained on the production net.)
#   2. zero_band with taus extended past the shipped menus so the 8k rows'
#      candidate counts and halfwidths are non-degenerate.
set -u
cd "$(dirname "$0")/.."

echo "=== [w2 1/2] rings-8k high-threshold sweep ==="
AT_OUT="$(pwd)/e2e_rings8k" AT_OBJ=rings AT_SEEDS="42 7" \
AT_THRESHOLDS="0.03 0.05 0.075 0.1 0.125 0.15 0.2" \
AT_RES=96 AT_DEFAULT=0.03 \
  timeout 7200 python scripts/validate_autothresh.py \
  > e2e_rings8k/hi_tau_sweep.log 2>&1 || echo "W2 SWEEP FAILED"
tail -c 400 e2e_rings8k/hi_tau_sweep.log; echo

echo "=== [w2 2/2] zero-band extended taus on the 8k checkpoints ==="
ZB_TAUS="0.005 0.01 0.02 0.03 0.05 0.075 0.1 0.15" \
ZB_OUT=parity_results/zero_band_rings8k_hi.json \
  timeout 3600 python scripts/zero_band.py \
  rings8k_s42=e2e:e2e_rings8k/s42 rings8k_s7=e2e:e2e_rings8k/s7 \
  > /tmp/zero_band_hi.log 2>&1 || echo "W2 ZB FAILED"
tail -3 /tmp/zero_band_hi.log

echo "=== r4 wave 2 done ==="
