#!/bin/bash
# Round-4 post-chain TPU work (runs after scripts/r4_tpu_chain.sh frees the
# chip; serial — one tunneled chip):
#   1. bench.py sanity (validates the ADVICE MFU-gating edit on TPU)
#   2. rings-8k production-net checkpoints (seeds 42, 7) — the 8k-vs-50k
#      zero-band comparison needs same-net short-schedule fields
#      (VERDICT r3 item 2)
#   3. rings-50k oracle sweep EXTENDED beyond the shipped menu bracket
#      (item 2's second half; preserves the r3-menu validation file)
#   4. zero_band.py over every schedule-comparison checkpoint on disk
#   5. bench_extract_multi.py on the fresh 200k DTU-conf checkpoint
#      (item 6 'Done' measurement)
#   6. selector-vs-GT-oracle on the r4 production checkpoints (seed 3's
#      0.04 pick scored 0.640 — quantify its regret at production protocol)
#   7. cache_acts kernel A/B (VERDICT item 8 follow-through)
set -u
cd "$(dirname "$0")/.."

echo "=== [1/7] bench sanity ==="
timeout 1200 python bench.py | tee /tmp/bench_r4.json || echo "BENCH FAILED"

echo "=== [2/7] rings-8k production-net checkpoints ==="
for seed in 42 7; do
  out="e2e_rings8k/s${seed}"
  if [ -f "$out/exp/cube000/emap/checkpoints/ckpt_best.npz" ]; then
    echo "skip rings8k seed ${seed}"; continue
  fi
  mkdir -p "$out"
  E2E_STEPS=8000 E2E_BATCH=512 E2E_OBJ=rings E2E_SEED=$seed \
  E2E_OUT="$(pwd)/$out" E2E_RES=96 \
    timeout 3600 python scripts/e2e_synthetic.py > "$out.log" 2>&1 \
    || echo "rings8k seed ${seed} FAILED"
  tail -c 300 "$out.log"; echo
done

echo "=== [3/7] rings-50k extended threshold sweep ==="
if [ -f e2e_rings50k/autothresh_validation.json ] && \
   [ ! -f e2e_rings50k/autothresh_validation_r3menu.json ]; then
  cp e2e_rings50k/autothresh_validation.json \
     e2e_rings50k/autothresh_validation_r3menu.json
fi
AT_OUT="$(pwd)/e2e_rings50k" AT_OBJ=rings AT_SEEDS="42 7 99 3 1234" \
AT_THRESHOLDS="0.0075 0.01 0.015 0.02 0.03 0.04 0.05 0.06 0.075" \
AT_RES=96 AT_DEFAULT=0.03 \
  timeout 7200 python scripts/validate_autothresh.py \
  > e2e_rings50k/extended_sweep.log 2>&1 || echo "EXTENDED SWEEP FAILED"
tail -c 400 e2e_rings50k/extended_sweep.log; echo

echo "=== [4/7] zero-band measurement ==="
timeout 7200 python scripts/zero_band.py > /tmp/zero_band.log 2>&1 \
  || echo "ZERO BAND FAILED"
tail -3 /tmp/zero_band.log

echo "=== [5/7] selector-extraction cost: shared vs per-candidate ==="
timeout 3600 python scripts/bench_extract_multi.py \
  > /tmp/bench_extract_multi.log 2>&1 || echo "BEM FAILED"
tail -2 /tmp/bench_extract_multi.log

echo "=== [6/7] r4 prod suite: selector vs GT oracle at production protocol ==="
AP_DIRS="prod_suite_r4/s42 prod_suite_r4/s7 prod_suite_r4/s99 prod_suite_r4/s3 prod_suite_r4/s1234" \
AP_OUT="$(pwd)/prod_suite_r4/autothresh_prod.json" \
  timeout 10800 python scripts/autothresh_prod.py \
  > prod_suite_r4/autothresh_prod.log 2>&1 || echo "AP FAILED"
tail -2 prod_suite_r4/autothresh_prod.log

echo "=== [7/7] cache_acts kernel A/B at production shape ==="
timeout 3600 python scripts/bench_cache_acts.py \
  > /tmp/bench_cache_acts.log 2>&1 || echo "CA FAILED"
tail -4 /tmp/bench_cache_acts.log

echo "=== r4 post-chain done ==="
