#!/bin/bash
# Remaining round-4 TPU work after the tunnel outage (2026-08-19 ~23:00):
# steps 5-7 of r4_post_chain.sh (step 5 was mid-flight when the tunnel
# wedged) plus the chain_mode kernel A/B and a final bench sanity.
set -u
cd "$(dirname "$0")/.."

echo "=== [R 1/5] selector-extraction cost: shared vs per-candidate ==="
timeout 3600 python scripts/bench_extract_multi.py \
  > /tmp/bench_extract_multi.log 2>&1 || echo "BEM FAILED"
tail -2 /tmp/bench_extract_multi.log

echo "=== [R 2/5] r4 prod suite: selector vs GT oracle at production protocol ==="
AP_DIRS="prod_suite_r4/s42 prod_suite_r4/s7 prod_suite_r4/s99 prod_suite_r4/s3 prod_suite_r4/s1234" \
AP_OUT="$(pwd)/prod_suite_r4/autothresh_prod.json" \
  timeout 10800 python scripts/autothresh_prod.py \
  > prod_suite_r4/autothresh_prod.log 2>&1 || echo "AP FAILED"
tail -2 prod_suite_r4/autothresh_prod.log

echo "=== [R 3/5] cache_acts kernel A/B at production shape ==="
timeout 3600 python scripts/bench_cache_acts.py \
  > /tmp/bench_cache_acts.log 2>&1 || echo "CA FAILED"
tail -4 /tmp/bench_cache_acts.log

echo "=== [R 4/5] chain_mode interleave kernel A/B at production shape ==="
timeout 3600 python scripts/bench_chain_mode.py \
  > /tmp/bench_chain_mode.log 2>&1 || echo "CM FAILED"
tail -4 /tmp/bench_chain_mode.log

echo "=== [R 5/5] bench sanity ==="
timeout 1200 python bench.py | tee /tmp/bench_r4_final.json || echo "BENCH FAILED"

echo "=== r4 tpu resume done ==="
