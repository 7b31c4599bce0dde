#!/bin/bash
# Round-4 serial TPU job chain (one chip — jobs must not overlap):
#   1. production-CLI ABC suite, 5 seeds, at the CURRENT shipped defaults
#      (fuse_pe via conf + auto_threshold selector ON) -> prod_suite_r4/
#      (VERDICT r3 item 1)
#   2. fresh-seed 200k DTU-conf run + extended-menu selector + GT oracle
#      (VERDICT r3 item 4) -> e2e_dtu200k_s7/
#   3. same for Replica-conf -> e2e_replica200k_s7/
set -u
cd "$(dirname "$0")/.."

echo "=== [1/3] production ABC suite (5 seeds, current defaults) ==="
OUT_BASE=prod_suite_r4 bash scripts/prod_suite.sh "42 7 99 3 1234" \
  2>&1 | tee prod_suite_r4.log

echo "=== [2/3] 200k DTU-conf, fresh seed 7, extended menu + oracle ==="
DTU200K_CONF=DTU DTU200K_SEED=7 DTU200K_OUT=./e2e_dtu200k_s7 \
DTU200K_ORACLE="0.005 0.0075 0.01 0.015 0.02 0.03" \
  python scripts/run_200k_dtu.py > e2e_dtu200k_s7.log 2>&1 \
  || echo "DTU 200k seed 7 FAILED"
tail -c 400 e2e_dtu200k_s7/report.json 2>/dev/null; echo

echo "=== [3/3] 200k Replica-conf, fresh seed 7, extended menu + oracle ==="
DTU200K_CONF=Replica DTU200K_SEED=7 DTU200K_OUT=./e2e_replica200k_s7 \
DTU200K_ORACLE="0.005 0.0075 0.01 0.015 0.02 0.03" \
  python scripts/run_200k_dtu.py > e2e_replica200k_s7.log 2>&1 \
  || echo "Replica 200k seed 7 FAILED"
tail -c 400 e2e_replica200k_s7/report.json 2>/dev/null; echo

echo "=== r4 TPU chain done ==="
