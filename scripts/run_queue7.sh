#!/bin/bash
# Post-discovery window: imagenet native-int8 measured 3x SLOWER than
# bf16-FP (1504 vs 482 ms/step) - the spatial-transformer family is a
# pathological shape for the int8 path.  Establish the best *quantized*
# serving for this family (folded-weight bf16, a real W4A8 deployment
# path) and then the cost-analysis probe.
set -x
cd /root/repo
DEADLINE_FILE=${DEADLINE_FILE:-/tmp/r5_deadline}
run() {
  local t=$1; shift
  local left=$(( $(cat "$DEADLINE_FILE") - $(date +%s) ))
  if [ "$t" -gt "$left" ]; then
    echo "=== SKIP (need ${t}s, ${left}s left): $*"; return 1
  fi
  echo "=== [$(date +%H:%M:%S)] start (timeout ${t}s): $*"
  timeout "$t" "$@"; local rc=$?
  echo "=== [$(date +%H:%M:%S)] rc=$rc: $*"; return $rc
}
PL="python scripts/perf_ldm.py"
run 2100 $PL --task imagenet --phase sample --calib 256 --serve bf16 \
    --sample-batches 2

run 1800 $PL --task church --phase sample --serve fp --calib 64 \
    --sample-batches 2
echo "=== R5 QUEUE7 DONE ==="
