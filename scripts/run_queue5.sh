#!/bin/bash
# Final imagenet window, row-capped recon (see --recon-rows rationale).
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
run 6600 $PL --task imagenet --phase recon --calib 256 --iters 50 \
    --recon-rows 128 \
 && run 2100 $PL --task imagenet --phase sample --calib 256 --serve int8 \
      --sample-batches 2 \
 && touch /tmp/imagenet_int8_row_done
run 1800 python scripts/probe.py --stage serving-model
run 2400 $PL --task imagenet --phase sample --serve fp --calib 64 \
    --sample-batches 2
echo "=== R5 QUEUE5 DONE ==="
