#!/bin/bash
# Round-5 final window: complete the imagenet matrix in one long recon
# (per-group resume continues from queue2's checkpoints) + the int8
# sample row.  Chosen over church/coco accel + the gate control: the
# imagenet recon+int8 row is the verdict's oldest repeatedly-missed item
# and this is the last round — a completed production run beats two more
# partial tables.  Tail items run only if time remains.
set -x
cd /root/repo
DEADLINE_FILE=${DEADLINE_FILE:-/tmp/r5_deadline}

run() {
  local t=$1; shift
  local left=$(( $(cat "$DEADLINE_FILE") - $(date +%s) ))
  if [ "$t" -gt "$left" ]; then
    echo "=== SKIP (need ${t}s, ${left}s left): $*"
    return 1
  fi
  echo "=== [$(date +%H:%M:%S)] start (timeout ${t}s): $*"
  timeout "$t" "$@"
  local rc=$?
  echo "=== [$(date +%H:%M:%S)] rc=$rc: $*"
  return $rc
}

PL="python scripts/perf_ldm.py"

run 8100 $PL --task imagenet --phase recon --calib 256 --iters 50 \
 && run 2100 $PL --task imagenet --phase sample --calib 256 --serve int8 \
      --sample-batches 2 \
 && touch /tmp/imagenet_int8_row_done

# tail: only if the window somehow allows
run 1800 python scripts/probe.py --stage serving-model
run 2400 $PL --task imagenet --phase sample --serve fp --calib 64 \
    --sample-batches 2

echo "=== R5 QUEUE4 DONE ==="
