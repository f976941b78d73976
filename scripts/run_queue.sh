#!/bin/bash
# Chip work queue — ONE parameterized script (round-4 verdict next #8;
# the numbered run_queue{2..7}.sh generations of round 5's mid-round
# triage live in git history).
#
# Usage:
#   echo <epoch-deadline> > /tmp/r5_deadline   # adjust live
#   nohup bash scripts/run_queue.sh [item ...] > /tmp/queue.log 2>&1 &
# Items (default: the full round-5 production list, priority order):
#   accel:<task>    fp + fpbf16 + int8 ms/denoise-step rows
#   matrix:<task>   calib -> recon (row-capped; retry) -> int8 sample
#                   -> validate snapshot, exit-code-gated
#   gate            recon-deviation seed-noise control
#   probe           two-shape serving probe (policy regression + roofline)
#   cifar-snap      CIFAR accuracy snapshot
#
# Operational rules learned on-chip (PERF.md / ROUND_NOTES round 5):
#  * ONE serve per process — relay-resident compiled programs are only
#    freed by process exit (quick-calib re-execs into a clean sampler);
#  * every phase timeout doubles as the deadline guard, so an admitted
#    phase can never overrun the deadline;
#  * sample/validate are exit-code-gated on calib/recon (a timed-out
#    recon must not masquerade as post-recon results);
#  * transformer-heavy recon plans are compile-dominated (~4 min/target
#    on a 1-core host): budget recon windows from the plan length, and
#    use --recon-rows to cap row-linear capture cost.
set -x
cd /root/repo
DEADLINE_FILE=${DEADLINE_FILE:-/tmp/r5_deadline}
[ -f "$DEADLINE_FILE" ] || echo $(($(date +%s) + 10800)) > "$DEADLINE_FILE"

run() {  # run <timeout-s> <cmd...> — skip unless it can finish by DEADLINE
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

accel() {  # fp / bf16-FP / int8 serving rows for one task
  local T=$1
  run 2400 $PL --task "$T" --phase sample --serve fp     --calib 64 \
      --sample-batches 2
  run 2400 $PL --task "$T" --phase sample --serve fpbf16 --calib 64 \
      --sample-batches 2
  run 3000 $PL --task "$T" --quick-calib --skip-recon --serve int8 \
      --calib 64 --sample-batches 2
}

matrix() {  # real calib -> recon (one retry; per-group resume) -> int8
            # sampling -> accuracy snapshot, exit-code-gated
  local T=$1; shift
  run 3000 $PL --task "$T" --phase calib --calib 256 --traj-batch 32 \
   && { run 6600 $PL --task "$T" --phase recon --calib 256 --iters 50 \
            --recon-rows 128 \
        || run 6600 $PL --task "$T" --phase recon --calib 256 --iters 50 \
            --recon-rows 128; } \
   && run 2400 $PL --task "$T" --phase sample --calib 256 --serve auto \
        --sample-batches 2 \
   && run 3000 python scripts/validate_ptq.py --task "$T" --n 32 \
        --quant_state "/tmp/perf_ldm_state/$T/quant_state" \
        --custom_steps 20 --batch_size 8 --serve auto "$@"
}

gate() {
  run 9000 python scripts/gate_recon_deviations.py --iters 500 --n 256 \
      --with-control 7 \
   || run 3900 python scripts/gate_recon_deviations.py --iters 400 --n 160 \
      --with-control 7
}

probe() { run 1800 python scripts/probe.py --stage serving-model; }

cifar_snap() {
  run 3600 python scripts/validate_ptq.py --task cifar --n 64 \
      --calib_num_samples 256 --iters 50 --timesteps 20 --batch_size 32 \
      --serve int8
}

if [ $# -gt 0 ]; then
  for item in "$@"; do
    case "$item" in
      accel:*)  accel "${item#accel:}" ;;
      matrix:*) matrix "${item#matrix:}" ;;
      gate)     gate ;;
      probe)    probe ;;
      cifar-snap) cifar_snap ;;
      *) echo "unknown item: $item" ;;
    esac
  done
else
  accel bedroom; accel imagenet
  matrix imagenet
  gate
  accel church; accel coco
  matrix church; matrix coco --text_encoder tiny; matrix bedroom
  probe; cifar_snap
fi
echo "=== QUEUE DONE ==="
