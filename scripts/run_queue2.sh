#!/bin/bash
# Round-5 queue, part 2 — the remaining items after the accel bedroom/
# imagenet phases, re-prioritized mid-round (see run_queue.sh for the
# guard design).  Reasons for the reshuffle:
#  * four accel rows were lost to OOMs whose fixes landed after their
#    phases started (perf_ldm single-serve free, quick-calib re-exec,
#    imagenet f4-VAE); their makeups must not sit at the deadline-skipped
#    tail — the acceleration table is verdict #1;
#  * the 9000s gate guard would starve church/coco accel if it ran
#    mid-queue; it moves behind them and gets a reduced-n fallback so a
#    short round still lands the control arm.
set -x
cd /root/repo
DEADLINE_FILE=${DEADLINE_FILE:-/tmp/r5_deadline}
[ -f "$DEADLINE_FILE" ] || echo $(($(date +%s) + 10800)) > "$DEADLINE_FILE"

run() {  # run <timeout-s> <cmd...> — skip unless it can finish by DEADLINE
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

# 1. Accel makeups (bedroom fpbf16/int8, imagenet fp/fpbf16)
run 2400 $PL --task bedroom  --phase sample --serve fpbf16 --calib 64 \
    --sample-batches 2
run 3000 $PL --task bedroom  --quick-calib --skip-recon --serve int8 \
    --calib 64 --sample-batches 2
run 2400 $PL --task imagenet --phase sample --serve fp     --calib 64 \
    --sample-batches 2
run 2400 $PL --task imagenet --phase sample --serve fpbf16 --calib 64 \
    --sample-batches 2

matrix() {  # matrix <task> <calib-timeout> <recon-timeout> <traj-batch> [extra validate args]
  local T=$1 CT=$2 RT=$3 TB=$4; shift 4
  run "$CT" $PL --task "$T" --phase calib --calib 256 --traj-batch "$TB" \
   && { run "$RT" $PL --task "$T" --phase recon --calib 256 --iters 50 \
        || run "$RT" $PL --task "$T" --phase recon --calib 256 --iters 50; } \
   && run 2400 $PL --task "$T" --phase sample --calib 256 --serve int8 \
        --sample-batches 2 \
   && run 3000 python scripts/validate_ptq.py --task "$T" --n 32 \
        --quant_state "/tmp/perf_ldm_state/$T/quant_state" \
        --custom_steps 20 --batch_size 8 --serve int8 "$@"
}

# 2. The two-rounds-outstanding imagenet matrix (verdict missing #1)
matrix imagenet 3000 4800 32

accel() {  # accel <task> <fp-timeout> <int8-timeout>
  local T=$1
  run "$2" $PL --task "$T" --phase sample --serve fp     --calib 64 \
      --sample-batches 2
  run "$2" $PL --task "$T" --phase sample --serve fpbf16 --calib 64 \
      --sample-batches 2
  run "$3" $PL --task "$T" --quick-calib --skip-recon --serve int8 \
      --calib 64 --sample-batches 2
}

# 3. Complete the acceleration table (verdict missing #2)
accel church 2400 3000
accel coco   2700 3600

# 4. Recon-deviation seed-noise control (verdict missing #3): full-power
#    run if the window allows, else a reduced-n control that still
#    executes the decision rule (d(A,A') vs d(A,B) on paired samples).
run 9000 python scripts/gate_recon_deviations.py --iters 500 --n 256 \
    --with-control 7 \
 || run 4200 python scripts/gate_recon_deviations.py --iters 500 --n 128 \
    --with-control 7

# 5. Remaining matrices + probes + cifar snapshot
matrix church   3600 4800 32
matrix coco     3600 4800 8 --text_encoder tiny
matrix bedroom  3600 4800 32
run 1800 python scripts/probe.py --stage serving-model
run 3600 python scripts/validate_ptq.py --task cifar --n 64 \
    --calib_num_samples 256 --iters 50 --timesteps 20 --batch_size 32 \
    --serve int8

echo "=== R5 QUEUE2 DONE ==="
