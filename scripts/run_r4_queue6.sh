#!/bin/bash
# Round-4 chip queue, session 9 — fills the remaining task-matrix rows
# after the gate+seed-control run (launched separately; pass its pid as
# WAITPID so the chip is never double-booked).  The fresh machine lost
# /tmp/perf_ldm_state, so each task re-runs calib before recon.  ImageNet
# first (short 20-step trajectories, rows missing since round 3), then
# church.  calib is 256 on this cold-cache machine to fit the session;
# rows are labelled with their calib size in PERF.md either way.
#   WAITPID=<pid> nohup bash scripts/run_r4_queue6.sh <deadline-epoch> \
#       > /tmp/r4_queue6.log 2>&1 &
set -x
cd /root/repo
DEADLINE=${1:-$(($(date +%s) + 9000))}   # default: 2h30m from launch

if [ -n "$WAITPID" ]; then
  while ps -p "$WAITPID" > /dev/null 2>&1; do sleep 20; done
fi

guard() {  # guard <seconds-this-phase-needs>
  local now=$(date +%s)
  if [ $((now + $1)) -gt "$DEADLINE" ]; then
    echo "=== DEADLINE: skipping phase (now=$now need=$1) ==="
    return 1
  fi
  return 0
}

# 0. BENCH on this machine first — session-4 taught that fresh stacks can
# move the int8/bf16 balance; an early number leaves time to react before
# the driver's end-of-round run.
guard 1200 && timeout 1800 python bench.py 2>&1 | tail -3

# 1. ImageNet (cin256 CFG): calib, recon, int8 sampling, snapshot
guard 1500 && timeout 2400 python scripts/perf_ldm.py --task imagenet \
    --phase calib --calib 256 --traj-batch 32 2>&1 | tail -10
guard 3600 && timeout 4800 python scripts/perf_ldm.py --task imagenet \
    --phase recon --calib 256 --iters 50 2>&1 | tail -40
guard 1500 && timeout 2400 python scripts/perf_ldm.py --task imagenet \
    --phase sample --calib 256 --serve int8 --sample-batches 2 2>&1 | tail -12
guard 1500 && timeout 2400 python scripts/validate_ptq.py --task imagenet \
    --n 32 --quant_state /tmp/perf_ldm_state/imagenet/quant_state \
    --custom_steps 20 --batch_size 8 --serve int8 2>&1 | tail -8

# 2. Church (LDM-8, 32x32 latents): calib, recon, int8 sampling, snapshot
guard 2400 && timeout 3600 python scripts/perf_ldm.py --task church \
    --phase calib --calib 256 --traj-batch 32 2>&1 | tail -10
guard 3600 && timeout 4800 python scripts/perf_ldm.py --task church \
    --phase recon --calib 256 --iters 50 2>&1 | tail -40
guard 1500 && timeout 2400 python scripts/perf_ldm.py --task church \
    --phase sample --calib 256 --serve int8 --sample-batches 2 2>&1 | tail -12
guard 1500 && timeout 2400 python scripts/validate_ptq.py --task church \
    --n 32 --quant_state /tmp/perf_ldm_state/church/quant_state \
    --custom_steps 20 --batch_size 8 --serve int8 2>&1 | tail -8

# 3. COCO analogue (SD arch, tiny text encoder)
guard 2400 && timeout 3600 python scripts/perf_ldm.py --task coco \
    --phase calib --traj-batch 8 2>&1 | tail -10
guard 3600 && timeout 4800 python scripts/perf_ldm.py --task coco \
    --phase recon --iters 50 2>&1 | tail -40
guard 1500 && timeout 2400 python scripts/perf_ldm.py --task coco \
    --phase sample --serve int8 --sample-batches 2 2>&1 | tail -12

echo "=== R4 QUEUE6 DONE ==="
