#!/bin/bash
# Round-4 chip queue, session 8 — replaces run_r4_queue4.sh with deadline
# guards (queue4 had none, risking contention with the driver's
# end-of-round bench on the single chip).  The first gate run produced a
# degenerate all-zero metric (raw random-init Inception features collapse;
# see gate_recon_deviations.py::_metrics) — rerun with the standardized
# metric at iters 500.  Then ImageNet recon + int8 sampling + snapshot
# (calib state already saved this session), then church, then coco, then
# the CIFAR snapshot.  Every phase is skipped once the deadline passes.
#   WAITPID=<pid> nohup bash scripts/run_r4_queue5.sh <deadline-epoch> \
#       > /tmp/r4_queue5.log 2>&1 &
set -x
cd /root/repo
DEADLINE=${1:-$(($(date +%s) + 11400))}   # default: 3h10m from launch

# wait for any still-running chip process from the previous queue
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

# 1. Recon-deviation end-metric gate, standardized features (verdict item 3)
guard 3600 && timeout 3900 python scripts/gate_recon_deviations.py \
    --iters 500 2>&1 | tail -25

# 2. ImageNet (cin256 CFG): recon, int8 sampling, snapshot
guard 5400 && timeout 5400 python scripts/perf_ldm.py --task imagenet \
    --phase recon --calib 512 --iters 50 2>&1 | tail -40
guard 1800 && timeout 2400 python scripts/perf_ldm.py --task imagenet \
    --phase sample --calib 512 --serve int8 --sample-batches 2 2>&1 | tail -12
guard 1800 && timeout 2400 python scripts/validate_ptq.py --task imagenet \
    --n 32 --quant_state /tmp/perf_ldm_state/imagenet/quant_state \
    --custom_steps 20 --batch_size 8 --serve int8 2>&1 | tail -8

# 3. Church (LDM-8, 32x32 latents): calib, recon, int8 sampling, snapshot
guard 2700 && timeout 3600 python scripts/perf_ldm.py --task church \
    --phase calib --calib 512 --traj-batch 32 2>&1 | tail -10
guard 4500 && timeout 5400 python scripts/perf_ldm.py --task church \
    --phase recon --calib 512 --iters 50 2>&1 | tail -40
guard 1800 && timeout 2400 python scripts/perf_ldm.py --task church \
    --phase sample --calib 512 --serve int8 --sample-batches 2 2>&1 | tail -12
guard 1800 && timeout 2400 python scripts/validate_ptq.py --task church \
    --n 32 --quant_state /tmp/perf_ldm_state/church/quant_state \
    --custom_steps 20 --batch_size 8 --serve int8 2>&1 | tail -8

# 4. COCO analogue (SD arch, Tiny text encoder; calib capped to 256)
guard 2700 && timeout 3600 python scripts/perf_ldm.py --task coco \
    --phase calib --traj-batch 8 2>&1 | tail -10
guard 4500 && timeout 5400 python scripts/perf_ldm.py --task coco \
    --phase recon --iters 50 2>&1 | tail -40
guard 1800 && timeout 2400 python scripts/perf_ldm.py --task coco \
    --phase sample --serve int8 --sample-batches 2 2>&1 | tail -12
guard 1800 && timeout 2400 python scripts/validate_ptq.py --task coco \
    --n 32 --quant_state /tmp/perf_ldm_state/coco/quant_state \
    --custom_steps 20 --batch_size 8 --serve int8 2>&1 | tail -8

# 5. CIFAR accuracy snapshot (full PTQ in-process; no saved state needed)
guard 3600 && timeout 4500 python scripts/validate_ptq.py --task cifar \
    --n 128 --calib_num_samples 256 --iters 100 --timesteps 20 \
    --batch_size 128 --serve int8 2>&1 | tail -8

echo "=== R4 QUEUE5 DONE ==="
