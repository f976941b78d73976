#!/bin/bash
# Round-4 chip queue, part 3 — re-planned after the part-1 recon OOMs.
# Order: the recon-deviation end-metric gate FIRST (round-3 verdict item
# 3, open for two rounds), then the bedroom/imagenet recon reruns on the
# fixed capture path (OOM-retry + donated-buffer chunk writes + per-group
# resume), then church/coco, then the accuracy snapshots.  Every phase is
# skipped once the deadline passes so the driver's end-of-round bench
# never contends with a queue phase.
#   nohup bash scripts/run_r4_queue3.sh <deadline-epoch> > /tmp/r4_queue3.log 2>&1 &
set -x
cd /root/repo
DEADLINE=${1:-$(($(date +%s) + 34200))}   # default: 9.5 h from launch

guard() {  # guard <seconds-this-phase-needs>
  local now=$(date +%s)
  if [ $((now + $1)) -gt "$DEADLINE" ]; then
    echo "=== DEADLINE: skipping remaining phases (now=$now need=$1) ==="
    exit 0
  fi
}

# 1. End-metric gate for the grouped-recon deviations (verdict item 3)
guard 9000
timeout 9000 python scripts/gate_recon_deviations.py --iters 1000 \
    2>&1 | tail -25

# 2. Bedroom recon rerun (per-group resume; fresh start, old run saved none)
guard 9000
timeout 9000 python scripts/perf_ldm.py --task bedroom --phase recon \
    --calib 512 --iters 50 2>&1 | tail -45

# 3. ImageNet recon rerun + int8 sampling (VQ chunked decode fix)
guard 9000
timeout 9000 python scripts/perf_ldm.py --task imagenet --phase recon \
    --calib 512 --iters 50 2>&1 | tail -45
guard 4200
timeout 4200 python scripts/perf_ldm.py --task imagenet --phase sample \
    --calib 512 --serve int8 --sample-batches 2 2>&1 | tail -12

# 4. Church (LDM-8, 32x32 latents): calib state (1024 rows) saved by the
# part-1 calib phase that finished standalone; recon/sample reuse it
guard 9000
timeout 9000 python scripts/perf_ldm.py --task church --phase recon \
    --calib 1024 --iters 50 2>&1 | tail -45
guard 4200
timeout 4200 python scripts/perf_ldm.py --task church --phase sample \
    --calib 1024 --serve int8 --sample-batches 2 2>&1 | tail -12

# 5. COCO analogue (SD arch, Tiny text encoder; calib capped to 256)
guard 7200
timeout 7200 python scripts/perf_ldm.py --task coco --phase calib \
    --traj-batch 8 2>&1 | tail -10
guard 9000
timeout 9000 python scripts/perf_ldm.py --task coco --phase recon \
    --iters 50 2>&1 | tail -45
guard 4200
timeout 4200 python scripts/perf_ldm.py --task coco --phase sample \
    --serve int8 --sample-batches 2 2>&1 | tail -12

# 6. Accuracy snapshots (verdict item 6), reusing saved quant states
guard 7200
timeout 10800 bash scripts/run_r4_snapshots.sh 2>&1 | tail -40

echo "=== R4 QUEUE3 DONE ==="
