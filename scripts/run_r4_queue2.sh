#!/bin/bash
# Round-4 chip queue, part 2 — started after queue 1's bedroom phases
# complete, with the remainder re-prioritized: the recon-deviation
# end-metric gate (round-3 verdict item 3) runs FIRST so it cannot be
# starved by the long task-matrix tail, then the remaining tasks
# (imagenet, church, coco), then the per-task accuracy snapshots
# (verdict item 6) reusing the saved quant states.
#   nohup bash scripts/run_r4_queue2.sh > /tmp/r4_queue2.log 2>&1 &
set -x
cd /root/repo

# 1. End-metric gate for the grouped-recon deviations (verdict item 3)
timeout 7200 python scripts/gate_recon_deviations.py --iters 1000 \
    2>&1 | tail -25

# 2. ImageNet (cin256 CFG): calib, recon, int8 sampling
timeout 9000 python scripts/perf_ldm.py --task imagenet --phase calib \
    --calib 512 --traj-batch 32 2>&1 | tail -10
timeout 12000 python scripts/perf_ldm.py --task imagenet --phase recon \
    --calib 512 --iters 50 2>&1 | tail -40
timeout 4500 python scripts/perf_ldm.py --task imagenet --phase sample \
    --calib 512 --serve int8 --sample-batches 2 2>&1 | tail -12

# 3. Church (LDM-8, 32x32 latents): calib, recon, int8 sampling
timeout 9000 python scripts/perf_ldm.py --task church --phase calib \
    --calib 1024 --traj-batch 32 2>&1 | tail -10
timeout 12000 python scripts/perf_ldm.py --task church --phase recon \
    --calib 1024 --iters 50 2>&1 | tail -40
timeout 4500 python scripts/perf_ldm.py --task church --phase sample \
    --calib 1024 --serve int8 --sample-batches 2 2>&1 | tail -12

# 4. COCO analogue (SD arch, Tiny text encoder; calib capped to 256)
timeout 9000 python scripts/perf_ldm.py --task coco --phase calib \
    --traj-batch 8 2>&1 | tail -10
timeout 12000 python scripts/perf_ldm.py --task coco --phase recon \
    --iters 50 2>&1 | tail -40
timeout 4500 python scripts/perf_ldm.py --task coco --phase sample \
    --serve int8 --sample-batches 2 2>&1 | tail -12

# 5. Accuracy snapshots (verdict item 6), reusing saved quant states
timeout 7200 bash scripts/run_r4_snapshots.sh 2>&1 | tail -40

echo "=== R4 QUEUE2 DONE ==="
