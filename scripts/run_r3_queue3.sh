#!/bin/bash
# Round-3 chip queue, part 3: task matrix + gate (continuation of
# run_r3_queue2.sh after the serving-regression interject).
#   nohup bash scripts/run_r3_queue3.sh > /tmp/r3_queue3.log 2>&1 &
set -x
cd /root/repo

# 2. ImageNet: calib (regenerate state), recon, int8 sampling
timeout 9000 python scripts/perf_ldm.py --task imagenet --phase calib \
    --traj-batch 32 2>&1 | tail -10
timeout 12000 python scripts/perf_ldm.py --task imagenet --phase recon \
    --iters 50 2>&1 | tail -40
EDM_FUSED_ATTN_NARROW=1 \
timeout 4500 python scripts/perf_ldm.py --task imagenet --phase sample \
    --serve int8 --sample-batches 2 2>&1 | tail -12

# 3. Church: calib, recon, int8 sampling (32^2 latents, f32 caches OK)
timeout 9000 python scripts/perf_ldm.py --task church --phase calib \
    --traj-batch 32 2>&1 | tail -10
timeout 12000 python scripts/perf_ldm.py --task church --phase recon \
    --iters 50 2>&1 | tail -40
EDM_FUSED_ATTN_NARROW=1 \
timeout 4500 python scripts/perf_ldm.py --task church --phase sample \
    --serve int8 --sample-batches 2 2>&1 | tail -12

# 4. COCO analogue (SD arch, Tiny text encoder), calib 256, traj batch 8
timeout 9000 python scripts/perf_ldm.py --task coco --phase calib \
    --traj-batch 8 2>&1 | tail -10
timeout 12000 python scripts/perf_ldm.py --task coco --phase recon \
    --iters 50 2>&1 | tail -40
EDM_FUSED_ATTN_NARROW=1 \
timeout 4500 python scripts/perf_ldm.py --task coco --phase sample \
    --serve int8 --sample-batches 2 2>&1 | tail -12

# 5. End-metric gate for the grouped-recon deviations (VERDICT item 4)
timeout 7200 python scripts/gate_recon_deviations.py --iters 1000 \
    2>&1 | tail -25

echo "=== R3 QUEUE3 DONE ==="
