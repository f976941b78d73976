#!/bin/bash
# Round-4 chip queue, session 7 (fresh VM — the /tmp quant-state from the
# earlier session is gone).  Bedroom's full round-4 rows are already in
# PERF.md, so this queue covers the remainder in verdict-priority order:
# the recon-deviation end-metric gate first (round-3 verdict item 3), then
# imagenet recon + int8 sampling (item 2), then church, then coco, with
# each task's accuracy snapshot (item 6) taken immediately after its
# sample phase so a time-out leaves completed tasks fully recorded.
# Zero EDM_* env vars — the shape-keyed serving policy picks the kernels.
#   nohup bash scripts/run_r4_queue4.sh > /tmp/r4_queue4.log 2>&1 &
set -x
cd /root/repo

# 1. End-metric gate for the grouped-recon deviations (verdict item 3)
timeout 5400 python scripts/gate_recon_deviations.py --iters 1000 \
    2>&1 | tail -25

# 2. ImageNet (cin256 CFG): calib, recon, int8 sampling, snapshot
timeout 3600 python scripts/perf_ldm.py --task imagenet --phase calib \
    --calib 512 --traj-batch 32 2>&1 | tail -10
timeout 7200 python scripts/perf_ldm.py --task imagenet --phase recon \
    --calib 512 --iters 50 2>&1 | tail -40
timeout 3000 python scripts/perf_ldm.py --task imagenet --phase sample \
    --calib 512 --serve int8 --sample-batches 2 2>&1 | tail -12
timeout 2700 python scripts/validate_ptq.py --task imagenet --n 32 \
    --quant_state /tmp/perf_ldm_state/imagenet/quant_state \
    --custom_steps 20 --batch_size 8 --serve int8 2>&1 | tail -8

# 3. Church (LDM-8, 32x32 latents): calib, recon, int8 sampling, snapshot
timeout 3600 python scripts/perf_ldm.py --task church --phase calib \
    --calib 512 --traj-batch 32 2>&1 | tail -10
timeout 7200 python scripts/perf_ldm.py --task church --phase recon \
    --calib 512 --iters 50 2>&1 | tail -40
timeout 3000 python scripts/perf_ldm.py --task church --phase sample \
    --calib 512 --serve int8 --sample-batches 2 2>&1 | tail -12
timeout 2700 python scripts/validate_ptq.py --task church --n 32 \
    --quant_state /tmp/perf_ldm_state/church/quant_state \
    --custom_steps 20 --batch_size 8 --serve int8 2>&1 | tail -8

# 4. COCO analogue (SD arch, Tiny text encoder; calib capped to 256)
timeout 3600 python scripts/perf_ldm.py --task coco --phase calib \
    --traj-batch 8 2>&1 | tail -10
timeout 7200 python scripts/perf_ldm.py --task coco --phase recon \
    --iters 50 2>&1 | tail -40
timeout 3000 python scripts/perf_ldm.py --task coco --phase sample \
    --serve int8 --sample-batches 2 2>&1 | tail -12
timeout 2700 python scripts/validate_ptq.py --task coco --n 32 \
    --quant_state /tmp/perf_ldm_state/coco/quant_state \
    --custom_steps 20 --batch_size 8 --serve int8 2>&1 | tail -8

# 5. CIFAR accuracy snapshot (full PTQ in-process; no saved state needed)
timeout 5400 python scripts/validate_ptq.py --task cifar --n 128 \
    --calib_num_samples 256 --iters 100 --timesteps 20 --batch_size 128 \
    --serve int8 2>&1 | tail -8

echo "=== R4 QUEUE4 DONE ==="
