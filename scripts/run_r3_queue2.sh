#!/bin/bash
# Round-3 chip queue, session 4: remaining production matrix + gates.
# Steps 1-2 of run_r3_followup.sh (narrow-kernel validation, fused-GN bench)
# are done (PERF.md); this picks up from the bedroom int8 serving bench.
# Run with the host otherwise idle:
#   nohup bash scripts/run_r3_queue2.sh > /tmp/r3_queue2.log 2>&1 &
set -x
cd /root/repo

# 0. Current BENCH number (cold cache on this machine; also warms it)
timeout 3600 python bench.py 2>&1 | tail -3

# 1. Bedroom int8 serving bench (the LDM-shape int8 number VERDICT asks for)
EDM_FUSED_ATTN_NARROW=1 \
timeout 4500 python scripts/perf_ldm.py --task bedroom --quick-calib \
    --skip-recon --serve int8 --sample-batches 2 2>&1 | tail -12

# 1b. Matching WAQ baseline same session (for the in-run ratio)
timeout 4500 python scripts/perf_ldm.py --task bedroom --quick-calib \
    --skip-recon --serve waq --sample-batches 2 2>&1 | tail -12

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

echo "=== R3 QUEUE2 DONE ==="
