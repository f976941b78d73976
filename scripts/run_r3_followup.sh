#!/bin/bash
# Round-3 follow-up queue (session 2): the /tmp phase state from the first
# production queue is gone, so calib phases are regenerated before recon.
# Ordered by headline value:
#   1. narrow-kernel on-chip validation (parity + timing)
#   2. re-bench with fused GN + bf16 carrier
#   3. bedroom int8 serving bench (the LDM-shape int8 number VERDICT asks for)
#   4. imagenet calib -> recon -> int8 sample
#   5. church   calib -> recon -> int8 sample
#   6. coco     calib -> recon -> int8 sample
#   7. end-metric gate for the grouped-recon deviations
# Run with the host otherwise idle:
#   nohup bash scripts/run_r3_followup.sh > /tmp/r3_followup.log 2>&1 &
set -x
cd /root/repo

# 1. Narrow-kernel on-chip validation (parity + timing)
timeout 3000 python scripts/validate_narrow_kernels.py 2>&1 | tail -40

# 2. Re-bench with the fused GN + bf16 carrier (target >= 1.3)
timeout 3000 python bench.py 2>&1 | tail -3

# 3. Bedroom int8 serving bench (fixed kernels; narrow attn enabled)
EDM_FUSED_ATTN_NARROW=1 EDM_FUSED_GN_NARROW=1 \
timeout 3000 python scripts/perf_ldm.py --task bedroom --quick-calib \
    --skip-recon --serve int8 --sample-batches 2 2>&1 | tail -12

# 4. ImageNet: calib (regenerate state), recon, int8 sampling
timeout 9000 python scripts/perf_ldm.py --task imagenet --phase calib \
    --traj-batch 32 2>&1 | tail -10
timeout 12000 python scripts/perf_ldm.py --task imagenet --phase recon \
    --iters 50 2>&1 | tail -40
EDM_FUSED_ATTN_NARROW=1 EDM_FUSED_GN_NARROW=1 \
timeout 3000 python scripts/perf_ldm.py --task imagenet --phase sample \
    --serve int8 --sample-batches 2 2>&1 | tail -12

# 5. Church: calib, recon, int8 sampling (32^2 latents, f32 caches OK)
timeout 9000 python scripts/perf_ldm.py --task church --phase calib \
    --traj-batch 32 2>&1 | tail -10
timeout 12000 python scripts/perf_ldm.py --task church --phase recon \
    --iters 50 2>&1 | tail -40
EDM_FUSED_ATTN_NARROW=1 EDM_FUSED_GN_NARROW=1 \
timeout 3000 python scripts/perf_ldm.py --task church --phase sample \
    --serve int8 --sample-batches 2 2>&1 | tail -12

# 6. COCO analogue (SD arch, Tiny text encoder), calib 256, traj batch 8
timeout 9000 python scripts/perf_ldm.py --task coco --phase calib \
    --traj-batch 8 2>&1 | tail -10
timeout 12000 python scripts/perf_ldm.py --task coco --phase recon \
    --iters 50 2>&1 | tail -40
EDM_FUSED_ATTN_NARROW=1 EDM_FUSED_GN_NARROW=1 \
timeout 3000 python scripts/perf_ldm.py --task coco --phase sample \
    --serve int8 --sample-batches 2 2>&1 | tail -12

# 7. End-metric gate for the grouped-recon deviations (VERDICT item 4)
timeout 7200 python scripts/gate_recon_deviations.py --iters 1000 \
    2>&1 | tail -25

echo "=== R3 FOLLOWUP QUEUE DONE ==="
