#!/bin/bash
# Round-3 follow-up queue: phases that failed in run_r3_production.sh
# (imagenet recon timed out under host contention; imagenet/bedroom int8
# sampling hit the heads-layout VMEM tiling bug, fixed in 33485b2) plus
# on-chip validation of the narrow-lane kernels and the re-bench.
# Run with the host otherwise idle:
#   nohup bash scripts/run_r3_followup.sh > /tmp/r3_followup.log 2>&1 &
set -x
cd /root/repo

# 1. Narrow-kernel on-chip validation (parity + timing)
timeout 3000 python scripts/validate_narrow_kernels.py 2>&1 | tail -30

# 2. Re-bench with the fused GN + bf16 carrier (target >= 1.3)
timeout 3000 python bench.py 2>&1 | tail -3

# 3. Bedroom int8 serving bench (fixed kernels; narrow attn enabled)
EDM_FUSED_ATTN_NARROW=1 EDM_FUSED_GN_NARROW=1 \
timeout 3000 python scripts/perf_ldm.py --task bedroom --quick-calib \
    --skip-recon --serve int8 --sample-batches 2 2>&1 | tail -10

# 4. ImageNet recon (per-group captures — the shared-capture universe was
#    the 700-990 s/target regression) + int8 sampling
timeout 12000 python scripts/perf_ldm.py --task imagenet --phase recon \
    --iters 50 2>&1 | tail -40
EDM_FUSED_ATTN_NARROW=1 EDM_FUSED_GN_NARROW=1 \
timeout 3000 python scripts/perf_ldm.py --task imagenet --phase sample \
    --serve int8 --sample-batches 2 2>&1 | tail -10

# 5. Church recon rerun (same regression) + int8 sampling on recon state
timeout 12000 python scripts/perf_ldm.py --task church --phase recon \
    --iters 50 2>&1 | tail -40
EDM_FUSED_ATTN_NARROW=1 EDM_FUSED_GN_NARROW=1 \
timeout 3000 python scripts/perf_ldm.py --task church --phase sample \
    --serve int8 --sample-batches 2 2>&1 | tail -10

echo "=== R3 FOLLOWUP QUEUE DONE ==="
