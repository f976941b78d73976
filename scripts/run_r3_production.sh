#!/bin/bash
# Round-3 production matrix (VERDICT item 3): serial single-chip queue.
# Each phase runs in its own process (compiled-program residency, PERF.md);
# state hand-off via --state-dir.  Run from the repo root:
#   nohup bash scripts/run_r3_production.sh > /tmp/r3_prod.log 2>&1 &
set -x
cd /root/repo

S=/tmp/perf_ldm_state

# 1. Bedroom int8-vs-waq serving bench (quant state via quick calib)
timeout 3000 python scripts/perf_ldm.py --task bedroom --quick-calib \
    --skip-recon --serve waq  --sample-batches 2 2>&1 | tail -20
timeout 3000 python scripts/perf_ldm.py --task bedroom --quick-calib \
    --skip-recon --serve int8 --sample-batches 2 2>&1 | tail -20

# 2. ImageNet: full phase-split matrix (TDAC + scale init, then recon,
#    then int8 sampling; calib state handed off via $S/imagenet)
timeout 9000 python scripts/perf_ldm.py --task imagenet --phase calib \
    --traj-batch 32 2>&1 | tail -10
timeout 9000 python scripts/perf_ldm.py --task imagenet --phase recon \
    --iters 50 2>&1 | tail -40
timeout 3000 python scripts/perf_ldm.py --task imagenet --phase sample \
    --serve int8 --sample-batches 2 2>&1 | tail -10

# 3. Church: full phase-split matrix (32² latents, f32 caches OK)
timeout 9000 python scripts/perf_ldm.py --task church --phase calib \
    --traj-batch 32 2>&1 | tail -10
timeout 9000 python scripts/perf_ldm.py --task church --phase recon \
    --iters 50 2>&1 | tail -40
timeout 3000 python scripts/perf_ldm.py --task church --phase sample \
    --serve int8 --sample-batches 2 2>&1 | tail -10

# 4. COCO analogue (SD arch, Tiny text encoder): full matrix at calib 256
timeout 9000 python scripts/perf_ldm.py --task coco --phase calib \
    --traj-batch 8 2>&1 | tail -10
timeout 9000 python scripts/perf_ldm.py --task coco --phase recon \
    --iters 50 2>&1 | tail -40
timeout 3000 python scripts/perf_ldm.py --task coco --phase sample \
    --serve int8 --sample-batches 2 2>&1 | tail -10

# 5. End-metric gate for the grouped-recon deviations (VERDICT item 4)
timeout 7200 python scripts/gate_recon_deviations.py --iters 1000 \
    2>&1 | tail -20

echo "=== R3 PRODUCTION QUEUE DONE ==="
