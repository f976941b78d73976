#!/bin/bash
# Round-4 accuracy snapshots (round-3 verdict item 6): per-task FP-vs-quant
# Inception-feature distance at the production architectures, reusing the
# quant states saved by run_r4_queue.sh (/tmp/perf_ldm_state/<task>).
# Random weights -> self-consistency numbers recorded as the regression
# baseline next to split_noise_floor.
#   nohup bash scripts/run_r4_snapshots.sh > /tmp/r4_snapshots.log 2>&1 &
set -x
cd /root/repo

# CIFAR: full PTQ (no queue state), production arch, reduced sampling
timeout 7200 python scripts/validate_ptq.py --task cifar --n 128 \
    --calib_num_samples 256 --iters 100 --timesteps 20 --batch_size 128 \
    --serve int8 2>&1 | tail -8

for task in bedroom imagenet church coco; do
  timeout 5400 python scripts/validate_ptq.py --task $task --n 32 \
      --quant_state /tmp/perf_ldm_state/$task/quant_state \
      --custom_steps 20 --batch_size 8 --serve int8 2>&1 | tail -8
done

echo "=== R4 SNAPSHOTS DONE ==="
