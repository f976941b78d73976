#!/bin/bash
# Waits for the in-flight bedroom int8 serving run (PID $1), then:
#   1b. bedroom WAQ baseline (same-session ratio)
#   P.  serving Amdahl/diagnostic profile (regression: BENCH int8 0.973)
set -x
cd /root/repo
while kill -0 "$1" 2>/dev/null; do sleep 30; done

timeout 4500 python scripts/perf_ldm.py --task bedroom --quick-calib \
    --skip-recon --serve waq --sample-batches 2 2>&1 | tail -12

timeout 5400 python scripts/perf_profile_bench.py 2>&1 | tail -40

echo "=== R3 INTERJECT DONE ==="
