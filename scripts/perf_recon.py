"""On-chip recon-throughput benchmark: full CIFAR plan, grouped vs sequential.

Round-1 measured 2712 s for 33 targets at iters=500 (PERF.md); the grouped
path (calib/recon.py::reconstruct_group) shares captures and vmaps the scan
over same-shape targets.  Usage:

    python scripts/perf_recon.py [--iters 500] [--group 4] [--calib 1024]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=500)
    ap.add_argument("--group", type=int, default=4)
    ap.add_argument("--window", type=int, default=0,
                    help="group across up to N interleaved targets")
    ap.add_argument("--calib", type=int, default=1024)
    ap.add_argument("--targets", type=int, default=0,
                    help="limit plan length (0 = full)")
    ap.add_argument("--capture-bs", type=int, default=256,
                    help="chunk size for capture forwards")
    ap.add_argument("--cache-dtype", default=None,
                    help="e.g. bfloat16 to halve activation caches")
    args_cli = ap.parse_args()

    from eda_dm_tpu.models.ddpm_unet import DDPMUNet, DDPMConfig, \
        ddpm_recon_plan
    from eda_dm_tpu.quant import QuantConfig, QuantMode, FP
    from eda_dm_tpu.calib.recon import ReconArgs, reconstruct
    from eda_dm_tpu.utils.run import enable_compilation_cache

    enable_compilation_cache()

    arch = DDPMConfig()
    qc = QuantConfig(weight_bit=4, act_bit=8)
    model = DDPMUNet(cfg=arch, qc=qc)
    key = jax.random.PRNGKey(0)
    n = args_cli.calib
    x = jax.random.normal(key, (n, 32, 32, 3))
    t = jax.random.uniform(key, (n,), minval=0, maxval=1000.0)
    cali_data = (x, t)

    small = (x[:8], t[:8])
    variables = jax.jit(lambda: model.init(key, *small, FP))()
    for mode in (QuantMode(w_quant=True, calib_w=True),
                 QuantMode(w_quant=True, a_quant=True, calib_a=True)):
        _, upd = jax.jit(lambda v, m=mode: model.apply(
            v, *small, m, mutable=["quant"]), )(variables)
        variables = {**variables, "quant": upd["quant"]}
    jax.block_until_ready(variables)
    print("calibrated (tiny batch, timing-only run)", flush=True)

    plan = ddpm_recon_plan(arch, qc)
    if args_cli.targets:
        plan = plan[:args_cli.targets]
    rargs = ReconArgs(iters=args_cli.iters, batch_size=32,
                      capture_batch_size=args_cli.capture_bs,
                      cache_dtype=args_cli.cache_dtype)

    times = []
    t_start = time.perf_counter()

    def progress(name, loss):
        dt = time.perf_counter() - (times[-1][1] if times else t_start)
        times.append((name, time.perf_counter()))
        print(f"  {name}: loss {loss:.4g}  (+{dt:.1f}s, "
              f"total {time.perf_counter() - t_start:.0f}s)", flush=True)

    variables = reconstruct(model, variables, cali_data, plan, rargs,
                            jax.random.PRNGKey(1), progress=progress,
                            group_size=args_cli.group,
                            group_window=args_cli.window)
    jax.block_until_ready(variables["quant"])
    total = time.perf_counter() - t_start
    print(f"TOTAL: {len(plan)} targets, iters={args_cli.iters}, "
          f"group={args_cli.group}, window={args_cli.window}: {total:.0f}s "
          f"({total / len(plan):.1f}s/target)", flush=True)


if __name__ == "__main__":
    main()
