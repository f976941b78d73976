"""On-chip probe: where does act-scale calibration wall-clock go?

Times CALIB_W and per-batch CALIB_A on the full CIFAR arch (compile vs
steady-state), to direct the scale-init optimization (VERDICT round 1,
next-round item 7).  Run on the real chip: ``python scripts/perf_probe_calib.py``.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp


def main():
    from eda_dm_tpu.models.ddpm_unet import DDPMUNet, DDPMConfig
    from eda_dm_tpu.quant import QuantConfig, QuantMode, FP
    from eda_dm_tpu.utils.run import enable_compilation_cache

    enable_compilation_cache()

    arch = DDPMConfig()
    qc = QuantConfig(weight_bit=4, act_bit=8)
    model = DDPMUNet(cfg=arch, qc=qc)
    key = jax.random.PRNGKey(0)
    n, bs = 1024, 256
    x = jax.random.normal(key, (n, 32, 32, 3))
    t = jax.random.uniform(key, (n,), minval=0, maxval=1000.0)

    small = (x[:8], t[:8])
    t0 = time.perf_counter()
    variables = jax.jit(lambda: model.init(key, *small, FP))()
    jax.block_until_ready(variables)
    print(f"init: {time.perf_counter() - t0:.1f}s", flush=True)

    calib_w = QuantMode(w_quant=True, calib_w=True)
    calib_a = QuantMode(w_quant=True, a_quant=True, calib_a=True)

    step = jax.jit(
        lambda v, b, m: model.apply(v, *b, mode=m, mutable=["quant"])[1],
        static_argnums=2)

    t0 = time.perf_counter()
    upd = step(variables, small, calib_w)
    jax.block_until_ready(upd)
    print(f"calib_w (compile+run): {time.perf_counter() - t0:.1f}s",
          flush=True)
    variables = {**variables, "quant": upd["quant"]}

    for i in range(n // bs):
        batch = (x[i * bs:(i + 1) * bs], t[i * bs:(i + 1) * bs])
        t0 = time.perf_counter()
        upd = step(variables, batch, calib_a)
        jax.block_until_ready(upd)
        print(f"calib_a batch {i}: {time.perf_counter() - t0:.1f}s",
              flush=True)
        variables = {**variables, "quant": upd["quant"]}


if __name__ == "__main__":
    main()
