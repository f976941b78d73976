"""Benchmark: W4A8 UNet denoise steps/sec/chip on the CIFAR-10 DDPM UNet.

Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``value`` is the quantized serving path: W4A8 deployment export
(eda_dm_tpu/quant/export.py::export_serving — hard-rounded 4/8-bit weights
folded once, runtime 8-bit activation quantizers, bf16 carrier dtype) at
the reference's FID sampling batch size (500, configs/cifar10.yml
sampling.batch_size).  ``vs_baseline`` is the ratio vs the FP32 forward on
the same chip — the analogue of the reference's "acceleration vs FP"
headline (README.md:92-124, 1.75-1.88x on RTX 3090 via external INT8 CUDA
kernels; here the carrier is bf16 + folded int-grid weights, numerics
identical to the fake-quant path up to carrier rounding).
"""

import json
import time

import jax
import jax.numpy as jnp


def main():
    from eda_dm_tpu.models.ddpm_unet import DDPMUNet, DDPMConfig
    from eda_dm_tpu.quant import QuantConfig, QuantMode, FP

    arch = DDPMConfig()          # full CIFAR-10 architecture (35M params)
    qc = QuantConfig(weight_bit=4, act_bit=8)
    model = DDPMUNet(cfg=arch, qc=qc)
    key = jax.random.PRNGKey(0)
    batch = 500
    x = jax.random.normal(key, (batch, 32, 32, 3))
    t = jnp.full((batch,), 500.0)

    small = (jax.random.normal(key, (8, 32, 32, 3)), jnp.full((8,), 1.0))
    variables = jax.jit(lambda: model.init(key, *small, FP))()
    _, upd = jax.jit(lambda v: model.apply(
        v, *small, QuantMode(w_quant=True, calib_w=True),
        mutable=["quant"]))(variables)
    variables = {**variables, "quant": upd["quant"]}
    _, upd = jax.jit(lambda v: model.apply(
        v, *small, QuantMode(w_quant=True, a_quant=True, calib_a=True),
        mutable=["quant"]))(variables)
    variables = {**variables, "quant": upd["quant"]}

    from eda_dm_tpu.quant.export import export_serving, DEPLOY

    serving = export_serving(variables, qc)      # folded weights, bf16 carrier
    x16 = x.astype(jnp.bfloat16)

    def bench_mode(vs, xx, mode, iters=10):
        fn = jax.jit(lambda v, x, t: model.apply(v, x, t, mode))
        fn(vs, xx, t).block_until_ready()                 # compile
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(vs, xx, t)
        out.block_until_ready()
        return iters / (time.perf_counter() - t0)

    q_sps = bench_mode(serving, x16, DEPLOY)
    fp_sps = bench_mode(variables, x, FP)

    print(json.dumps({
        "metric": "W4A8 UNet denoise steps/sec/chip (batch 500, CIFAR arch)",
        "value": round(q_sps, 3),
        "unit": "steps/s",
        "vs_baseline": round(q_sps / fp_sps, 3),
    }))


if __name__ == "__main__":
    main()
