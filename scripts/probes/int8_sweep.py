"""Quick full-model int8 serving sweep at the BENCH shape (batch 500).

Sweeps the remaining serving knobs around the policy defaults to confirm
each default is the measured-best choice:
  - fused softmax on/off (einsum attention path)
  - int8 accumulator int32/f32
  - attention impl override (policy=einsum at this shape; force fused)

Run on an idle chip: python scripts/perf_sweep_int8.py
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
    from eda_dm_tpu.quant.export import export_serving_int8, DEPLOY_INT8
    from eda_dm_tpu.utils.run import enable_compilation_cache

    enable_compilation_cache()
    arch = DDPMConfig()
    qc = QuantConfig(weight_bit=4, act_bit=8)
    model = DDPMUNet(cfg=arch, qc=qc)
    key = jax.random.PRNGKey(0)
    batch, k = 500, 20
    x = jax.random.normal(key, (batch, 32, 32, 3)).astype(jnp.bfloat16)
    t = jnp.full((batch,), 500.0)

    small = (jax.random.normal(key, (8, 32, 32, 3)), jnp.full((8,), 1.0))
    v = jax.jit(lambda: model.init(key, *small, FP))()
    _, u = jax.jit(lambda vv: model.apply(
        vv, *small, QuantMode(w_quant=True, calib_w=True),
        mutable=["quant"]))(v)
    v = {**v, "quant": u["quant"]}
    _, u = jax.jit(lambda vv: model.apply(
        vv, *small, QuantMode(w_quant=True, a_quant=True, calib_a=True),
        mutable=["quant"]))(v)
    v = {**v, "quant": u["quant"]}
    s8 = export_serving_int8(v, qc)

    from probes import env_sweep

    def rate(env):
        with env_sweep(env):
            def scan_fn(vv, x0, tt):
                def body(c, _):
                    out = model.apply(vv, c, tt, DEPLOY_INT8)
                    return (c + 0.001 * out.astype(c.dtype)), ()
                c, _ = jax.lax.scan(body, x0, None, length=k)
                return jnp.sum(c.astype(jnp.float32))
            fn = jax.jit(scan_fn)
            float(fn(s8, x, t))
            t0 = time.perf_counter()
            out = None
            for _ in range(3):
                out = fn(s8, x, t)
            float(out)
            return 3 * k / (time.perf_counter() - t0)

    for label, env in (
            ("policy defaults           ", {}),
            ("fused softmax OFF         ", {"EDM_FUSED_SOFTMAX": "0"}),
            ("acc=f32                   ", {"EDM_INT8_ACC": "f32"}),
            ("force fused attn          ", {"EDM_FUSED_ATTN": "1"}),
            ("attn folded (int8 conv on)", {"EDM_INT8_ATTN": "0"}),
    ):
        print(f"{label}  {rate(env):8.2f} steps/s", flush=True)


if __name__ == "__main__":
    main()
