"""Attention-variant Amdahl probe for the BENCH serving regression.

perf_profile_bench.py (session 5) showed: on the current stack the bf16-FP
full model runs 18.14 steps/s vs fp32 15.28, while every quantized path
sits at 14.5-15.2 — the quantization machinery eats the entire bf16 margin
and the int8 conv win.  Stage ratios vs *fp32* look fine (resblocks
1.16-1.32x), so the right baseline is the bf16-FP stage.  This probe times
the attention block and resblock variants against that baseline, then the
full model in the candidate best configuration (int8 convs + fake-quant
bf16 attention, EDM_INT8_ATTN=0).

Run on an idle chip:  python scripts/perf_probe_attn.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp


def bench_scan(fn, *args, k=20, reps=3):
    jfn = jax.jit(fn)
    float(jfn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = jfn(*args)
    float(out)
    return reps * k / (time.perf_counter() - t0)


def main():
    from eda_dm_tpu.models.ddpm_unet import (DDPMUNet, DDPMConfig,
                                             AttnBlockD, ResnetBlockD)
    from eda_dm_tpu.quant import QuantConfig, QuantMode, FP
    from eda_dm_tpu.quant.export import (export_serving, export_serving_int8,
                                         DEPLOY, DEPLOY_INT8)
    from eda_dm_tpu.utils.run import enable_compilation_cache

    enable_compilation_cache()
    qc = QuantConfig(weight_bit=4, act_bit=8)
    key = jax.random.PRNGKey(0)
    batch = 500
    k = 20

    def calibrate(mod, shapes, extra=()):
        xs = [jax.random.normal(jax.random.PRNGKey(i), s)
              for i, s in enumerate(shapes)]
        v = jax.jit(lambda: mod.init(key, *xs, *extra, FP))()
        _, u = jax.jit(lambda vv: mod.apply(
            vv, *xs, *extra, QuantMode(w_quant=True, calib_w=True),
            mutable=["quant"]))(v)
        v = {**v, "quant": u["quant"]}
        _, u = jax.jit(lambda vv: mod.apply(
            vv, *xs, *extra,
            QuantMode(w_quant=True, a_quant=True, calib_a=True),
            mutable=["quant"]))(v)
        return {**v, "quant": u["quant"]}, xs

    def stage_rate(mod, v, xs, mode, cast, extra=()):
        xx = [a.astype(cast) for a in xs]

        def scan_fn(vv, x0):
            def body(c, _):
                o = mod.apply(vv, c, *xx[1:], *extra, mode)
                return (c + 0.001 * o.astype(c.dtype)), ()
            c, _ = jax.lax.scan(body, x0, None, length=k)
            return jnp.sum(c.astype(jnp.float32))
        return bench_scan(scan_fn, v, xx[0], k=k)

    bf16 = jnp.bfloat16
    cast_bf16 = lambda t: jax.tree.map(
        lambda a: a.astype(bf16) if a.dtype == jnp.float32 else a, t)

    # ---- attention block 16x16x256 --------------------------------------
    attn = AttnBlockD(wq=qc.wq, aq=qc.aq, aq_w=qc.aq_softmax(False))
    v, xs = calibrate(attn, [(batch, 16, 16, 256)])
    v8 = export_serving_int8(v, qc)
    vfold = export_serving(v, qc)
    print("=== attnblock 16x16x256, batch 500 (steps/s) ===", flush=True)
    print(f"fp32-FP     {stage_rate(attn, v, xs, FP, jnp.float32):8.1f}",
          flush=True)
    print(f"bf16-FP     {stage_rate(attn, cast_bf16(v), xs, FP, bf16):8.1f}"
          "   (upper bound)", flush=True)
    print(f"bf16-DEPLOY {stage_rate(attn, vfold, xs, DEPLOY, bf16):8.1f}"
          "   (fake-quant attn + folded convs)", flush=True)
    from probes import env_sweep
    for env, label in ((dict(EDM_INT8_ATTN="1", EDM_FUSED_ATTN="1"),
                        "int8 fused-attn "),
                       (dict(EDM_INT8_ATTN="1", EDM_FUSED_ATTN="0"),
                        "int8 einsum-attn"),
                       (dict(EDM_INT8_ATTN="0"),
                        "int8 fq-attn    ")):
        # each config starts from a clean EDM_* slate (no inheritance from
        # the previous iteration) and restores the environment on exception
        with env_sweep(env):
            r = stage_rate(attn, v8, xs, DEPLOY_INT8, bf16)
        print(f"{label} {r:8.1f}", flush=True)

    # ---- resblock 32x32x128 ----------------------------------------------
    res = ResnetBlockD(out_ch=128, temb_ch=512, wq=qc.wq, aq=qc.aq)
    v, xs = calibrate(res, [(batch, 32, 32, 128), (batch, 512)])
    v8 = export_serving_int8(v, qc)
    print("=== resblock 32x32x128, batch 500 (steps/s) ===", flush=True)
    print(f"fp32-FP     {stage_rate(res, v, xs, FP, jnp.float32):8.1f}",
          flush=True)
    print(f"bf16-FP     {stage_rate(res, cast_bf16(v), xs, FP, bf16):8.1f}",
          flush=True)
    print(f"int8        {stage_rate(res, v8, xs, DEPLOY_INT8, bf16):8.1f}",
          flush=True)

    # ---- full model: int8 convs + fq attention ---------------------------
    arch = DDPMConfig()
    model = DDPMUNet(cfg=arch, qc=qc)
    x32 = jax.random.normal(key, (batch, 32, 32, 3))
    t = jnp.full((batch,), 500.0)
    small = (jax.random.normal(key, (8, 32, 32, 3)), jnp.full((8,), 1.0))
    variables = jax.jit(lambda: model.init(key, *small, FP))()
    _, upd = jax.jit(lambda vv: model.apply(
        vv, *small, QuantMode(w_quant=True, calib_w=True),
        mutable=["quant"]))(variables)
    variables = {**variables, "quant": upd["quant"]}
    _, upd = jax.jit(lambda vv: model.apply(
        vv, *small, QuantMode(w_quant=True, a_quant=True, calib_a=True),
        mutable=["quant"]))(variables)
    variables = {**variables, "quant": upd["quant"]}
    serving8 = export_serving_int8(variables, qc)
    x16 = x32.astype(bf16)

    def full(vs, xx, mode):
        def scan_fn(vv, x0, tt):
            def body(c, _):
                out = model.apply(vv, c, tt, mode)
                return (c + 0.001 * out.astype(c.dtype)), ()
            c, _ = jax.lax.scan(body, x0, None, length=k)
            return jnp.sum(c.astype(jnp.float32))
        return bench_scan(scan_fn, vs, xx, t, k=k)

    print("=== full model, batch 500 (steps/s) ===", flush=True)
    os.environ["EDM_INT8_ATTN"] = "0"
    print(f"int8 convs + fq attention  {full(serving8, x16, DEPLOY_INT8):8.2f}",
          flush=True)
    os.environ.pop("EDM_INT8_ATTN", None)


if __name__ == "__main__":
    main()
