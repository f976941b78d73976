"""Resblock conv-variant probe (session 5 of the BENCH regression hunt).

perf_probe_attn.py showed the sink is the resblock: int8 297.5 steps/s vs
bf16-FP 371.8 at 32x32x128 (the attention einsum path already matches its
bf16-FP bound).  Hypotheses: (a) the int32 accumulator materializes before
the dequant epilogue (EDM_INT8_ACC=f32 fuses it), (b) the int8 quantize+pad
pass doesn't fuse with the producer GN (folded bf16 path avoids it).

Run on an idle chip:  python scripts/perf_probe_resblock.py
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
    from eda_dm_tpu.models.ddpm_unet import DDPMUNet, DDPMConfig, ResnetBlockD
    from eda_dm_tpu.quant import QuantConfig, QuantMode, FP
    from eda_dm_tpu.quant.export import export_serving_int8, DEPLOY_INT8
    from eda_dm_tpu.utils.run import enable_compilation_cache

    enable_compilation_cache()
    qc = QuantConfig(weight_bit=4, act_bit=8)
    key = jax.random.PRNGKey(0)
    batch = 500
    k = 20

    def calibrate(mod, shapes):
        xs = [jax.random.normal(jax.random.PRNGKey(i), s)
              for i, s in enumerate(shapes)]
        v = jax.jit(lambda: mod.init(key, *xs, FP))()
        _, u = jax.jit(lambda vv: mod.apply(
            vv, *xs, QuantMode(w_quant=True, calib_w=True),
            mutable=["quant"]))(v)
        v = {**v, "quant": u["quant"]}
        _, u = jax.jit(lambda vv: mod.apply(
            vv, *xs, QuantMode(w_quant=True, a_quant=True, calib_a=True),
            mutable=["quant"]))(v)
        return {**v, "quant": u["quant"]}, xs

    def stage_rate(mod, v, xs, mode, cast):
        xx = [a.astype(cast) for a in xs]

        def scan_fn(vv, x0):
            def body(c, _):
                o = mod.apply(vv, c, *xx[1:], mode)
                return (c + 0.001 * o.astype(c.dtype)), ()
            c, _ = jax.lax.scan(body, x0, None, length=k)
            return jnp.sum(c.astype(jnp.float32))
        return bench_scan(scan_fn, v, xx[0], k=k)

    bf16 = jnp.bfloat16
    ENVS = [
        ("int8 acc=i32 (current)", {}),
        ("int8 acc=f32          ", {"EDM_INT8_ACC": "f32"}),
        ("folded bf16 fake-quant", {"EDM_INT8_CONV": "0"}),
        ("int8 acc=f32 +fusedGN ", {"EDM_INT8_ACC": "f32",
                                    "EDM_FUSED_GN": "1"}),
    ]
    KEYS = ("EDM_INT8_ACC", "EDM_INT8_CONV", "EDM_FUSED_GN")

    for shape, ch in (((batch, 32, 32, 128), 128), ((batch, 16, 16, 256),
                                                    256)):
        res = ResnetBlockD(out_ch=ch, temb_ch=512, wq=qc.wq, aq=qc.aq)
        v, xs = calibrate(res, [shape, (batch, 512)])
        v8 = export_serving_int8(v, qc)
        print(f"=== resblock {shape[1]}x{shape[2]}x{ch} (steps/s) ===",
              flush=True)
        from probes import env_sweep
        for label, env in ENVS:
            with env_sweep(env):
                r = stage_rate(res, v8, xs, DEPLOY_INT8, bf16)
            print(f"{label} {r:8.1f}", flush=True)

    # ---- full model: the two candidate best configs ----------------------
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

    def full():
        def scan_fn(vv, x0, tt):
            def body(c, _):
                out = model.apply(vv, c, tt, DEPLOY_INT8)
                return (c + 0.001 * out.astype(c.dtype)), ()
            c, _ = jax.lax.scan(body, x0, None, length=k)
            return jnp.sum(c.astype(jnp.float32))
        return bench_scan(scan_fn, serving8, x16, t, k=k)

    print("=== full model (steps/s) ===", flush=True)
    from probes import env_sweep
    for label, env in (
            ("int8 acc=f32 + einsum attn",
             {"EDM_INT8_ACC": "f32", "EDM_FUSED_ATTN": "0"}),
            ("folded bf16 + int8 einsum attn",
             {"EDM_INT8_CONV": "0", "EDM_FUSED_ATTN": "0"})):
        with env_sweep(env):
            print(f"{label}  {full():8.2f}", flush=True)


if __name__ == "__main__":
    main()
