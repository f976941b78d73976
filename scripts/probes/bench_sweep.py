"""Where does the BENCH serving time go?  Amdahl breakdown on the chip.

Times scan-fused full-model forwards (batch 500, CIFAR arch — exactly the
BENCH configuration) across carrier/path variants, with forced scalar
readbacks (the relay's ``block_until_ready`` can return early):

  fp32          FP weights/acts in f32 (the BENCH baseline)
  fp_bf16       FP weights/acts cast to bf16 — the dtype-only headroom:
                if this matches int8, the int8 conv win is being eaten by
                the quantize/dequant machinery, not the convs
  waq_bf16      export_serving folded weights, bf16 carrier (DEPLOY)
  int8          export_serving_int8 + DEPLOY_INT8 (the BENCH headline)

plus isolated stage probes at the dominant shapes so per-stage shares can
be attributed (resblock 32x32x128, attnblock 16x16x256).

Run on an idle chip:  python scripts/perf_profile_bench.py
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
    float(jfn(*args))                        # compile + sync
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = jfn(*args)
    float(out)                               # forced readback
    return reps * k / (time.perf_counter() - t0)


def main():
    from eda_dm_tpu.models.ddpm_unet import DDPMUNet, DDPMConfig
    from eda_dm_tpu.quant import QuantConfig, QuantMode, FP
    from eda_dm_tpu.quant.export import (export_serving, export_serving_int8,
                                         DEPLOY, DEPLOY_INT8)
    from eda_dm_tpu.utils.run import enable_compilation_cache

    enable_compilation_cache()
    arch = DDPMConfig()
    qc = QuantConfig(weight_bit=4, act_bit=8)
    model = DDPMUNet(cfg=arch, qc=qc)
    key = jax.random.PRNGKey(0)
    batch = 500
    x32 = jax.random.normal(key, (batch, 32, 32, 3))
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

    serving = export_serving(variables, qc)
    serving8 = export_serving_int8(variables, qc)
    vars_bf16 = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        variables)
    x16 = x32.astype(jnp.bfloat16)

    k = 20

    def full(vs, xx, mode):
        def scan_fn(v, x0, tt):
            def body(c, _):
                out = model.apply(v, c, tt, mode)
                return (c + 0.001 * out.astype(c.dtype)), ()
            c, _ = jax.lax.scan(body, x0, None, length=k)
            return jnp.sum(c.astype(jnp.float32))
        return bench_scan(scan_fn, vs, xx, t, k=k)

    print("=== full-model scan-fused steps/s (batch 500) ===", flush=True)
    r_fp32 = full(variables, x32, FP)
    print(f"fp32       {r_fp32:8.2f} steps/s", flush=True)
    r_bf16 = full(vars_bf16, x16, FP)
    print(f"fp_bf16    {r_bf16:8.2f} steps/s   (dtype-only headroom)",
          flush=True)
    r_waq = full(serving, x16, DEPLOY)
    print(f"waq_bf16   {r_waq:8.2f} steps/s", flush=True)
    # kernel-gate sweep: env gates are read at trace time; each full() call
    # builds a fresh jit so the setting takes effect
    for attn, smax in ((1, 1), (0, 1), (1, 0), (0, 0)):
        os.environ["EDM_FUSED_ATTN"] = str(attn)
        os.environ["EDM_FUSED_SOFTMAX"] = str(smax)
        r_int8 = full(serving8, x16, DEPLOY_INT8)
        print(f"int8 attn={attn} smax={smax} {r_int8:8.2f} steps/s   "
              f"(vs fp32 {r_int8 / r_fp32:.3f}, "
              f"vs bf16 {r_int8 / r_bf16:.3f})", flush=True)
    os.environ.pop("EDM_FUSED_ATTN", None)
    os.environ.pop("EDM_FUSED_SOFTMAX", None)

    # --- stage probes: one ResnetBlock / AttnBlock at dominant shapes -----
    from eda_dm_tpu.models.ddpm_unet import ResnetBlockD, AttnBlockD
    from eda_dm_tpu.quant.config import QuantizerSpec

    wq = qc.wq
    aq = qc.aq
    aq_w = qc.aq_softmax(always_zero=False)

    def stage(mod, shapes, mode_pairs, extra=()):
        xs = [jax.random.normal(jax.random.PRNGKey(i), s) for i, s in
              enumerate(shapes)]
        v = jax.jit(lambda: mod.init(key, *xs, *extra, FP))()
        _, u = jax.jit(lambda vv: mod.apply(
            vv, *xs, *extra, QuantMode(w_quant=True, calib_w=True),
            mutable=["quant"]))(v)
        v = {**v, "quant": u["quant"]}
        _, u = jax.jit(lambda vv: mod.apply(
            vv, *xs, *extra,
            QuantMode(w_quant=True, a_quant=True, calib_a=True),
            mutable=["quant"]))(v)
        v = {**v, "quant": u["quant"]}
        out = {}
        for name, mode, exporter in mode_pairs:
            vv = exporter(v) if exporter else v
            cast = (jnp.bfloat16 if name != "fp32" else jnp.float32)
            xx = [a.astype(cast) for a in xs]
            if name == "fp32":
                vv = v
            def scan_fn(vvv, x0, rest=xx[1:]):
                def body(c, _):
                    o = mod.apply(vvv, c, *[r for r in rest], *extra, mode)
                    return (c + 0.001 * o.astype(c.dtype)), ()
                c, _ = jax.lax.scan(body, x0, None, length=k)
                return jnp.sum(c.astype(jnp.float32))
            out[name] = bench_scan(scan_fn, vv, xx[0], k=k)
        return out

    # --- raw conv dtype probes (is there an int4 MXU mode on this part?) --
    print("=== conv3x3 500x32x32x128 dtype probes ===", flush=True)

    def conv_rate(xd, wd, label):
        try:
            xx = (jax.random.normal(key, (batch, 32, 32, 128)) * 10)
            ww = (jax.random.normal(key, (3, 3, 128, 128)) * 7)
            xx = xx.astype(xd) if xd != jnp.int4 else \
                jnp.clip(xx, -7, 7).astype(jnp.int4)
            ww = ww.astype(wd) if wd != jnp.int4 else \
                jnp.clip(ww, -7, 7).astype(jnp.int4)
            acc_t = (jnp.float32 if xd in (jnp.float32, jnp.bfloat16)
                     else jnp.int32)

            lim = 7 if xd == jnp.int4 else 127

            def chain(a, w):
                def body(c, _):
                    o = jax.lax.conv_general_dilated(
                        c, w, (1, 1), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        preferred_element_type=acc_t)
                    return jnp.clip(o, -lim, lim).astype(a.dtype), ()
                c, _ = jax.lax.scan(body, a, None, length=k)
                return jnp.sum(c.astype(jnp.float32))
            r = bench_scan(chain, xx, ww, k=k)
            flops = 2 * batch * 32 * 32 * 9 * 128 * 128
            print(f"{label}: {r:7.1f} convs/s = {r * flops / 1e12:6.1f} T/s",
                  flush=True)
        except Exception as e:  # int4 lowering may be unsupported
            print(f"{label}: unsupported ({type(e).__name__}: {e})",
                  flush=True)

    conv_rate(jnp.bfloat16, jnp.bfloat16, "bf16 x bf16")
    conv_rate(jnp.int8, jnp.int8, "int8 x int8")
    conv_rate(jnp.int8, jnp.int4, "int8 x int4")
    conv_rate(jnp.int4, jnp.int4, "int4 x int4")

    exp8 = lambda v: export_serving_int8(v, qc)
    modes = [("fp32", FP, None), ("int8", DEPLOY_INT8, exp8)]

    print("=== stage probes (steps/s of the stage alone) ===", flush=True)
    res = stage(ResnetBlockD(out_ch=128, temb_ch=512, wq=wq, aq=aq),
                [(batch, 32, 32, 128), (batch, 512)], modes)
    print(f"resblock 32x32x128: fp32 {res['fp32']:.1f}  int8 {res['int8']:.1f}"
          f"  ratio {res['int8'] / res['fp32']:.3f}", flush=True)
    res = stage(ResnetBlockD(out_ch=256, temb_ch=512, wq=wq, aq=aq),
                [(batch, 16, 16, 256), (batch, 512)], modes)
    print(f"resblock 16x16x256: fp32 {res['fp32']:.1f}  int8 {res['int8']:.1f}"
          f"  ratio {res['int8'] / res['fp32']:.3f}", flush=True)
    res = stage(AttnBlockD(wq=wq, aq=aq, aq_w=aq_w),
                [(batch, 16, 16, 256)], modes)
    print(f"attnblock 16x16x256: fp32 {res['fp32']:.1f}  int8 {res['int8']:.1f}"
          f"  ratio {res['int8'] / res['fp32']:.3f}", flush=True)


if __name__ == "__main__":
    main()
