"""Recurring two-shape model-level serving probe (round-4 verdict weak #7).

Times full-model scan-fused denoise steps/s at BOTH ends of the serving
policy's decision surface — the CIFAR BENCH shape (batch 500, 32² pixels,
S=256 attention, wide batch·heads) and the bedroom LDM shape (batch 50,
64² latents, S=1024/256 attention, narrow 32-channel heads) — for
fp32-FP / bf16-FP / native-int8, so the shape-keyed policy crossovers
(ops/serving_policy.py: einsum vs fused vs flash attention, conv paths)
are regression-checked each round at both ends, not just bench.py's
single BENCH point.

    python scripts/probe.py --stage serving-model [--reps 3] [--k 20]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp


def _rate(model, v, x, t, mode, k, reps):
    def scan_fn(vv, x0, tt):
        def body(c, _):
            out = model.apply(vv, c, tt, mode=mode)
            return (c + 0.001 * out.astype(c.dtype)), ()
        c, _ = jax.lax.scan(body, x0, None, length=k)
        return jnp.sum(c.astype(jnp.float32))
    fn = jax.jit(scan_fn)
    float(fn(v, x, t))                       # compile + real readback sync
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn(v, x, t)
    float(out)                               # forced readback (PERF.md)
    return reps * k / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--shapes", default="cifar,bedroom")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny arches + CPU platform (smoke test only)")
    args = ap.parse_args()
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")

    from eda_dm_tpu.quant import QuantConfig, FP
    from eda_dm_tpu.quant.export import export_serving_int8, DEPLOY_INT8
    from eda_dm_tpu.utils.run import enable_compilation_cache

    enable_compilation_cache()
    qc = QuantConfig(weight_bit=4, act_bit=8)
    key = jax.random.PRNGKey(0)
    results = {}

    for name in args.shapes.split(","):
        if name == "cifar":
            from eda_dm_tpu.models.ddpm_unet import DDPMUNet, DDPMConfig
            cfg = (DDPMConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                              attn_resolutions=(8,), resolution=16)
                   if args.tiny else DDPMConfig())
            model = DDPMUNet(cfg=cfg, qc=qc)
            batch, res, ch = (4, 16, 3) if args.tiny else (500, 32, 3)
        elif name == "bedroom":
            from eda_dm_tpu.models.ldm_unet import LDMUNet
            from eda_dm_tpu.models.latent_diffusion import bedroom_config
            ucfg = bedroom_config().unet
            if args.tiny:
                import dataclasses
                ucfg = dataclasses.replace(
                    ucfg, image_size=16, model_channels=32,
                    num_res_blocks=1, attention_resolutions=(2,),
                    channel_mult=(1, 2))
            model = LDMUNet(cfg=ucfg, qc=qc)
            batch, res, ch = (4, 16, 3) if args.tiny else (50, 64, 3)
        else:
            raise SystemExit(f"unknown shape {name}")

        small_x = jax.random.normal(key, (8, res, res, ch))
        small_t = jnp.full((8,), 500.0)
        from eda_dm_tpu.quant import QuantMode
        v = jax.jit(lambda m=model: m.init(key, small_x, small_t,
                                           mode=FP))()
        _, u = jax.jit(lambda vv: model.apply(
            vv, small_x, small_t,
            mode=QuantMode(w_quant=True, calib_w=True),
            mutable=["quant"]))(v)
        v = {**v, "quant": u["quant"]}
        _, u = jax.jit(lambda vv: model.apply(
            vv, small_x, small_t,
            mode=QuantMode(w_quant=True, a_quant=True, calib_a=True),
            mutable=["quant"]))(v)
        v = {**v, "quant": u["quant"]}
        s8 = export_serving_int8(v, qc)
        v16 = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, v)

        x = jax.random.normal(key, (batch, res, res, ch))
        t = jnp.full((batch,), 500.0)
        x16 = x.astype(jnp.bfloat16)

        row = {
            "fp32": _rate(model, v, x, t, FP, args.k, args.reps),
            "bf16fp": _rate(model, v16, x16, t, FP, args.k, args.reps),
            "int8": _rate(model, s8, x16, t, DEPLOY_INT8, args.k,
                          args.reps),
        }
        row["int8_vs_fp32"] = row["int8"] / row["fp32"]
        row["int8_vs_bf16fp"] = row["int8"] / row["bf16fp"]
        results[name] = {k_: round(v_, 3) for k_, v_ in row.items()}
        print(f"[{name}] batch {batch} {res}x{res}: "
              f"fp32 {row['fp32']:.2f} / bf16-FP {row['bf16fp']:.2f} / "
              f"int8 {row['int8']:.2f} steps/s "
              f"(int8 vs fp32 {row['int8_vs_fp32']:.3f}x, "
              f"vs bf16-FP {row['int8_vs_bf16fp']:.3f}x)", flush=True)
        del v, v16, s8
        jax.clear_caches()

    print(json.dumps({"serving_model_probe": results}), flush=True)


if __name__ == "__main__":
    main()
