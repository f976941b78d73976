"""Recurring two-shape model-level serving probe + roofline (round-4
verdict weak #7 and next #4).

Times full-model scan-fused denoise steps/s at BOTH ends of the serving
policy's decision surface — the CIFAR BENCH shape (batch 500, 32² pixels,
S=256 attention, wide batch·heads) and the bedroom LDM shape (batch 50,
64² latents, S=1024/256 attention, narrow 32-channel heads) — for
fp32-FP / bf16-FP / native-int8, so the shape-keyed policy crossovers
(ops/serving_policy.py: einsum vs fused vs flash attention, conv paths)
are regression-checked each round at both ends, not just bench.py's
single BENCH point.

Each path also reports its ROOFLINE position: XLA's optimized-module cost
analysis of the same compiled scan gives bytes-accessed and flops per
step, a separate sweep probe measures the chip's achievable HBM
read+write bandwidth, and the row prints achieved steps/s as a fraction
of the bandwidth-limited bound  BW / bytes_per_step.  This quantifies how
far each serving path sits from its memory-bound speed-of-light
(PERF.md's structural claim that the serving graph is bandwidth-bound).

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


def measure_membw(gib: float = 2.0, iters: int = 20):
    """Achievable HBM read+write bandwidth (GB/s): chained elementwise
    passes over a multi-GiB bf16 buffer in one jit, forced readback."""
    n = int(gib * (1 << 30) / 2)
    x = jnp.ones((n,), jnp.bfloat16)

    def sweep(c):
        def body(c, _):
            return c * 1.0001 + 0.001, ()
        return jax.lax.scan(body, c, None, length=iters)[0]
    fn = jax.jit(sweep)
    float(jnp.sum(fn(x)[:128].astype(jnp.float32)))     # compile + sync
    t0 = time.perf_counter()
    out = fn(x)
    float(jnp.sum(out[:128].astype(jnp.float32)))
    dt = time.perf_counter() - t0
    return 2 * x.nbytes * iters / dt / 1e9              # read + write


def _rate(model, v, x, t, mode, k, reps):
    """(steps/s, bytes/step, flops/step) from one compiled scan: the same
    executable is timed AND cost-analyzed (optimized-module bytes ≈ HBM
    traffic; divided by the scan length for per-step numbers)."""
    def scan_fn(vv, x0, tt):
        def body(c, _):
            out = model.apply(vv, c, tt, mode=mode)
            return (c + 0.001 * out.astype(c.dtype)), ()
        c, _ = jax.lax.scan(body, x0, None, length=k)
        return jnp.sum(c.astype(jnp.float32))
    compiled = jax.jit(scan_fn).lower(v, x, t).compile()
    nbytes = flops = float("nan")
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        nbytes = float(ca.get("bytes accessed", float("nan"))) / k
        flops = float(ca.get("flops", float("nan"))) / k
    except Exception as e:                   # backend without cost analysis
        print(f"  (cost_analysis unavailable: {e})", flush=True)
    float(compiled(v, x, t))                 # warm + real readback sync
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = compiled(v, x, t)
    float(out)                               # forced readback (PERF.md)
    return reps * k / (time.perf_counter() - t0), nbytes, flops


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
    bw = measure_membw(0.25 if args.tiny else 2.0)
    print(f"HBM read+write bandwidth: {bw:.1f} GB/s", flush=True)
    results = {"membw_gbs": round(bw, 1)}

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

        rows = {}
        for pname, (vv, xx, mm) in (("fp32", (v, x, FP)),
                                    ("bf16fp", (v16, x16, FP)),
                                    ("int8", (s8, x16, DEPLOY_INT8))):
            rate, nbytes, flops = _rate(model, vv, xx, t, mm, args.k,
                                        args.reps)
            bound = bw * 1e9 / nbytes if nbytes == nbytes else float("nan")
            rows[pname] = {
                "steps_per_s": round(rate, 3),
                "bytes_per_step_mib": round(nbytes / 2**20, 1),
                "flops_per_step_t": round(flops / 1e12, 3),
                "bw_bound_steps_per_s": round(bound, 2),
                "frac_of_bound": round(rate / bound, 3)
                if bound == bound else None,
            }
            print(f"[{name}:{pname}] {rate:.2f} steps/s, "
                  f"{nbytes/2**20:.0f} MiB/step -> bw-bound "
                  f"{bound:.2f} steps/s ({100*rate/bound:.0f}% of bound), "
                  f"{flops/1e12:.2f} Tflop/step", flush=True)
        rows["int8_vs_fp32"] = round(
            rows["int8"]["steps_per_s"] / rows["fp32"]["steps_per_s"], 3)
        rows["int8_vs_bf16fp"] = round(
            rows["int8"]["steps_per_s"] / rows["bf16fp"]["steps_per_s"], 3)
        results[name] = rows
        print(f"[{name}] int8 vs fp32 {rows['int8_vs_fp32']}x, "
              f"vs bf16-FP {rows['int8_vs_bf16fp']}x", flush=True)
        del v, v16, s8
        jax.clear_caches()

    print(json.dumps({"serving_model_probe": results}), flush=True)


if __name__ == "__main__":
    main()
