"""Dump + summarize the optimized TPU HLO for the real ResnetBlockD step.

The isolated quantize+pad+conv+epilogue chain runs 914 steps/s at
32x32x128 batch 500 (probe_conv_epilogue.py) while the real int8 resblock
runs 296 — something in the real graph (GN producer, temb add, residual,
traced scales) breaks the fusion the isolated probe gets.  This prints the
largest fusions/ops by output bytes for the int8 vs folded paths.

Run on the chip: python scripts/probe_resblock_hlo.py
"""

import re
import sys

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp


def summarize(txt, label, top=25):
    print(f"\n===== {label}: largest ops by output bytes =====")
    rows = []
    for line in txt.splitlines():
        line = line.strip()
        m = re.match(r"(\S+)\s*=\s*((?:[a-z0-9]+\[[^\]]*\])(?:[^ ]*)?)\s+"
                     r"([a-z-]+)\(", line)
        if not m:
            continue
        name, shape_s, op = m.groups()
        sizes = re.findall(r"([a-z0-9]+)\[([0-9,]*)\]", shape_s)
        total = 0
        for dt, dims in sizes:
            bytes_per = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2,
                         "s8": 1, "u8": 1, "pred": 1, "s16": 2}.get(dt)
            if bytes_per is None or dims == "":
                continue
            n = 1
            for d in dims.split(","):
                n *= int(d)
            total += n * bytes_per
        if total > 0:
            rows.append((total, op, name, shape_s[:60], line[:180]))
    rows.sort(reverse=True)
    for total, op, name, shape_s, line in rows[:top]:
        print(f"{total/1e6:9.1f} MB  {op:18s} {shape_s}")
    n_fus = len(re.findall(r" fusion\(", txt))
    n_conv = len(re.findall(r" convolution\(", txt))
    print(f"(fusions: {n_fus}, convolutions: {n_conv})")


def main():
    from eda_dm_tpu.models.ddpm_unet import ResnetBlockD
    from eda_dm_tpu.quant import QuantConfig, QuantMode, FP
    from eda_dm_tpu.quant.export import (export_serving, export_serving_int8,
                                         DEPLOY, DEPLOY_INT8)
    from eda_dm_tpu.utils.run import enable_compilation_cache

    enable_compilation_cache()
    qc = QuantConfig(weight_bit=4, act_bit=8)
    key = jax.random.PRNGKey(0)
    batch = 500
    shape = (batch, 32, 32, 128)
    res = ResnetBlockD(out_ch=128, temb_ch=512, wq=qc.wq, aq=qc.aq)
    xs = [jax.random.normal(jax.random.PRNGKey(i), s)
          for i, s in enumerate([shape, (batch, 512)])]
    v = jax.jit(lambda: res.init(key, *xs, FP))()
    _, u = jax.jit(lambda vv: res.apply(
        vv, *xs, QuantMode(w_quant=True, calib_w=True),
        mutable=["quant"]))(v)
    v = {**v, "quant": u["quant"]}
    _, u = jax.jit(lambda vv: res.apply(
        vv, *xs, QuantMode(w_quant=True, a_quant=True, calib_a=True),
        mutable=["quant"]))(v)
    v = {**v, "quant": u["quant"]}
    v8 = export_serving_int8(v, qc)

    bf16 = jnp.bfloat16
    xx = [a.astype(bf16) for a in xs]

    def step(vv, mode):
        def scan_fn(x0):
            def body(c, _):
                o = res.apply(vv, c, xx[1], mode)
                return (c + 0.001 * o.astype(c.dtype)), ()
            c, _ = jax.lax.scan(body, x0, None, length=20)
            return jnp.sum(c.astype(jnp.float32))
        return scan_fn

    for label, mode in (("INT8", DEPLOY_INT8), ("FOLDED", DEPLOY)):
        txt = jax.jit(step(v8, mode)).lower(xx[0]).compile().as_text()
        with open(f"/tmp/resblock_{label}.hlo", "w") as f:
            f.write(txt)
        summarize(txt, label)


if __name__ == "__main__":
    main()
