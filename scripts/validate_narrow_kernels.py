"""On-chip validation of the narrow-lane Pallas serving kernels.

Two serving kernels admit lane widths below one 128-lane tile only behind
env gates, pending validation on the target chip:

* ``EDM_FUSED_ATTN_NARROW`` — fused int8 attention in heads layout
  (ops/pallas_attention.py::int8_fused_attention_heads) for the LDM zoos'
  32/24-channel heads.  Besides throughput this kernel is what keeps the
  (b, h, t, s) int32/f32 logits out of HBM — the unfused int8 chain OOMs
  bedroom serving at batch 50 (r3 production queue log).
* ``EDM_FUSED_GN_NARROW`` — fused GroupNorm(+swish)(+quantize+pad)
  (ops/pallas_gn.py) at the LDM 224/448/672/896 channel family.

For each production shape this script checks parity vs the unfused int8
chain and times both (forced scalar readback — relay block_until_ready can
return early, PERF.md).  Run on the real chip:

    python scripts/validate_narrow_kernels.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=20):
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / reps


def validate_attention():
    from eda_dm_tpu.ops.int8_einsum import (int8_code_einsum,
                                            quantize_act_int8)
    from eda_dm_tpu.ops.pallas_softmax import softmax_int8_codes
    from eda_dm_tpu.ops.pallas_attention import int8_fused_attention_heads

    # (task, batch, tokens, heads, head_ch)
    shapes = [("bedroom 32x32", 8, 1024, 7, 32),
              ("bedroom 16x16", 8, 256, 14, 32),
              ("church 32x32", 8, 1024, 8, 24),
              ("imagenet 32x32", 8, 1024, 1, 256)]
    key = jax.random.PRNGKey(0)
    for name, b, s, h, c in shapes:
        q = jax.random.normal(key, (b, s, h, c)) * 0.3
        k = jax.random.normal(jax.random.PRNGKey(1), (b, s, h, c)) * 0.3
        v = jax.random.normal(jax.random.PRNGKey(2), (b, s, h, c)) * 0.5
        dq = dk = jnp.asarray(0.01)
        dv = jnp.asarray(0.02)
        zq = zk = zv = jnp.asarray(128.0)
        dw, zw = jnp.asarray(1 / 255.0), jnp.asarray(0.0)

        def unfused(q, k, v):
            Qc, cq = quantize_act_int8(q, dq, zq, 256)
            Kc, ck = quantize_act_int8(k, dk, zk, 256)
            w = int8_code_einsum("bthc,bshc->bhts", Qc, cq, dq, Kc, ck, dk)
            W, cw = softmax_int8_codes(w, dw, zw, 256)
            V, cv = quantize_act_int8(v, dv, zv, 256)
            return int8_code_einsum("bhts,bshc->bthc", W, cw, dw, V, cv, dv)

        def fused(q, k, v):
            Qc, cq = quantize_act_int8(q, dq, zq, 256)
            Kc, ck = quantize_act_int8(k, dk, zk, 256)
            V, cv = quantize_act_int8(v, dv, zv, 256)
            return int8_fused_attention_heads(Qc, cq, dq, Kc, ck, dk,
                                              V, cv, dv, 1.0, dw, zw, 256)

        ju, jf = jax.jit(unfused), jax.jit(fused)
        try:
            a = np.asarray(jf(q, k, v))
        except Exception as e:
            print(f"[attn {name}] fused FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            continue
        r = np.asarray(ju(q, k, v))
        d = np.abs(a - r)
        tu, tf = timeit(ju, q, k, v), timeit(jf, q, k, v)
        print(f"[attn {name}] (b{b} s{s} h{h} c{c}) max|Δ| {d.max():.3e} "
              f"mean {d.mean():.3e} | unfused {tu * 1e3:.2f} ms, fused "
              f"{tf * 1e3:.2f} ms ({tu / tf:.2f}x)", flush=True)


def validate_gn():
    from eda_dm_tpu.ops.pallas_gn import (gn_swish_int8, gn_norm,
                                          fused_gn_applicable)
    from eda_dm_tpu.nn.layers import GNorm, _quantize_act_int8, swish

    # bedroom 64x64x224 exceeds the VMEM applicability gate (h*w*c*12 =
    # 10.5 MB > 5 MB) — production falls back to the unfused XLA chain
    # there; it is listed to confirm the gate boundary is honest.
    shapes = [("bedroom 64x64x224", 8, 64, 64, 224),
              ("bedroom 32x32x448", 8, 32, 32, 448),
              ("bedroom 16x16x672", 8, 16, 16, 672),
              ("church 32x32x192", 8, 32, 32, 192),
              ("church 16x16x384", 8, 16, 16, 384),    # crash-repro width
              ("cifar 32x32x128", 32, 32, 32, 128)]
    d, zp = jnp.asarray(0.03), jnp.asarray(57.0)
    for name, b, h, w, c in shapes:
        if not fused_gn_applicable(h, w, c):
            print(f"[gn {name}] outside fused_gn_applicable gate "
                  f"(h*w*c*12 = {h * w * c * 12 / 2**20:.1f} MiB) — "
                  f"production uses the unfused XLA chain", flush=True)
            continue
        x = jax.random.normal(jax.random.PRNGKey(3), (b, h, w, c)) * 1.3
        scale = jnp.ones((c,)) * 1.1
        bias = jnp.ones((c,)) * 0.05

        def unfused(x):
            y = GNorm().apply({"params": {"scale": scale, "bias": bias}}, x)
            y = swish(y)
            y = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)))
            return _quantize_act_int8(y, d, zp, 256)[0]

        def fused(x):
            return gn_swish_int8(x, scale, bias, d, zp, 256,
                                 ((1, 1), (1, 1)))[0]

        ju, jf = jax.jit(unfused), jax.jit(fused)
        try:
            a = np.asarray(jf(x)).astype(np.int32)
        except Exception as e:
            print(f"[gn {name}] fused FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            continue
        r = np.asarray(ju(x)).astype(np.int32)
        dd = np.abs(a - r)
        tu, tf = timeit(ju, x), timeit(jf, x)
        print(f"[gn {name}] max code Δ {dd.max()} flip-frac "
              f"{(dd != 0).mean():.2e} | unfused {tu * 1e3:.2f} ms, fused "
              f"{tf * 1e3:.2f} ms ({tu / tf:.2f}x)", flush=True)


if __name__ == "__main__":
    os.environ.setdefault("EDM_FUSED_ATTN_NARROW", "1")
    os.environ.setdefault("EDM_FUSED_GN_NARROW", "1")
    print("devices:", jax.devices(), flush=True)
    validate_attention()
    validate_gn()
