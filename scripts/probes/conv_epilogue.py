"""Probe fixes for the int8 resblock serving sink (PERF.md session-6).

HLO analysis (probe_resblock_hlo.py) showed the real int8 resblock pays:
  1. the explicit ``jnp.pad`` before quantize breaks producer fusion: the
     GN-normalize pass writes bf16 (131 MB) and a separate quantize+pad
     pass reads it back (the folded path fuses normalize+fakequant into
     the conv input in ONE pass);
  2. the s32 conv output (262 MB) is materialized and the dequant epilogue
     is recomputed inside every consumer fusion (re-reading s32).

Candidate fixes measured here on a GN+swish+conv+residual chain at the
sink shape (batch 500, 32x32x128):
  v0: current scheme (x-space pad -> quantize -> VALID conv s32 -> epi)
  v1: zero-code padding: quantize WITHOUT pad (fuses into GN pass), conv
      with native padding=1 over the s8 codes, epilogue adds the exact
      border correction  c*(sum_w - border_map)  where border_map =
      conv(pad_indicator, w) is a tiny batch-1 precomputed map
  v2: v1 + optimization_barrier after the epilogue (one bf16
      materialization instead of multi-consumer s32 re-reads)
  folded: the bf16 fake-quant path (what int8 must beat)
  bf16-FP: no quantization at all (the honest bound)

Run on an idle chip: python scripts/probe_conv_epilogue.py
"""

import sys
import time

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp

B, H, W, C = 500, 32, 32, 128
K = 20


def bench_chain(fn, *args, reps=3):
    jfn = jax.jit(fn)
    float(jfn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = jfn(*args)
    float(out)
    return reps * K / (time.perf_counter() - t0)


def gn_swish(x, scale, bias, groups=32):
    xf = x.astype(jnp.float32)
    xg = xf.reshape(*x.shape[:-1], groups, x.shape[-1] // groups)
    axes = (1, 2, 4)
    mean = jnp.mean(xg, axis=axes, keepdims=True)
    var = jnp.mean((xg - mean) ** 2, axis=axes, keepdims=True)
    y = (xg - mean) * jax.lax.rsqrt(var + 1e-6)
    y = y.reshape(x.shape) * scale + bias
    y = y.astype(x.dtype)
    return jax.nn.silu(y)


def chain(step, x0):
    def body(c, _):
        return step(c), ()
    c, _ = jax.lax.scan(body, x0, None, length=K)
    return jnp.sum(c.astype(jnp.float32))


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)
    scale = jnp.ones((C,), jnp.float32)
    gbias = jnp.zeros((C,), jnp.float32)
    w8 = jax.random.randint(key, (3, 3, C, C), -8, 8, jnp.int8)
    wsum = jnp.sum(w8.astype(jnp.float32), axis=(0, 1, 2))
    w16 = (w8.astype(jnp.bfloat16) * 0.05)
    d = jnp.float32(0.05)
    zp = jnp.float32(120.0)
    dw = jnp.full((1, 1, 1, C), 0.05, jnp.float32)
    cc = 128.0 - zp            # recentering constant

    # border map: conv of the pad indicator with the int weights ->
    # [1,H,W,Cout] (precomputable at export; here in-graph, it folds)
    ind = jnp.zeros((1, H + 2, W + 2, C), jnp.float32)
    ind = ind.at[:, 0, :, :].set(1.0).at[:, -1, :, :].set(1.0)
    ind = ind.at[:, :, 0, :].set(1.0).at[:, :, -1, :].set(1.0)
    border = jax.lax.conv_general_dilated(
        ind, w8.astype(jnp.float32), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def quantize_codes(h):
        q = jnp.clip(jnp.round(h.astype(jnp.float32) / d), -zp, 255.0 - zp)
        return (q - cc).astype(jnp.int8)

    def v0(c):
        h = gn_swish(c, scale, gbias)
        hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
        qs = quantize_codes(hp)
        acc = jax.lax.conv_general_dilated(
            qs, w8, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        out = (acc.astype(jnp.float32) + cc * wsum) * (d * dw)
        return c + out.astype(c.dtype)

    def make_v1(barrier):
        def v1(c):
            h = gn_swish(c, scale, gbias)
            qs = quantize_codes(h)          # no pad: fuses into GN pass
            acc = jax.lax.conv_general_dilated(
                qs, w8, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            out = (acc.astype(jnp.float32) + cc * (wsum - border)) * (d * dw)
            out = out.astype(c.dtype)
            if barrier:
                out = jax.lax.optimization_barrier(out)
            return c + out
        return v1

    def folded(c):
        h = gn_swish(c, scale, gbias)
        q = jnp.clip(jnp.round(h.astype(jnp.float32) / d), -zp, 255.0 - zp)
        xq = ((q - zp) * d).astype(jnp.bfloat16)
        out = jax.lax.conv_general_dilated(
            xq, w16, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return c + out

    def fp(c):
        h = gn_swish(c, scale, gbias)
        out = jax.lax.conv_general_dilated(
            h, w16, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return c + out

    # correctness: v1 must equal v0 exactly
    a0 = jax.jit(v0)(x)
    a1 = jax.jit(make_v1(False))(x)
    exact = bool(jnp.all(a0 == a1))
    print(f"v1 == v0 exact: {exact}  (max|d|="
          f"{float(jnp.max(jnp.abs(a0.astype(jnp.float32) - a1.astype(jnp.float32)))):.3g})",
          flush=True)

    print(f"== GN+swish+conv3x3+residual {H}x{W}x{C} batch {B}, "
          f"{K}-chain (steps/s) ==")
    for label, step in (("v0 current int8       ", v0),
                        ("v1 zero-code pad      ", make_v1(False)),
                        ("v2 v1 + barrier       ", make_v1(True)),
                        ("folded bf16 fake-quant", folded),
                        ("bf16-FP (no quant)    ", fp)):
        r = bench_chain(lambda c, s=step: chain(s, c), x)
        print(f"{label}  {r:8.1f}", flush=True)


if __name__ == "__main__":
    main()
