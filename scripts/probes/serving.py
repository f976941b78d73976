"""On-chip microbench: where does the act-quantizer cost go in serving?

Times a production-shaped (500, 32, 32, 128) bf16 stage:
  a) conv3x3(swish(groupnorm(x)))                      — no quant
  b) conv3x3(fq(swish(groupnorm(x))))                  — quant, single consumer
  c) same as (b) but the pre-quant tensor is also returned (skip consumer)
  d) standalone fq pass (upper bound of the chain's cost)
plus int8/int4/bf16 dot_general rate probes (does this part's MXU engage a
faster int mode under any lowering?).
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp


def timed(name, fn, *args, iters=20):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else \
        fn(*args).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt * 1e3:.3f} ms", flush=True)
    return dt


def main():
    from eda_dm_tpu.quant.affine import fake_quant

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (500, 32, 32, 128)).astype(jnp.bfloat16)
    w = jax.random.normal(key, (3, 3, 128, 128)).astype(jnp.bfloat16)
    delta = jnp.asarray(0.05, jnp.float32)
    zp = jnp.asarray(128.0, jnp.float32)

    def gn_swish(a):
        a32 = a.astype(jnp.float32).reshape(*a.shape[:-1], 32, -1)
        mu = a32.mean(axis=(1, 2, 4), keepdims=True)
        var = a32.var(axis=(1, 2, 4), keepdims=True)
        h = ((a32 - mu) * jax.lax.rsqrt(var + 1e-6)).reshape(a.shape)
        h = h.astype(a.dtype)
        return h * jax.nn.sigmoid(h)

    conv = lambda a: jax.lax.conv_general_dilated(
        a, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    timed("a) gn+swish+conv", jax.jit(lambda a: conv(gn_swish(a))), x)
    timed("b) gn+swish+fq+conv",
          jax.jit(lambda a: conv(fake_quant(gn_swish(a), delta, zp, 256))), x)
    timed("c) b + skip consumer",
          jax.jit(lambda a: (conv(fake_quant(gn_swish(a), delta, zp, 256)),
                             gn_swish(a) + 1.0)), x)
    timed("d) fq alone", jax.jit(lambda a: fake_quant(a, delta, zp, 256)), x)
    timed("e) conv alone", jax.jit(conv), x)

    # MXU rate probes (4096^3 matmul)
    m = 4096
    a32 = jax.random.normal(key, (m, m), jnp.float32)
    b32 = jax.random.normal(key, (m, m), jnp.float32)
    a16, b16 = a32.astype(jnp.bfloat16), b32.astype(jnp.bfloat16)
    ai8 = (a32 * 10).astype(jnp.int8)
    bi8 = (b32 * 10).astype(jnp.int8)
    flops = 2 * m ** 3

    for name, f, args in [
        ("f32 matmul", jax.jit(lambda p, q: p @ q), (a32, b32)),
        ("bf16 matmul", jax.jit(partial(jnp.matmul,
                                        preferred_element_type=jnp.bfloat16)),
         (a16, b16)),
        ("bf16->f32 matmul", jax.jit(partial(
            jnp.matmul, preferred_element_type=jnp.float32)), (a16, b16)),
        ("int8->int32 dot", jax.jit(partial(
            jnp.matmul, preferred_element_type=jnp.int32)), (ai8, bi8)),
        ("int8xbf16->f32", jax.jit(lambda p, q: jax.lax.dot_general(
            p, q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)), (ai8, b16)),
    ]:
        dt = timed(name, f, *args, iters=50)
        print(f"   -> {flops / dt / 1e12:.1f} T(FL)OP/s", flush=True)


if __name__ == "__main__":
    main()
