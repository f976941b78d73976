"""Feasibility probe: can Mosaic drive the MXU's int8 mode from Pallas?

The planned fix for the ResBlock int8 serving sink (PERF.md session-5/6) is
a fused quantize+pad+conv+epilogue Pallas kernel.  Its win over the folded
bf16 path requires int8xint8->int32 dot_generals to lower to the MXU int8
mode *inside* Mosaic (XLA already does this for lax.conv on the current
stack: 146.6 T/s vs bf16 92.7).

Measurement note: single dispatches through the axon relay are overhead-
dominated (~ms each), so every rate here chains CHAIN dependent matmuls
*inside one kernel invocation* (fori_loop over the MXU op in VMEM) and the
XLA references chain the same op count inside one jit.

Run on an idle chip: python scripts/probe_mosaic_int8.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

CHAIN = 40


def bench(fn, *args, reps=3):
    jfn = jax.jit(fn)
    float(jnp.sum(jfn(*args).astype(jnp.float32)))   # compile + real readback
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = jfn(*args)
    float(jnp.sum(out.astype(jnp.float32)))          # real readback
    return (time.perf_counter() - t0) / reps


def chain_kernel_s8(a_ref, b_ref, o_ref):
    def body(_, a):
        acc = jax.lax.dot_general(a, b_ref[...], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        # cheap int32 -> int8 squeeze so the next matmul stays int8
        return (acc >> 8).astype(jnp.int8)
    o_ref[...] = jax.lax.fori_loop(0, CHAIN, body, a_ref[...])


def chain_kernel_bf16(a_ref, b_ref, o_ref):
    def body(_, a):
        acc = jax.lax.dot_general(a, b_ref[...], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        return (acc * 0.01).astype(jnp.bfloat16)
    o_ref[...] = jax.lax.fori_loop(0, CHAIN, body, a_ref[...])


def pallas_chain(a, b, kernel, out_dtype, bm=1024):
    m, k = a.shape
    _, n = b.shape
    return pl.pallas_call(
        kernel,
        grid=(m // bm,),
        in_specs=[pl.BlockSpec((bm, k), lambda i: (i, 0)),
                  pl.BlockSpec((k, n), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
    )(a, b)


def xla_chain_s8(a, b):
    def body(_, aa):
        acc = jnp.matmul(aa, b, preferred_element_type=jnp.int32)
        return (acc >> 8).astype(jnp.int8)
    return jax.lax.fori_loop(0, CHAIN, body, a)


def xla_chain_bf16(a, b):
    def body(_, aa):
        acc = jnp.matmul(aa, b, preferred_element_type=jnp.float32)
        return (acc * 0.01).astype(jnp.bfloat16)
    return jax.lax.fori_loop(0, CHAIN, body, a)


def main():
    key = jax.random.PRNGKey(0)
    # (M, K=N square so the chain composes); conv3x3 32x32x128 per-shift is
    # M=512000 K=N=128; 16x16x256 is M=128000 K=N=256
    for (m, k) in ((65536, 128), (65536, 256), (16384, 512)):
        a8 = jax.random.randint(key, (m, k), -127, 127, jnp.int8)
        b8 = jax.random.randint(key, (k, k), -127, 127, jnp.int8)
        a16 = a8.astype(jnp.bfloat16)
        b16 = b8.astype(jnp.bfloat16)
        flops = 2 * m * k * k * CHAIN
        try:
            t = bench(lambda x, y: pallas_chain(x, y, chain_kernel_s8,
                                                jnp.int8), a8, b8)
            print(f"pallas s8s8s32  {m}x{k}x{k}: {flops/t/1e12:7.1f} T/s",
                  flush=True)
        except Exception as e:
            print(f"pallas s8s8s32  {m}x{k}x{k}: FAIL {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)
        t = bench(lambda x, y: pallas_chain(x, y, chain_kernel_bf16,
                                            jnp.bfloat16), a16, b16)
        print(f"pallas bf16f32  {m}x{k}x{k}: {flops/t/1e12:7.1f} T/s",
              flush=True)
        t = bench(xla_chain_s8, a8, b8)
        print(f"xla    s8s8s32  {m}x{k}x{k}: {flops/t/1e12:7.1f} T/s",
              flush=True)
        t = bench(xla_chain_bf16, a16, b16)
        print(f"xla    bf16f32  {m}x{k}x{k}: {flops/t/1e12:7.1f} T/s",
              flush=True)

    # correctness spot check (single int8 matmul in pallas)
    def one_mm(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    a8 = jax.random.randint(key, (512, 128), -127, 127, jnp.int8)
    b8 = jax.random.randint(key, (128, 128), -127, 127, jnp.int8)
    try:
        got = pl.pallas_call(
            one_mm, grid=(1,),
            in_specs=[pl.BlockSpec((512, 128), lambda i: (0, 0)),
                      pl.BlockSpec((128, 128), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((512, 128), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((512, 128), jnp.int32))(a8, b8)
        want = jnp.matmul(a8.astype(jnp.int32), b8.astype(jnp.int32))
        print("pallas s8 matmul exact:", bool(jnp.all(got == want)),
              flush=True)
    except Exception as e:
        print("pallas s8 matmul exact: FAIL", str(e)[:160], flush=True)


if __name__ == "__main__":
    main()
