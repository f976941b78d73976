"""Probe: the split dual-quantizer 1x1 shortcut conv on the int8 path.

Every up-path resblock has a concat input (in != out) whose nin_shortcut
runs split=half: the int8 path executes TWO half convs (each materializing
an s32 output) where the folded path concatenates the halves into ONE bf16
conv.  Measures, at the CIFAR up-level shapes (batch 500):

  int8 2-half      current: quantize halves separately, 2 int8 convs,
                   2 dequant epilogues summed
  int8 1-half      lower bound if the split were removable (single conv,
                   one epilogue) — NOT semantically valid (one act scale)
  folded bf16      one bf16 conv over the concatenated folded kernel
  bf16-FP          no quantization

Run on an idle chip: python scripts/probe_split_shortcut.py
"""

import sys
import time

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp

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


def chain(step, x0):
    def body(c, _):
        return step(c), ()
    c, _ = jax.lax.scan(body, x0, None, length=K)
    return jnp.sum(c.astype(jnp.float32))


def run(shape, cout):
    b, h, w, cin = shape
    half = cin // 2
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, shape, jnp.bfloat16)
    w8 = jax.random.randint(key, (1, 1, cin, cout), -8, 8, jnp.int8)
    w16 = w8.astype(jnp.bfloat16) * 0.05
    d1, zp1 = jnp.float32(0.05), jnp.float32(120.0)
    d2, zp2 = jnp.float32(0.04), jnp.float32(130.0)
    dw = jnp.full((1, 1, 1, cout), 0.05, jnp.float32)
    isum1 = jnp.sum(w8[..., :half, :].astype(jnp.float32), axis=(0, 1, 2))
    isum2 = jnp.sum(w8[..., half:, :].astype(jnp.float32), axis=(0, 1, 2))

    def q(xx, d, zp):
        qq = jnp.clip(jnp.round(xx.astype(jnp.float32) / d), -zp, 255.0 - zp)
        return (qq - (128.0 - zp)).astype(jnp.int8), 128.0 - zp

    def conv(a, ww, acc_t=None):
        kw = {} if acc_t is None else {"preferred_element_type": acc_t}
        return jax.lax.conv_general_dilated(
            a, ww, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), **kw)

    def int8_2half(c):
        q1, c1 = q(c[..., :half], d1, zp1)
        q2, c2 = q(c[..., half:], d2, zp2)
        a1 = conv(q1, w8[..., :half, :], jnp.int32)
        a2 = conv(q2, w8[..., half:, :], jnp.int32)
        out = (a1.astype(jnp.float32) + c1 * isum1) * (d1 * dw) \
            + (a2.astype(jnp.float32) + c2 * isum2) * (d2 * dw)
        return jnp.pad(out.astype(c.dtype), ((0, 0),) * 3
                       + ((0, cin - cout),)) + c

    def int8_1half(c):
        q1, c1 = q(c, d1, zp1)
        a1 = conv(q1, w8, jnp.int32)
        out = (a1.astype(jnp.float32) + c1 * (isum1 + isum2)) * (d1 * dw)
        return jnp.pad(out.astype(c.dtype), ((0, 0),) * 3
                       + ((0, cin - cout),)) + c

    def folded(c):
        q1 = jnp.clip(jnp.round(c[..., :half].astype(jnp.float32) / d1),
                      -zp1, 255.0 - zp1)
        q2 = jnp.clip(jnp.round(c[..., half:].astype(jnp.float32) / d2),
                      -zp2, 255.0 - zp2)
        xq = jnp.concatenate([((q1 - zp1) * d1), ((q2 - zp2) * d2)],
                             axis=-1).astype(jnp.bfloat16)
        out = conv(xq, w16)
        return jnp.pad(out, ((0, 0),) * 3 + ((0, cin - cout),)) + c

    def fp(c):
        out = conv(c, w16)
        return jnp.pad(out, ((0, 0),) * 3 + ((0, cin - cout),)) + c

    print(f"== 1x1 split shortcut {h}x{w} {cin}->{cout} batch {b} "
          f"(steps/s) ==")
    for label, step in (("int8 2-half ", int8_2half),
                        ("int8 1-half ", int8_1half),
                        ("folded bf16 ", folded),
                        ("bf16-FP     ", fp)):
        r = bench_chain(lambda c, s=step: chain(s, c), x)
        print(f"{label}  {r:8.1f}", flush=True)


def main():
    run((500, 32, 32, 256), 128)
    run((500, 16, 16, 384), 256)


if __name__ == "__main__":
    main()
