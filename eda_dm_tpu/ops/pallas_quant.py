"""Pallas TPU kernels for the quantized serving path.

The reference simulates quantization in fp32 and delegates real INT kernels
to external CUDA projects (README.md:83-85 — CUTLASS / torch_quantizer;
nothing vendored, SURVEY §2).  Here the deployment path is native to the
TPU: activations are quantized to int8 inside the kernel, the matmul runs
on the MXU in int8 (2× MXU throughput on v5e vs bf16), and dequantization +
bias fuse into the epilogue — one HBM round trip for the whole
quantize→matmul→dequantize chain.

Measured on a v5e chip (round 1): the fused Pallas kernel reaches
~53 TFLOP/s vs ~60 for XLA's f32 matmul and ~62 TOPS for XLA's own int8
dot — i.e. neither XLA nor Mosaic currently engages the 2× int8 MXU mode
on this part, so int8's near-term win is weight-memory bandwidth (W4/W8
halves/quarters weight traffic), not FLOPs.  The kernel stays as the
serving-path hook; tiling + native-s8 lowering is a follow-up.

Weight layout: pre-quantized int8 (K, N) with per-output-channel scales
(N,) and integer zero-points folded in as a per-channel correction term:

    (x_q - zp_x) @ (w_q - zp_w) * s_x * s_w
      = [x_q @ w_q - zp_x * colsum(w_q) - zp_w * rowsum(x_q)
         + K * zp_x * zp_w] * s_x * s_w

For the symmetric-weight default (zp_w = n/2 exactly per channel) the
zp_w-dependent terms are per-channel constants w.r.t. x_q's row sums, which
the kernel accumulates on the fly.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def quantize_weights_int8(w: jnp.ndarray, delta: jnp.ndarray,
                          zp: jnp.ndarray, n_levels: int = 256):
    """Pre-quantize weights to storage int8 with offset-binary → signed shift.

    Stored value = clamp(round(w/delta) + zp, 0, n-1) - n/2  ∈ [-n/2, n/2-1].
    Dequant: (stored + n/2 - zp) * delta.
    """
    half = n_levels // 2
    q = jnp.clip(jnp.round(w / delta) + zp, 0, n_levels - 1) - half
    return q.astype(jnp.int8), (half - zp) * delta


def quantized_matmul(x: jnp.ndarray, w_q: jnp.ndarray, s_x: jnp.ndarray,
                     z_x: jnp.ndarray, s_w: jnp.ndarray,
                     w_colsum: jnp.ndarray, w_deq_off: jnp.ndarray,
                     bias: Optional[jnp.ndarray] = None,
                     block_m: int = 256, block_n: int = 256,
                     block_k: int = 512,
                     interpret: bool = False) -> jnp.ndarray:
    """Fused int8 serving matmul: quantize(x) @ dequant(w_q) + bias.

    x: (M, K) float32/bf16; w_q: (K, N) int8 (offset-binary shifted);
    s_x/z_x scalars; s_w: (N,) per-channel weight scales;
    w_colsum: (N,) int32 column sums of w_q; w_deq_off: (N,) the
    per-channel dequant offset (half - zp_w) * delta_w.

    Exact decomposition (x_deq = (clip(round(x/s)+z,0,255) - z) * s,
    w_deq = w_q * s_w + w_deq_off):

        x_deq @ w_deq = s_x * [ (xq8 @ w_q) + (128 - z) * colsum(w_q) ] * s_w
                        + s_x * rowsum(xq8 + 128 - z) * w_deq_off

    where xq8 = quantized x shifted to int8.  The kernel computes the int8
    MXU product; the cheap rank-1 corrections fuse outside (XLA fuses them
    into the epilogue of the custom call's consumer).
    """
    M, K = x.shape
    K2, N = w_q.shape
    assert K == K2
    out_dtype = x.dtype

    bm, bn, bk = (min(block_m, _round_up(M, 8)), min(block_n, N),
                  min(block_k, K))
    k_steps = pl.cdiv(K, bk)

    def kernel(sx_ref, zx_ref, x_ref, w_ref, o_ref, acc_ref):
        ki = pl.program_id(2)

        @pl.when(ki == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        xq = jnp.clip(jnp.round(x_ref[:] / sx_ref[0, 0]) + zx_ref[0, 0],
                      0.0, 255.0) - 128.0
        acc_ref[:] += jax.lax.dot_general(
            xq.astype(jnp.int8), w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

        @pl.when(ki == k_steps - 1)
        def _():
            o_ref[:] = acc_ref[:].astype(jnp.float32)

    sx_arr = jnp.asarray(s_x, jnp.float32).reshape(1, 1)
    zx_arr = jnp.asarray(z_x, jnp.float32).reshape(1, 1)
    prod = pl.pallas_call(
        kernel,
        grid=(pl.cdiv(M, bm), pl.cdiv(N, bn), k_steps),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j, k: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j, k: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K * x.dtype.itemsize + K * N + M * N * 4,
            transcendentals=0),
        interpret=interpret,
    )(sx_arr, zx_arr, x, w_q)

    # rank-1 corrections + dequant epilogue (vector ops, fused by XLA)
    xq8 = jnp.clip(jnp.round(x / s_x) + z_x, 0.0, 255.0) - 128.0
    row = jnp.sum(xq8 + (128.0 - z_x), axis=1, keepdims=True)      # (M,1)
    out = s_x * (prod + (128.0 - z_x) * w_colsum[None, :]) * s_w[None, :] \
        + s_x * row * w_deq_off[None, :]
    if bias is not None:
        out = out + bias[None, :]
    return out.astype(out_dtype)


def fakequant_matmul(x: jnp.ndarray, w: jnp.ndarray, delta_k: jnp.ndarray,
                     zp_k: jnp.ndarray, n_levels: int = 256,
                     bias: Optional[jnp.ndarray] = None,
                     block_m: int = 1024, block_n: int = 256,
                     interpret: bool = False) -> jnp.ndarray:
    """Serving matmul with the activation fake-quant fused into the tile
    load: ``out = fq(x) @ w (+ bias)``.

    Why: on the deployment path the act quantizer's quantize→dequantize is a
    separate VPU pass whenever its input is already materialized (attention
    q/k/v/proj inputs, shortcut-concat inputs) — an extra HBM round trip of
    the full activation per quant point, measured at ~20% of the serving
    step.  Fusing it into the matmul's x-tile load removes that round trip;
    quantization happens in VMEM registers right before the MXU.

    x: (M, K) carrier dtype (bf16/f32); w: (K, N) folded weights.
    delta_k/zp_k: (K,) f32 per-input-channel scale/zero-point rows — a
    per-tensor quantizer broadcasts its scalar, a split dual quantizer
    (quant_layer.py:406-437) contributes its two scalars over the channel
    ranges.  Boundary math is f32, exactly like quant/affine.py::fake_quant:
    q = clip(round(x/Δ), -zp, n-1-zp); operand = (q·Δ) cast to w.dtype.
    """
    M, K = x.shape
    K2, N = w.shape
    assert K == K2 and delta_k.shape == (K,) and zp_k.shape == (K,)
    out_dtype = x.dtype
    if bias is None:
        bias = jnp.zeros((N,), jnp.float32)

    bm = min(block_m, _round_up(M, 8))
    bn = min(block_n, N)
    hi = float(n_levels - 1)

    def kernel(d_ref, z_ref, x_ref, w_ref, b_ref, o_ref):
        d = d_ref[:]                                    # (1, K) f32
        z = z_ref[:]
        xf = x_ref[:].astype(jnp.float32)
        q = jnp.clip(jnp.round(xf / d), -z, hi - z) * d
        acc = jax.lax.dot_general(
            q.astype(w_ref.dtype), w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[:] = (acc + b_ref[:]).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(M, bm), pl.cdiv(N, bn)),
        in_specs=[
            pl.BlockSpec((1, K), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, K), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=(M * K + M * N) * x.dtype.itemsize
            + K * N * w.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(delta_k.astype(jnp.float32).reshape(1, K),
      zp_k.astype(jnp.float32).reshape(1, K), x, w,
      bias.astype(jnp.float32).reshape(1, N))


def pack_dense_weights(kernel: jnp.ndarray, delta: jnp.ndarray,
                       zp: jnp.ndarray, n_levels: int = 256):
    """Prepare a QDense kernel (K, N) for the serving matmul."""
    delta = delta.reshape(1, -1)
    zp = zp.reshape(1, -1)
    w_q, deq_off = quantize_weights_int8(kernel, delta, zp, n_levels)
    return {
        "w_q": w_q,
        "s_w": delta.reshape(-1),
        "w_colsum": jnp.sum(w_q.astype(jnp.int32), axis=0).astype(jnp.float32),
        "w_deq_off": jnp.broadcast_to(deq_off, kernel.shape)[0].reshape(-1)
        if deq_off.ndim > 1 else jnp.broadcast_to(deq_off,
                                                  (kernel.shape[1],)),
    }
