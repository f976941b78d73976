"""Fused int8 attention Pallas kernel for the deployment path.

The unfused int8 serving chain (ops/int8_einsum.py + pallas_softmax.py)
still materializes the (B, S, S) attention logits in HBM twice — the q·k
einsum writes f32 logits, the fused softmax reads them back and writes s8
probability codes, and the w·v einsum reads those again.  At CIFAR serving
shapes (500·256·256 logits × 7 attention blocks) that is ~2 GB of pure HBM
traffic per denoise step.  This kernel keeps the whole attention for one
batch element resident in VMEM: q·k on the MXU, the recentering epilogue,
softmax, sm_abit quantization and w·v all happen without touching HBM.

Semantics are exactly the unfused chain (and therefore the reference's
quantizer placements, /root/reference/qdiff/quant_block.py:398-451 for the
DDIM AttnBlock and :119-165 for the LDM QKV attention):

    logits = dq·dk·scale · (Q·Kᵀ + ck·Σq + cq·Σk + cq·ck·C)
    w      = softmax(logits)                                (f32)
    W      = clip(round(w/dw), −zw, Lw−1−zw) − cw           (centered codes)
    out    = dw·dv · (W·V + cv·ΣW + cw·ΣV + cw·cv·S)

Operand products are computed on the MXU in bf16 — centered int8 codes are
integers ≤ 128 in magnitude, exactly representable in bf16, and the f32
accumulator stays below 2^24 for every zoo shape (max |Σ| = 128²·512 = 2^23),
so the kernel is bit-equivalent to int32 accumulation while dodging
Mosaic's int8-operand matmul restrictions on older TPU generations.

Applicability gate: ``fused_attention_applicable`` — self-attention layout
(B, S, C) with S·S + 3·S·C under the VMEM budget and 128-aligned C.  The
big-S / small-head shapes (SD's 64² tokens at 40-160 head channels) keep
the unfused einsum path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fused_attention_applicable(s: int, c: int,
                               narrow_lanes: bool = False) -> bool:
    """One batch element's working set must fit VMEM comfortably and the
    contraction axes must be MXU-tileable.

    ``narrow_lanes`` admits head widths below one 128-lane tile (the LDM
    zoos' 32/64-channel heads) — Mosaic pads the minor dimension, trading
    some MXU utilization for never materializing the (S, S) logits; gate
    behind on-chip validation (EDM_FUSED_ATTN_NARROW)."""
    if s % 8 != 0:
        return False
    if c % 128 != 0 and not (narrow_lanes and c % 8 == 0):
        return False
    # s8 q/k/v + f32 logits + f32 out, plus headroom for double buffering
    bytes_needed = 3 * s * c + 4 * s * s + 4 * s * c
    return bytes_needed <= 6 * 1024 * 1024


def _kernel(q_ref, k_ref, v_ref, sc_ref, o_ref, *, s: int, c: int,
            n_levels_w: int, heads: bool = False):
    # sc: [cq, ck, cv, logit_scale(=dq·dk·attn_scale), dw, zw, dwdv]
    cq = sc_ref[0]
    ck = sc_ref[1]
    cv = sc_ref[2]
    lsc = sc_ref[3]
    dw = sc_ref[4]
    zw = sc_ref[5]
    dwdv = sc_ref[6]

    if heads:                      # (1, S, 1, C) block of a (B, S, H, C) op
        q = q_ref[0, :, 0].astype(jnp.bfloat16)
        k = k_ref[0, :, 0].astype(jnp.bfloat16)
        v = v_ref[0, :, 0].astype(jnp.bfloat16)
    else:                          # (1, S, C) block of a (B, S, C) operand
        q = q_ref[0].astype(jnp.bfloat16)    # (S, C) codes, exact in bf16
        k = k_ref[0].astype(jnp.bfloat16)
        v = v_ref[0].astype(jnp.bfloat16)

    acc = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    sum_q = jnp.sum(q.astype(jnp.float32), axis=1, keepdims=True)   # (S,1)
    sum_k = jnp.sum(k.astype(jnp.float32), axis=1)[None, :]         # (1,S)
    logits = (acc + ck * sum_q + cq * sum_k + cq * ck * float(c)) * lsc

    m = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits - m)
    w = e / jnp.sum(e, axis=1, keepdims=True)

    hi = float(n_levels_w - 1)
    cw = n_levels_w / 2 - zw
    wc = jnp.clip(jnp.round(w / dw), -zw, hi - zw) - cw             # codes

    wcb = wc.astype(jnp.bfloat16)
    acc2 = jax.lax.dot_general(wcb, v, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    sum_w = jnp.sum(wc, axis=1, keepdims=True)                      # (S,1)
    sum_v = jnp.sum(v.astype(jnp.float32), axis=0)[None, :]         # (1,C)
    out = (acc2 + cv * sum_w + cw * sum_v + cw * cv * float(s)) * dwdv
    if heads:
        o_ref[0, :, 0] = out
    else:
        o_ref[0] = out


def int8_fused_attention(Q: jnp.ndarray, cq, dq,
                         K: jnp.ndarray, ck, dk,
                         V: jnp.ndarray, cv, dv,
                         attn_scale: float,
                         dw, zw, n_levels_w: int,
                         interpret: bool = False) -> jnp.ndarray:
    """Attention over centered int8 codes, fused end-to-end.

    Q/K/V: (B, S, C) int8 codes with recentering offsets cq/ck/cv and
    quantizer steps dq/dk/dv (the contract of
    ``int8_einsum.quantize_act_int8``); ``attn_scale`` is the logit scale
    (C^-1/2).  dw/zw/n_levels_w parameterize the sm_abit softmax quantizer.
    Returns f32 (B, S, C) equal (up to f32 epilogue rounding) to the
    unfused chain int8_code_einsum → softmax_int8_codes → int8_code_einsum.
    """
    b, s, c = Q.shape
    sc = jnp.stack([
        jnp.asarray(cq, jnp.float32).reshape(()),
        jnp.asarray(ck, jnp.float32).reshape(()),
        jnp.asarray(cv, jnp.float32).reshape(()),
        (jnp.asarray(dq, jnp.float32) * jnp.asarray(dk, jnp.float32)
         * attn_scale).reshape(()),
        jnp.asarray(dw, jnp.float32).reshape(()),
        jnp.asarray(zw, jnp.float32).reshape(()),
        (jnp.asarray(dw, jnp.float32)
         * jnp.asarray(dv, jnp.float32)).reshape(()),
    ])
    kernel = functools.partial(_kernel, s=s, c=c, n_levels_w=n_levels_w)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, s, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, c), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * s * s * c, bytes_accessed=b * (3 * s * c + 4 * s * c),
            transcendentals=b * s * s),
        interpret=interpret,
    )(Q, K, V, sc)


def int8_fused_attention_heads(Q: jnp.ndarray, cq, dq,
                               K: jnp.ndarray, ck, dk,
                               V: jnp.ndarray, cv, dv,
                               attn_scale: float,
                               dw, zw, n_levels_w: int,
                               interpret: bool = False) -> jnp.ndarray:
    """Head-layout variant: Q/K/V are (B, S, H, C) centered int8 codes (the
    LDM ``bthc`` layout).  The grid runs over (batch, head) with per-head
    blocks indexed straight out of the interleaved layout — no transposed
    copies are materialized.  Returns f32 (B, S, H, C)."""
    b, s, h, c = Q.shape
    sc = jnp.stack([
        jnp.asarray(cq, jnp.float32).reshape(()),
        jnp.asarray(ck, jnp.float32).reshape(()),
        jnp.asarray(cv, jnp.float32).reshape(()),
        (jnp.asarray(dq, jnp.float32) * jnp.asarray(dk, jnp.float32)
         * attn_scale).reshape(()),
        jnp.asarray(dw, jnp.float32).reshape(()),
        jnp.asarray(zw, jnp.float32).reshape(()),
        (jnp.asarray(dw, jnp.float32)
         * jnp.asarray(dv, jnp.float32)).reshape(()),
    ])
    kernel = functools.partial(_kernel, s=s, c=c, n_levels_w=n_levels_w,
                               heads=True)
    spec = pl.BlockSpec((1, s, 1, c), lambda i, j: (i, 0, j, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b, h),
        in_specs=[spec, spec, spec,
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, s, h, c), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s * s * c,
            bytes_accessed=b * h * (3 * s * c + 4 * s * c),
            transcendentals=b * h * s * s),
        interpret=interpret,
    )(Q, K, V, sc)
