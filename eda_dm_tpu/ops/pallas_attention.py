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
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fused_attn_enabled() -> bool:
    """Kill-switch for the whole-attention-in-VMEM serving kernels
    (``EDM_FUSED_ATTN=0`` disables).  The kernel wins at the LDM shapes it
    was validated on (few batch elements × large S, PERF.md); at very large
    batch × small S (CIFAR batch 500, S=256) the per-grid-step matmuls are
    too small to feed the MXU and the unfused XLA chain wins — measure per
    deployment shape before enabling."""
    return os.environ.get("EDM_FUSED_ATTN", "1") == "1"


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
            n_levels_w: int):
    # refs are (S, C): all grid dims are squeezed out of the block shapes —
    # keeping a singleton in the sublane position forces Mosaic into
    # (1, 128) tiling with ~8-32x VMEM padding (observed scoped-vmem OOM
    # at LDM shapes)
    # sc: [cq, ck, cv, logit_scale(=dq·dk·attn_scale), dw, zw, dwdv]
    cq = sc_ref[0]
    ck = sc_ref[1]
    cv = sc_ref[2]
    lsc = sc_ref[3]
    dw = sc_ref[4]
    zw = sc_ref[5]
    dwdv = sc_ref[6]

    q = q_ref[...].astype(jnp.bfloat16)      # (S, C) codes, exact in bf16
    k = k_ref[...].astype(jnp.bfloat16)
    v = v_ref[...].astype(jnp.bfloat16)

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
    o_ref[...] = out


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
    spec = pl.BlockSpec((None, s, c), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[spec, spec, spec,
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, s, c), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * s * s * c, bytes_accessed=b * (3 * s * c + 4 * s * c),
            transcendentals=b * s * s),
        interpret=interpret,
    )(Q, K, V, sc)


def flash_attention_applicable(sq: int, skv: int, c: int,
                               narrow_lanes: bool = False) -> bool:
    """Gate for the two-pass tiled kernel: whole K/V for one (batch, head)
    stay in VMEM (int8 codes — tiny even at SD's 4096 tokens × 160
    channels), logits are tiled.  Requires tileable lengths; the 77-token
    CLIP context keeps the unfused path (its logits are small anyway)."""
    tq, tk = min(sq, 256), min(skv, 512)
    if sq % tq != 0 or skv % tk != 0 or skv % 128 != 0:
        return False
    if c % 128 != 0 and not (narrow_lanes and c % 8 == 0):
        return False
    # K + V codes resident + f32 q/acc/logits-chunk tiles
    bytes_needed = 2 * skv * c + 4 * tq * c * 3 + 4 * tq * tk
    return bytes_needed <= 6 * 1024 * 1024


def _flash_kernel(q_ref, k_ref, v_ref, sc_ref, o_ref, *, sq: int, skv: int,
                  c: int, tq: int, tk: int, n_levels_w: int):
    cq = sc_ref[0]
    ck = sc_ref[1]
    cv = sc_ref[2]
    lsc = sc_ref[3]
    dw = sc_ref[4]
    zw = sc_ref[5]
    dwdv = sc_ref[6]

    # refs are (TQ, C) / (SKV, C): grid dims squeezed from the blocks (a
    # singleton in the sublane position forces (1, 128) tiling and ~8-32x
    # VMEM padding — observed scoped-vmem OOM at LDM shapes)
    q = q_ref[...].astype(jnp.bfloat16)                       # (TQ, C)
    sum_q = jnp.sum(q.astype(jnp.float32), axis=1, keepdims=True)
    nk = skv // tk

    def logits_chunk(j):
        k = k_ref[pl.ds(j * tk, tk), :].astype(jnp.bfloat16)
        acc = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        sum_k = jnp.sum(k.astype(jnp.float32), axis=1)[None, :]
        return (acc + ck * sum_q + cq * sum_k + cq * ck * float(c)) * lsc

    # pass 1: global row max + normalizer (running, flash-style)
    def p1(j, carry):
        m, l = carry
        lg = logits_chunk(j)
        m2 = jnp.maximum(m, jnp.max(lg, axis=1, keepdims=True))
        l = l * jnp.exp(m - m2) + jnp.sum(jnp.exp(lg - m2), axis=1,
                                          keepdims=True)
        return m2, l

    m, l = jax.lax.fori_loop(
        0, nk, p1, (jnp.full((tq, 1), -1e30, jnp.float32),
                    jnp.zeros((tq, 1), jnp.float32)))

    # pass 2: exact final probabilities → sm_abit codes → code·V product.
    # Quantization happens on the *final* softmax values (identical
    # placement to the unfused softmax_int8_codes chain) — a rescaled
    # one-pass accumulation would quantize pre-rescaling values instead.
    hi = float(n_levels_w - 1)
    cw = n_levels_w / 2 - zw

    def p2(j, carry):
        acc, sw = carry
        lg = logits_chunk(j)
        w = jnp.exp(lg - m) / l
        wc = jnp.clip(jnp.round(w / dw), -zw, hi - zw) - cw
        v = v_ref[pl.ds(j * tk, tk), :].astype(jnp.bfloat16)
        acc = acc + jax.lax.dot_general(wc.astype(jnp.bfloat16), v,
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
        sw = sw + jnp.sum(wc, axis=1, keepdims=True)
        return acc, sw

    acc, sw = jax.lax.fori_loop(
        0, nk, p2, (jnp.zeros((tq, c), jnp.float32),
                    jnp.zeros((tq, 1), jnp.float32)))
    sum_v = jnp.sum(v_ref[...].astype(jnp.float32), axis=0)[None, :]
    out = (acc + cv * sw + cw * sum_v + cw * cv * float(skv)) * dwdv
    o_ref[...] = out


def _heads_to_batched(x: jnp.ndarray) -> jnp.ndarray:
    """(B, S, H, C) → (B·H, S, C).

    Mosaic constrains the trailing two dims of every block: each must be
    divisible by (8, 128) or span its whole array dim.  A heads-layout
    block (None, s, None, c) leaves a squeezed singleton in the sublane
    position of the trailing (H, C) window — h > 1 with a size-1 block
    fails to lower (observed on chip for every LDM flavour except
    imagenet's h=1 AttentionBlock).  Flattening heads into the batch-major
    grid dim sidesteps the constraint; the transpose is a relayout of int8
    codes (≤ a few MB at zoo shapes), orders of magnitude cheaper than the
    (S, S) logits the kernels keep out of HBM."""
    b, s, h, c = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b * h, s, c)


def _batched_to_heads(x: jnp.ndarray, b: int, h: int) -> jnp.ndarray:
    n, s, c = x.shape
    return x.reshape(b, h, s, c).transpose(0, 2, 1, 3)


def int8_flash_attention(Q: jnp.ndarray, cq, dq,
                         K: jnp.ndarray, ck, dk,
                         V: jnp.ndarray, cv, dv,
                         attn_scale: float,
                         dw, zw, n_levels_w: int,
                         interpret: bool = False) -> jnp.ndarray:
    """Two-pass tiled ("flash") int8 attention, batched (N, S, C) layout.

    Unlike ``int8_fused_attention`` the (SQ, SKV) logits never exist even
    in VMEM as a whole — pass 1 computes the global row max/normalizer
    over KV tiles, pass 2 re-computes each logits tile, takes exact final
    softmax values, quantizes to sm_abit codes and accumulates the code·V
    product.  Semantics match the unfused chain (int8_code_einsum →
    softmax_int8_codes → int8_code_einsum) up to f32 association.

    This is the serving path for big-S attention (SD's 64² = 4096 tokens,
    LDM 32² = 1024 at batch 50) where materializing int32/f32 logits in
    HBM both OOMs and saturates HBM bandwidth.
    """
    n, sq, c = Q.shape
    skv = K.shape[1]
    tq = min(sq, 256)
    tk = min(skv, 512)
    assert sq % tq == 0 and skv % tk == 0
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
    kernel = functools.partial(_flash_kernel, sq=sq, skv=skv, c=c, tq=tq,
                               tk=tk, n_levels_w=n_levels_w)
    q_spec = pl.BlockSpec((None, tq, c), lambda i, t: (i, t, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((None, skv, c), lambda i, t: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n, sq // tq),
        in_specs=[q_spec, kv_spec, kv_spec,
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((n, sq, c), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * sq * skv * c,
            bytes_accessed=n * (3 * skv * c + 8 * sq * c),
            transcendentals=2 * n * sq * skv),
        interpret=interpret,
    )(Q, K, V, sc)


def int8_flash_attention_heads(Q: jnp.ndarray, cq, dq,
                               K: jnp.ndarray, ck, dk,
                               V: jnp.ndarray, cv, dv,
                               attn_scale: float,
                               dw, zw, n_levels_w: int,
                               interpret: bool = False) -> jnp.ndarray:
    """Heads-layout front-end for the flash kernel: Q (B, SQ, H, C),
    K/V (B, SKV, H, C) centered int8 codes → f32 (B, SQ, H, C).  Flattens
    heads into the batch grid dim (see ``_heads_to_batched``) and runs the
    (N, S, C) kernel."""
    b, sq, h, c = Q.shape
    out = int8_flash_attention(
        _heads_to_batched(Q), cq, dq, _heads_to_batched(K), ck, dk,
        _heads_to_batched(V), cv, dv, attn_scale, dw, zw, n_levels_w,
        interpret=interpret)
    return _batched_to_heads(out, b, h)


def int8_fused_attention_heads(Q: jnp.ndarray, cq, dq,
                               K: jnp.ndarray, ck, dk,
                               V: jnp.ndarray, cv, dv,
                               attn_scale: float,
                               dw, zw, n_levels_w: int,
                               interpret: bool = False) -> jnp.ndarray:
    """Head-layout variant: Q/K/V are (B, S, H, C) centered int8 codes (the
    LDM ``bthc`` layout).  Heads are flattened into the batch grid dim (see
    ``_heads_to_batched`` — a squeezed head dim inside the trailing block
    window fails Mosaic's (8, 128) tiling rule) and the (N, S, C) kernel
    runs per flattened element.  Returns f32 (B, S, H, C)."""
    b, s, h, c = Q.shape
    out = int8_fused_attention(
        _heads_to_batched(Q), cq, dq, _heads_to_batched(K), ck, dk,
        _heads_to_batched(V), cv, dv, attn_scale, dw, zw, n_levels_w,
        interpret=interpret)
    return _batched_to_heads(out, b, h)
