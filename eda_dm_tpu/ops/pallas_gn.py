"""Fused GroupNorm(+swish)(+int8 quantize)(+pad) Pallas kernel.

On the int8 deployment path every ResBlock runs GN → swish → act-quantize →
pad → int8 conv (the reference's QuantModule chain,
/root/reference/qdiff/quant_layer.py:414-434, with GN/swish from the model
zoos).  XLA computes GroupNorm as two passes over the activation — one
reduction pass for the statistics and one normalize pass fused with
swish/quantize — so each GN costs two full HBM reads of its input.  This
kernel keeps one batch element's activation resident in VMEM: statistics,
normalization, swish, quantization and the conv's SAME-padding all happen
on the single read, and the only write is the padded int8 codes (or the
carrier-dtype tensor for multi-consumer GNs like the attention q/k/v
input).

Group statistics use a (C, G) one-hot matmul instead of a reshape — the
minor (lane) dimension stays 128-aligned, which Mosaic requires; the
per-group channel count (4–16 in the zoos) is far below a lane tile.

Numerics: statistics in f32 with flax's fast variance (E[x²] − E[x]²), so
the no-quant variant matches ``nn.GroupNorm`` up to f32 associativity; the
quantized variant matches ``_quantize_act_int8 ∘ pad ∘ swish ∘ GroupNorm``
bit-closely (the downstream 8-bit clip absorbs sub-ulp differences).
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fused_gn_enabled() -> bool:
    """Opt-in switch for the fused GN serving kernel (EDM_FUSED_GN=1).

    Default OFF: on-chip A/B at the CIFAR production shapes (batch 500,
    scan-fused serving) measured the fused kernel a net LOSS in the real
    graph — 11.7 vs 14.3 steps/s — because XLA already fuses the
    gn+swish+quantize chain into the conv input for free (PERF.md fusion
    probe) while the Pallas call forces an extra materialization and a
    sequential per-batch-element grid.  Isolated microbenches showed the
    kernel 1.25–1.53× "faster", but those timings are dominated by
    per-dispatch relay overhead — a trap worth remembering.  The kernel
    remains available for shapes where XLA's two-pass GN genuinely pays
    (multi-consumer GN outputs at narrow widths) behind EDM_FUSED_GN=1.
    """
    return os.environ.get("EDM_FUSED_GN", "0") == "1"


def fused_gn_applicable(h: int, w: int, c: int, num_groups: int = 32) -> bool:
    """One batch element must fit VMEM with f32 headroom and the channel
    (lane) dimension must be MXU/VPU-tileable.

    128-aligned widths qualify unconditionally; narrower/odd widths (the
    LDM zoos' 224/448/672/896 families) are logically correct — Mosaic pads
    the lane dimension internally — but admitted only behind
    EDM_FUSED_GN_NARROW=1 until the padding's throughput is validated on
    the target chip."""
    if c % num_groups != 0:
        return False
    if c % 128 != 0 and not (
            os.environ.get("EDM_FUSED_GN_NARROW", "0") == "1"
            and c % 8 == 0):
        return False
    if (h * w) % 8 != 0:
        return False
    # x tile + f32 working copy + output, with double-buffer headroom
    return h * w * c * 12 <= 5 * 1024 * 1024


def _kernel(sc_ref, s_ref, b_ref, x_ref, o_ref, *, hw: int, c: int,
            g: int, ng: int, h: int, w: int, eps: float, swish: bool,
            quant: bool, n_levels: int, pads):
    xf = x_ref[0].reshape(hw, c).astype(jnp.float32)

    # channel→group one-hot (C, G) and its transpose, built from iota so no
    # extra operand is streamed in
    gm = (jax.lax.broadcasted_iota(jnp.int32, (c, ng), 0) // g ==
          jax.lax.broadcasted_iota(jnp.int32, (c, ng), 1)).astype(jnp.float32)
    gmt = (jax.lax.broadcasted_iota(jnp.int32, (ng, c), 1) // g ==
           jax.lax.broadcasted_iota(jnp.int32, (ng, c), 0)).astype(jnp.float32)
    cnt = float(hw * g)
    colsum = jnp.sum(xf, axis=0, keepdims=True)            # (1, C)
    mean_g = jax.lax.dot_general(colsum, gm, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) / cnt
    mean_c = jax.lax.dot_general(mean_g, gmt, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    # two-pass variance — the tile is VMEM-resident so the second traversal
    # is free, and E[(x−μ)²] avoids the fast-variance cancellation noise
    # that nudged borderline activations across int8 code boundaries
    xc = xf - mean_c
    colsq = jnp.sum(xc * xc, axis=0, keepdims=True)        # (1, C)
    var_g = jax.lax.dot_general(colsq, gm, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32) / cnt
    inv_g = jax.lax.rsqrt(var_g + eps)
    inv_c = jax.lax.dot_general(inv_g, gmt, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)

    a = inv_c * s_ref[:]                                   # (1, C)
    y = xc * a + b_ref[:]
    if swish:
        y = y * jax.nn.sigmoid(y)

    if quant:
        d = sc_ref[0, 0]
        z = sc_ref[0, 1]
        hi = float(n_levels - 1)
        cc = n_levels / 2 - z
        codes = (jnp.clip(jnp.round(y / d), -z, hi - z) - cc) \
            .astype(jnp.int8).reshape(h, w, c)
        (pt, pb), (pl_, pr) = pads
        if (pt, pb, pl_, pr) == (0, 0, 0, 0):
            o_ref[0] = codes
        else:
            # build the padded tile as a VALUE and store the whole block
            # once — a partial-slice store at a sublane offset is exactly
            # the kind of unaligned int8 access Mosaic mishandles, and
            # dynamic_update_slice has no Mosaic lowering at all; rim
            # blocks are concatenated instead (static shapes, one store)
            pad_code = (-cc).astype(jnp.int8)              # the code of x=0
            def rim(*shape):
                return jnp.broadcast_to(pad_code, shape)
            if pl_ or pr:
                cols = ([rim(h, pl_, c)] if pl_ else []) + [codes] \
                    + ([rim(h, pr, c)] if pr else [])
                codes = jnp.concatenate(cols, axis=1)
            if pt or pb:
                wp_ = w + pl_ + pr
                rows = ([rim(pt, wp_, c)] if pt else []) + [codes] \
                    + ([rim(pb, wp_, c)] if pb else [])
                codes = jnp.concatenate(rows, axis=0)
            o_ref[0] = codes
    else:
        o_ref[0] = y.reshape(h, w, c).astype(o_ref.dtype)


def _call(x, scale, bias, sc, *, swish, quant, n_levels, pads, eps,
          num_groups, out_dtype, interpret):
    b, h, w, c = x.shape
    (pt, pb), (pl_, pr) = pads
    hp, wp = h + pt + pb, w + pl_ + pr
    kernel = functools.partial(
        _kernel, hw=h * w, c=c, g=c // num_groups, ng=num_groups, h=h, w=w,
        eps=eps, swish=swish, quant=quant, n_levels=n_levels, pads=pads)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hp, wp, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, c), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=12 * b * h * w * c,
            bytes_accessed=b * h * w * c * (x.dtype.itemsize
                                            + jnp.dtype(out_dtype).itemsize),
            transcendentals=b * h * w * c if swish else 0),
        interpret=interpret,
    )(sc, scale.reshape(1, c).astype(jnp.float32),
      bias.reshape(1, c).astype(jnp.float32), x)


def gn_swish_int8(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                  delta, zp, n_levels: int,
                  pads=((0, 0), (0, 0)), *, swish: bool = True,
                  num_groups: int = 32, eps: float = 1e-6,
                  interpret: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """GN → (swish) → centered-int8 act codes → SAME-pad, in one HBM pass.

    Returns ``(padded codes, c)`` with the quantize_act_int8 contract; the
    pad rim carries the code of x = 0 (−c), identical to padding x with
    zeros before quantization.
    """
    assert n_levels <= 256
    sc = jnp.stack([jnp.asarray(delta, jnp.float32).reshape(()),
                    jnp.asarray(zp, jnp.float32).reshape(())]).reshape(1, 2)
    codes = _call(x, scale, bias, sc, swish=swish, quant=True,
                  n_levels=n_levels, pads=tuple(map(tuple, pads)), eps=eps,
                  num_groups=num_groups, out_dtype=jnp.int8,
                  interpret=interpret)
    c = n_levels / 2 - jnp.asarray(zp, jnp.float32)
    return codes, c


def gn_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, *,
            swish: bool = False, num_groups: int = 32, eps: float = 1e-6,
            interpret: bool = False) -> jnp.ndarray:
    """GroupNorm (+ optional swish) in one HBM pass, returned in x.dtype —
    for multi-consumer GN outputs (attention q/k/v input, norm_out)."""
    sc = jnp.zeros((1, 2), jnp.float32)
    return _call(x, scale, bias, sc, swish=swish, quant=False, n_levels=0,
                 pads=((0, 0), (0, 0)), eps=eps, num_groups=num_groups,
                 out_dtype=x.dtype, interpret=interpret)
