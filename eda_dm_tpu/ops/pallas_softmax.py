"""Fused softmax → int8-code Pallas kernel for the attention serving path.

Motivation (round-3 profile, PERF.md): on the int8 deployment path the
attention probabilities were computed by XLA as ~3 separate f32 passes over
the (rows, S) logits — row-max reduce, exp+row-sum, div — followed by a
fourth pass quantizing to sm_abit codes.  At CIFAR serving shapes
(500·256 rows × 256) that is ~0.5 GB of HBM traffic per attention block.
This kernel reads the f32 logits once and writes the centered int8 codes
once; max/exp/sum/divide/quantize all happen in VMEM.

Semantics are exactly the fake-quant reference chain
(/root/reference/qdiff/quant_block.py:145-165 — softmax then the sm_abit
``UniformAffineQuantizer``):

    w = softmax(logits, axis=-1)                       # f32
    q = clip(round(w / delta), -zp, n_levels - 1 - zp)
    codes = q - (n_levels/2 - zp)                      # centered, int8

matching ``ops/int8_einsum.py::quantize_act_int8`` so the codes feed the
int8×int8 value matmul unchanged.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def pallas_interpret() -> bool:
    """True when Pallas must run in interpreter mode (CPU backend — tests
    and the virtual multi-chip mesh)."""
    return jax.default_backend() == "cpu"


def fused_softmax_enabled() -> bool:
    """Kill-switch for the fused softmax→int8-codes serving kernel
    (``EDM_FUSED_SOFTMAX=0`` falls back to XLA softmax + quantize)."""
    import os
    return os.environ.get("EDM_FUSED_SOFTMAX", "1") == "1"


def softmax_int8_codes(logits: jnp.ndarray, delta: jnp.ndarray,
                       zp: jnp.ndarray, n_levels: int,
                       interpret: bool = False
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """softmax over the last axis, quantized to centered int8 codes.

    logits: (..., S) f32 (bf16 accepted, upcast in-kernel); delta/zp:
    scalar activation-quantizer params (per-tensor, like every softmax
    quantizer in the model zoos); n_levels ≤ 256.

    Returns ``(codes, c)`` with ``(codes + c)·delta == fake_quant(softmax)``
    — the same contract as quantize_act_int8.  Rows are independent; S may
    be any length (non-multiples of 128 are masked in-kernel, e.g. CLIP's
    77-token context or the 8×8 mid-block's 64 positions).
    """
    assert n_levels <= 256, "int8 codes require sm_abit <= 8"
    orig_shape = logits.shape
    s = orig_shape[-1]
    r = 1
    for d in orig_shape[:-1]:
        r *= d
    x2 = logits.reshape(r, s)

    sp = _round_up(s, 128)
    # rows per block: keep the f32 tile + s8 out under ~3 MB of VMEM
    bm = max(32, min(1024, (3 * 1024 * 1024) // (sp * 4) // 32 * 32))
    hi = float(n_levels - 1)
    masked = s != sp

    def kernel(d_ref, z_ref, x_ref, o_ref):
        d = d_ref[0, 0]
        z = z_ref[0, 0]
        x = x_ref[:].astype(jnp.float32)
        if masked:
            mask = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) < s
            x = jnp.where(mask, x, -1e30)
        m = jnp.max(x, axis=1, keepdims=True)
        e = jnp.exp(x - m)
        if masked:
            e = jnp.where(mask, e, 0.0)
        w = e / jnp.sum(e, axis=1, keepdims=True)
        q = jnp.clip(jnp.round(w / d), -z, hi - z)
        o_ref[:] = (q - (n_levels / 2 - z)).astype(jnp.int8)

    d_arr = jnp.asarray(delta, jnp.float32).reshape(1, 1)
    z_arr = jnp.asarray(zp, jnp.float32).reshape(1, 1)
    codes = pl.pallas_call(
        kernel,
        grid=(pl.cdiv(r, bm),),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, sp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, sp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, s), jnp.int8),
        cost_estimate=pl.CostEstimate(
            flops=6 * r * s, bytes_accessed=r * s * 5, transcendentals=r * s),
        interpret=interpret,
    )(d_arr, z_arr, x2)
    c = n_levels / 2 - jnp.asarray(zp, jnp.float32)
    return codes.reshape(orig_shape), c
