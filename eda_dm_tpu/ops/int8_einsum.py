"""Native int8 attention einsums for the deployment path.

The reference's attention quantizer insertion points
(/root/reference/qdiff/quant_block.py:119-165 QK/SMV matmuls, :204-235
cross-attention, :398-451 DDIM AttnBlock) fake-quantize both einsum operands
(q·k logits; softmax-weights·v).  At serving time each operand's fake-quant
value is ``code·Δ`` with integer code ∈ [−zp, L−1−zp]; recentering by
``c = L/2 − zp`` puts the codes in int8 range, and the einsum expands
exactly:

    einsum(â, b̂) = Δa·Δb · [ einsum(A, B)            (int8×int8 → int32, MXU)
                            + c_b·Σ_K A               (per-row int32 reduction)
                            + c_a·Σ_K B
                            + c_a·c_b·K ]

where A, B are the centered int8 codes, Σ_K reduces over the contracted
axes and K is their total size.  The correction terms are rank-reduced
(O(n·c) vs the einsum's O(n²·c)) so the MXU int8 rate (measured ~1.3× bf16
on this chip, PERF.md) carries the op.

int32 accumulation is exact for every shape in the model zoos: |codes| ≤
128, so a contraction of K elements stays below 128²·K — K would need to
exceed 2^17 (our largest is 4096, SD's 64² tokens) to overflow.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def quantize_act_int8(x: jnp.ndarray, delta: jnp.ndarray, zp: jnp.ndarray,
                      n_levels: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Centered int8 activation codes: ``(codes + c)·Δ`` == fake_quant(x).

    Same recentering as the conv serving path
    (nn/layers.py::_quantize_act_int8); requires n_levels ≤ 256.
    """
    assert n_levels <= 256, "int8 act codes require act_bit <= 8"
    xf = x.astype(jnp.float32)
    q = jnp.clip(jnp.round(xf / delta), -zp, n_levels - 1 - zp)
    c = n_levels / 2 - zp
    return (q - c).astype(jnp.int8), c


def _aligned_reduced(codes: jnp.ndarray, spec: str, out_spec: str):
    """Sum ``codes`` over its contracted labels and transpose/expand the
    result into the output layout (singleton axes where the label is
    absent)."""
    kept = "".join(l for l in out_spec if l in spec)
    red = jnp.einsum(f"{spec}->{kept}", codes.astype(jnp.int32))
    shape = tuple(red.shape[kept.index(l)] if l in kept else 1
                  for l in out_spec)
    order = [kept.index(l) for l in out_spec if l in kept]
    return jnp.transpose(red, order).reshape(shape) \
        if order != sorted(order) else red.reshape(shape)


def int8_code_einsum(eq: str, A: jnp.ndarray, ca, da,
                     B: jnp.ndarray, cb, db,
                     out_dtype=None) -> jnp.ndarray:
    """einsum over *precomputed* centered int8 codes.

    ``A``/``B`` are centered codes with recentering offsets ``ca``/``cb``
    and quantizer steps ``da``/``db`` (the ``(codes, c)`` contract of
    :func:`quantize_act_int8` / ``pallas_softmax.softmax_int8_codes``).
    The int8×int8→int32 product runs on the MXU; the rank-reduced
    correction terms restore the exact affine algebra (module docstring).
    """
    ins, out_spec = eq.split("->")
    sa, sb = ins.split(",")
    contracted = [l for l in sa if l not in out_spec]
    k_total = 1
    for l in contracted:
        k_total *= A.shape[sa.index(l)]

    acc = jnp.einsum(eq, A, B, preferred_element_type=jnp.int32) \
        .astype(jnp.float32)
    sum_a = _aligned_reduced(A, sa, out_spec).astype(jnp.float32)
    sum_b = _aligned_reduced(B, sb, out_spec).astype(jnp.float32)
    out = (da * db) * (acc + cb * sum_a + ca * sum_b
                       + ca * cb * float(k_total))
    return out if out_dtype is None else out.astype(out_dtype)


def int8_act_einsum(eq: str, a: jnp.ndarray, qa, b: jnp.ndarray, qb,
                    out_dtype=None) -> jnp.ndarray:
    """einsum(fake_quant(a), fake_quant(b)) on the MXU's int8 mode.

    ``qa``/``qb`` are (delta, zero_point, n_levels) of the respective
    activation quantizers.  Exact up to the f32 epilogue algebra — the
    integer accumulation is in fact *more* precise than the bf16-carrier
    fake-quant einsum it replaces.

    Supports any two-operand einsum without repeated labels per operand
    (all four attention einsums in the model zoos qualify).
    """
    da, zpa, la = qa
    db, zpb, lb = qb
    A, ca = quantize_act_int8(a, da, zpa, la)
    B, cb = quantize_act_int8(b, db, zpb, lb)
    return int8_code_einsum(eq, A, ca, da, B, cb, db, out_dtype=out_dtype)


def int8_attention_serving(mode) -> bool:
    """Gate for the int8 attention-einsum serving branch: deployment
    (exported int8 trees) only — never during calibration, reconstruction
    (QDrop/STE need the fake-quant graph) or capture.

    ``EDM_INT8_ATTN=0`` (trace-time env kill-switch, like EDM_FUSED_*)
    keeps the convs on the int8 MXU path but runs the attention einsums on
    the fake-quant bf16 branch — the semantic definition the int8 chain is
    bit-exact to.  On stacks where big-batch/small-S int8 attention loses
    to XLA's batched bf16 matmuls (see PERF.md round-3 session-5 Amdahl
    notes), this is the faster serving configuration."""
    import os
    if os.environ.get("EDM_INT8_ATTN", "1") != "1":
        return False
    return (mode.int8 and mode.a_quant and not mode.calib_a
            and not mode.training and not mode.capture
            and not mode.soft_targets)
