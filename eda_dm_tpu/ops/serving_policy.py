"""Shape-keyed serving policy for the quantized deployment path.

Round 3 shipped six ``EDM_*`` env kill-switches whose defaults sometimes
contradicted the on-chip measurements (fused attention defaulted on at the
batch-500/S=256 shape where the unfused einsum chain wins).  This module
centralizes the choice: every serving branch point asks the policy with its
static trace-time shape, and the policy returns the measured-best
implementation.  The env vars remain as *overrides* only.

Measured decision surface (TPU v5e-class chip; PERF.md rounds 3–4):

* attention, small-S / large-batch (CIFAR batch 500, S=256): the batched
  (B, S, S) int8 einsums feed the MXU best — 436.8 steps/s at the
  16×16×256 stage vs 407.8 for the whole-in-VMEM kernel (its grid=(B·H,)
  per-element matmuls are too small).  → ``einsum`` when B·H ≥ 128 and the
  logits are small.
* attention, few-batch / large-S (LDM batch 8, S=256–1024): the fused
  whole-in-VMEM kernel wins 1.14–1.92× (validate_narrow_kernels.py, exact
  parity), including the narrow 24/32-channel heads.  → ``fused``.
* attention, huge logits (S_kv ≥ 512 at production batch; SD 4096 tokens):
  materializing (B, H, S, S) int8/f32 logits in HBM is the round-3
  bedroom-int8 OOM — avoid the einsum path whenever the fused or tiled
  kernel applies.  → ``fused``/``flash``.
* GroupNorm: XLA fuses gn+swish+quantize into the conv input for free; the
  Pallas GN kernel measured a net in-graph LOSS at every production shape
  tried (batch 500: 14.3→11.7 steps/s; resblock probe: 374→219).
  → plain XLA GN unless ``EDM_FUSED_GN=1`` forces the kernel.
* softmax→int8-codes: one pass over the logits instead of ~4; only reached
  on the einsum path.  Kept on (parity-gated); ``EDM_FUSED_SOFTMAX=0``
  falls back to XLA softmax+quantize.

Env overrides (all optional):

``EDM_FUSED_ATTN``      0 = never use Pallas attention kernels (einsum
                        everywhere); 1 = use them whenever *applicable*
                        (pre-policy behavior); unset = policy decides.
``EDM_FUSED_ATTN_NARROW`` 0 = disallow sub-128-lane head widths in the
                        Pallas kernels (pre-validation default); unset/1 =
                        allow (validated on-chip round 3, exact parity).
``EDM_FUSED_GN``        1 = force the fused GN kernel where applicable.
``EDM_FUSED_SOFTMAX``   0 = disable the fused softmax kernel.
``EDM_INT8_CONV`` / ``EDM_INT8_ATTN`` / ``EDM_INT8_ACC``: see
nn/layers.py and ops/int8_einsum.py (int8-vs-folded kill switches).
"""

from __future__ import annotations

import os


def _env3(name: str):
    """Tri-state env read: None (unset → policy decides), True ('1'),
    False (anything else)."""
    v = os.environ.get(name)
    if v is None:
        return None
    return v == "1"


def int8_serving(mode) -> bool:
    """Mode-only predicate for 'this trace is the int8 deployment graph'.

    Unlike ``int8_conv_serving``/``int8_attention_serving`` it reads NO env
    kill-switches, so decoupled serving choices (e.g. the fused-GN call
    sites) don't silently flip when an unrelated kill-switch is set
    (round-3 ADVICE: EDM_INT8_ATTN=0 also swapped the GN kernel)."""
    return (mode.int8 and mode.a_quant and not mode.calib_a
            and not mode.w_quant and not mode.training
            and not mode.capture and not mode.soft_targets)


def narrow_lanes_allowed() -> bool:
    """Sub-128-lane head widths in the Pallas attention kernels (LDM's
    24/32/64-channel heads).  Validated bit-exact and 1.14–1.92× faster on
    the target chip (PERF.md round-3 session-3) → allowed by default;
    ``EDM_FUSED_ATTN_NARROW=0`` restores the conservative gate for an
    unvalidated chip."""
    return os.environ.get("EDM_FUSED_ATTN_NARROW", "1") == "1"


# measured crossover: grid=(B·H,) per-element kernels stop beating the
# batched einsum somewhere between B·H=112 (bedroom 16×16, fused wins
# 1.92×) and B·H=500 (CIFAR batch 500, einsum wins 1.07×)
BATCH_HEADS_EINSUM_MIN = 128
# einsum logits bytes beyond which HBM materialization risks OOM /
# bandwidth collapse (round-3 bedroom int8 sampling OOM'd at 1.4 GB)
LOGITS_BYTES_MAX = 256 * 1024 * 1024


def attention_impl(batch: int, heads: int, sq: int, skv: int,
                   c: int) -> str:
    """Pick the serving implementation for one attention site.

    Returns ``'fused'`` (whole-attention-in-VMEM Pallas kernel),
    ``'flash'`` (two-pass tiled Pallas kernel), or ``'einsum'`` (batched
    int8 einsums + [fused] softmax).  All three are parity-gated against
    the same fake-quant semantics; this is purely a performance choice.
    """
    from .pallas_attention import (fused_attention_applicable,
                                   flash_attention_applicable)

    narrow = narrow_lanes_allowed()
    can_fuse = (sq == skv
                and fused_attention_applicable(sq, c, narrow_lanes=narrow))
    can_flash = flash_attention_applicable(sq, skv, c, narrow_lanes=narrow)

    force = _env3("EDM_FUSED_ATTN")
    if force is False:
        return "einsum"
    if force is True:
        return "fused" if can_fuse else ("flash" if can_flash else "einsum")

    bh = batch * heads
    logits_bytes = 4 * bh * sq * skv
    if bh >= BATCH_HEADS_EINSUM_MIN and logits_bytes <= LOGITS_BYTES_MAX:
        # large-batch small-S: batched MXU einsums win (CIFAR batch 500)
        return "einsum"
    if can_fuse:
        return "fused"
    if can_flash:
        return "flash"
    return "einsum"


def use_fused_softmax() -> bool:
    """Fused softmax→int8-codes kernel on the einsum attention path."""
    force = _env3("EDM_FUSED_SOFTMAX")
    return True if force is None else force


def use_fused_gn(h: int, w: int, c: int) -> bool:
    """Fused GroupNorm(+swish)(+quantize) Pallas kernel.  Measured a net
    in-graph loss at every production shape tried (XLA already fuses the
    chain into the conv input) → default OFF; ``EDM_FUSED_GN=1`` forces it
    where applicable."""
    from .pallas_gn import fused_gn_applicable
    force = _env3("EDM_FUSED_GN")
    if force is not True:
        return False
    return fused_gn_applicable(h, w, c)


def preferred_export_kind(use_spatial_transformer: bool) -> str:
    """Best *quantized* serving export per architecture family, by
    measurement (PERF.md round 5):

    * conv/legacy-attention UNets (CIFAR DDPM, bedroom/church LDM):
      native int8 — 1.21×/1.02× (BENCH) and 1.66×/1.60× (bedroom
      UNet-only) vs fp32/bf16-FP;
    * spatial-transformer UNets (cin256-v2 ImageNet, SD v1.4): the
      native-int8 path measured 3.1× SLOWER than bf16-FP (1504.5 vs
      482.4 ms/step, imagenet production shape) — the policy defaults
      were swept on conv-family shapes only, and the tx shapes
      (single-head S≥1024 self-attention, GEGLU 1×1 convs, ctx k/v)
      land on losing branches.  Until a tx-shape sweep exists, the
      folded-weight W4A8 path (int-grid weights folded to bf16) is the
      measured-safe quantized serving for this family.

    ``EDM_SERVE_KIND`` overrides (value: ``int8`` | ``bf16``).
    """
    import os
    force = os.environ.get("EDM_SERVE_KIND")
    if force in ("int8", "bf16"):
        return force
    return "bf16" if use_spatial_transformer else "int8"
