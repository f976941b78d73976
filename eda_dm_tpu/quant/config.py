"""Static quantization configuration.

These dataclasses are the TPU-native replacement for the reference's runtime
quantizer-parameter dicts (``wq_params`` / ``aq_params`` built at e.g.
/root/reference/scripts/sample_diffusion_ddim.py:153-154) and for the mutable
mode flags the reference flips on its modules (``use_weight_quant``,
``use_act_quant``, ``soft_targets``, ``is_training``,
/root/reference/qdiff/quant_layer.py:439-441).  Here all of them are frozen,
hashable objects: they select *which XLA graph gets traced*, never runtime
state.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class QuantizerSpec:
    """Static description of one uniform affine quantizer.

    Mirrors the constructor arguments of the reference's
    ``UniformAffineQuantizer`` (/root/reference/qdiff/quant_layer.py:48-49).
    """

    n_bits: int = 8
    symmetric: bool = False      # symmetric *search range*; zero-point stays affine
    channel_wise: bool = False   # per-output-channel (weights) vs per-tensor (acts)
    scale_method: str = "mse"    # 'mse' (search) or 'max'
    leaf_param: bool = False     # activation quantizer: EMA running range
    always_zero: bool = False    # force zero_point = 0 (softmax outputs)
    prob: float = 1.0            # QDrop bypass probability during reconstruction
    num_candidates: int = 100    # thresholds in the MSE grid search
    # bins for the exact-histogram activation search (0 = always score on
    # the raw tensor).  Large calib activations (> 4·bins elements) build an
    # exact sort-based histogram and score the candidate grid binwise —
    # counts (incl. the clipping tail) are exact, the only approximation is
    # bin-center rounding (≤ range/(2·bins) ≈ delta/32 at 8 bits).  Kills
    # the (2·num × N) scoring graph that dominated round-1 scale-init
    # compile + runtime at production shapes (PERF.md: ~310 s).
    # NOTE: this is a default-on numerics change vs the reference's exact
    # elementwise scoring (quant_layer.py:163-199) for every activation
    # tensor past 4·bins elements; set search_bins=0 for reference-exact
    # scoring (tests/test_search.py bounds the histogram-vs-exact gap).
    search_bins: int = 4096

    @property
    def n_levels(self) -> int:
        return 2 ** self.n_bits

    def with_bits(self, n_bits: int) -> "QuantizerSpec":
        return dataclasses.replace(self, n_bits=n_bits)


@dataclasses.dataclass(frozen=True)
class QuantMode:
    """Which behaviour the traced forward graph has.

    Replaces the reference's in-place flag mutation
    (``set_quant_state`` at /root/reference/qdiff/quant_model.py:64-67,
    ``soft_targets`` / ``is_training`` toggles in
    /root/reference/qdiff/block_recon.py:38-108).  Passed as a static
    argument; each distinct mode is its own compiled graph.
    """

    w_quant: bool = False        # fake-quantize weights
    a_quant: bool = False        # fake-quantize activations
    calib_w: bool = False        # run weight-scale MSE search, write 'quant' vars
    calib_a: bool = False        # run act-scale MSE search + EMA, write 'quant' vars
    soft_targets: bool = False   # AdaRound soft rounding (block under reconstruction)
    training: bool = False       # QDrop stochastic bypass active (needs 'qdrop' rng)
    capture: bool = False        # sow block/layer taps into the 'taps' collection
    fused: bool = False          # serving: Pallas fused quantize+matmul on
                                 # 1x1 convs / denses (ops/pallas_quant.py)
    int8: bool = False           # serving: native int8 convs/matmuls on
                                 # exported integer weights (quant/export.py
                                 # ::export_serving_int8); int8 hits the MXU
                                 # ~1.3x faster than bf16 on v5e-class chips
                                 # and halves activation HBM traffic
    static_sides: Optional[tuple] = None
                                 # host-known ((module_path, side), ...) act
                                 # one-sided-ness values, frozen after the
                                 # first calibration batch (layers.py keeps
                                 # the batch-1 side).  When present, the
                                 # asymmetric (a_sym) search traces only the
                                 # taken 1-D/2-D branch instead of compiling
                                 # both under lax.cond
                                 # (calib/scale_init.py hoists these)

    def replace(self, **kw) -> "QuantMode":
        return dataclasses.replace(self, **kw)


# Common phase modes, mirroring the reference pipeline's states.
FP = QuantMode()
CALIB_W = QuantMode(w_quant=True, calib_w=True)
CALIB_A = QuantMode(w_quant=True, a_quant=True, calib_a=True)
WQ = QuantMode(w_quant=True)
WAQ = QuantMode(w_quant=True, a_quant=True)


@dataclasses.dataclass(frozen=True)
class QuantConfig:
    """Model-level quantization settings.

    Knob names intentionally match the reference CLI
    (/root/reference/scripts/task_config.py): weight_bit, act_bit, sm_abit,
    split, quant_act, a_sym.
    """

    weight_bit: int = 4
    act_bit: int = 8
    sm_abit: int = 8             # softmax-output activation bits
    a_sym: bool = False          # if True quantizers use asymmetric (2-D) search
    quant_act: bool = True
    split: bool = True           # split shortcut-concat quantization
    prob: float = 0.5            # QDrop probability for act quantizers

    @property
    def wq(self) -> QuantizerSpec:
        # reference: wq_params at sample_diffusion_ddim.py:153
        return QuantizerSpec(
            n_bits=self.weight_bit,
            symmetric=not self.a_sym,
            channel_wise=True,
            scale_method="mse",
        )

    @property
    def aq(self) -> QuantizerSpec:
        # reference: aq_params at sample_diffusion_ddim.py:154
        return QuantizerSpec(
            n_bits=self.act_bit,
            symmetric=not self.a_sym,
            channel_wise=False,
            scale_method="mse",
            leaf_param=self.quant_act,
            prob=self.prob,
        )

    def aq_softmax(self, always_zero: bool = True,
                   symmetric: Optional[bool] = None) -> QuantizerSpec:
        """Quantizer spec for softmax attention weights (sm_abit bits).

        Mirrors the per-flavour copies at
        /root/reference/qdiff/quant_block.py:151-155 (LDM SMV: always_zero,
        asymmetric), :262-266 (SD cross-attn: always_zero, inherited symmetry)
        and :414-416 (DDIM AttnBlock: bits only).
        """
        spec = self.aq.with_bits(self.sm_abit)
        sym = spec.symmetric if symmetric is None else symmetric
        return dataclasses.replace(spec, always_zero=always_zero, symmetric=sym)
