"""Quantization-aware flax layers.

TPU-native replacement for the reference's module surgery: where the
reference wraps ``nn.Conv2d/Linear`` into ``QuantModule`` at runtime
(/root/reference/qdiff/quant_model.py:26-44, qdiff/quant_layer.py:360-446),
here every conv/dense is *born* quantization-aware.  Behaviour is selected by
a static :class:`~eda_dm_tpu.quant.QuantMode`; quantizer state (scales,
zero-points, AdaRound alphas, EMA ranges) lives in the ``'quant'`` variable
collection; captured intermediates go to the ``'taps'`` collection.

Collections
-----------
params : FP weights (kernel/bias), frozen during PTQ.
quant  : per-layer quantizer state.  Weight side: ``w_delta, w_zp, w_alpha``
         (+ ``w_delta_1, ...`` twins for split layers).  Activation side
         (inside ActQuantizer submodules): ``delta, zero_point, running_min,
         running_max, one_side, inited``.
taps   : sown intermediates (layer/block inputs and outputs) when
         ``mode.capture`` — the functional replacement for the reference's
         forward hooks (qdiff/data_utils.py:85-104, qdiff/utils.py:12-23).
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..quant.config import QuantizerSpec, QuantMode
from ..quant import affine, search, adaround


def _sow_reduce(prev, new):
    """Keep only the latest value (no tuple accumulation)."""
    return new


def int8_acc_dtype():
    """Accumulator dtype for the int8 conv/dense serving matmuls.

    ``EDM_INT8_ACC=f32`` asks the MXU for an f32 accumulator directly: on
    stacks where the int32→f32 dequant epilogue is not fused into the conv
    output (an extra int32 materialization costs more HBM than the int8 MXU
    saves), this keeps the epilogue elementwise over f32.  f32 partial sums
    can round where the exact int32 sum exceeds 2^24 (possible at ≥3·3·256
    contractions with worst-case codes), so it is opt-in.  Unrecognized
    values raise instead of silently falling back.
    """
    val = os.environ.get("EDM_INT8_ACC", "int32")
    if val not in ("int32", "f32"):
        raise ValueError(
            f"EDM_INT8_ACC must be 'int32' or 'f32', got {val!r}")
    return jnp.float32 if val == "f32" else jnp.int32


class ActQuantizer(nn.Module):
    """Activation fake-quantizer with streaming MSE calibration.

    Functional equivalent of a leaf ``UniformAffineQuantizer``
    (/root/reference/qdiff/quant_layer.py:36-357) in its activation role:
    while calibrating (``mode.calib_a``) each forward runs the MSE range
    search on the live batch, EMA-updates the running range
    (quant_layer.py:79-85) and re-derives (delta, zero_point); afterwards the
    frozen state is used.  QDrop stochastic bypass (quant_layer.py:271-274)
    activates under ``mode.training`` via the 'qdrop' rng stream.
    """

    spec: QuantizerSpec

    @nn.compact
    def __call__(self, x: jnp.ndarray, mode: QuantMode,
                 params_only: bool = False):
        dtype = jnp.float32
        delta = self.variable("quant", "delta", lambda: jnp.ones((), dtype))
        zero_point = self.variable("quant", "zero_point",
                                   lambda: jnp.zeros((), dtype))
        running_min = self.variable("quant", "running_min",
                                    lambda: jnp.zeros((), dtype))
        running_max = self.variable("quant", "running_max",
                                    lambda: jnp.zeros((), dtype))
        one_side = self.variable("quant", "one_side",
                                 lambda: jnp.zeros((), jnp.int32))
        inited = self.variable("quant", "inited",
                               lambda: jnp.zeros((), jnp.bool_))
        # record the (possibly policy-overridden) act width so deployment
        # and the first/last/−2-policy tests can inspect it
        self.variable("quant", "a_bits",
                      lambda: jnp.asarray(self.spec.n_bits, jnp.int32))

        if params_only:
            # fused serving kernels apply (delta, zp) inside the matmul tile
            return delta.value, zero_point.value

        if not (mode.a_quant or mode.calib_a):
            return x

        spec = self.spec
        if mode.calib_a:
            xf = x.reshape(-1).astype(dtype)
            # host-hoisted side (frozen after batch 1): trace only the
            # taken 1-D/2-D branch for asymmetric quantizers
            static_side = (dict(mode.static_sides).get(self.path)
                           if mode.static_sides is not None else None)
            if static_side is not None:
                side = jnp.asarray(static_side, jnp.int32)
            else:
                side = jnp.where(one_side.value == search.ONE_SIDE_UNSET,
                                 search.detect_one_side(xf), one_side.value)
            if spec.search_bins and xf.size > 4 * spec.search_bins:
                # large tensors: exact-histogram scoring (quant/search.py)
                lo, hi = search.search_range_hist(
                    xf, spec.n_levels, side, spec.symmetric,
                    spec.num_candidates, spec.search_bins,
                    static_side=static_side)
            else:
                lo, hi = search.search_range(xf, spec.n_levels, side,
                                             spec.symmetric,
                                             spec.num_candidates,
                                             static_side=static_side)
            # EMA range update; first batch seeds the running range
            new_min = jnp.where(inited.value,
                                affine.ema_update(running_min.value,
                                                  running_max.value, lo, hi)[0],
                                lo)
            new_max = jnp.where(inited.value,
                                affine.ema_update(running_min.value,
                                                  running_max.value, lo, hi)[1],
                                hi)
            d, zp = affine.calculate_qparams(new_min, new_max, spec.n_levels,
                                             spec.always_zero)
            one_side.value = side
            running_min.value = new_min
            running_max.value = new_max
            delta.value = d
            zero_point.value = zp
            inited.value = jnp.ones((), jnp.bool_)
        else:
            d, zp = delta.value, zero_point.value

        x_fq = affine.fake_quant(x, d, zp, spec.n_levels)
        if mode.training and spec.prob < 1.0:
            x_fq = affine.qdrop(x_fq, x, spec.prob, self.make_rng("qdrop"))
        return x_fq


def int8_conv_serving(mode: QuantMode, wq: QuantizerSpec, aq: QuantizerSpec,
                      disable_act_quant: bool = False,
                      split: int = 0) -> bool:
    """Gate for the native int8 conv/dense serving path (export_serving_int8
    trees + DEPLOY_INT8).  8-bit-weight layers (first/last policy) keep the
    folded bf16 path — their centered codes can exceed int8 range — and
    activations must fit int8 after the L/2 recentering (act_bit ≤ 8).

    Split dual-quantizer layers also stay folded: the int8 path must run
    one conv + epilogue per half (the halves' act scales can't share a
    contraction), and two half-convs each materializing an s32 output lose
    to the folded path's single concatenated bf16 conv — measured 519 vs
    971 steps/s at the 16×16 384→256 up-shortcut shape, 322 vs 344 at
    32×32 256→128 (scripts/probes/split_shortcut.py).

    ``EDM_INT8_CONV=0`` (trace-time env kill-switch) keeps every conv/dense
    on the folded-bf16 fake-quant path even under ``DEPLOY_INT8`` — the
    int8 export tree carries the folded kernels too, so the fallback is
    exactly the ``DEPLOY`` numerics."""
    if os.environ.get("EDM_INT8_CONV", "1") != "1":
        return False
    return (mode.int8 and mode.a_quant and not mode.calib_a
            and not mode.w_quant and not mode.training
            and not mode.capture and not disable_act_quant
            and split == 0
            and wq.n_bits <= 7 and aq.n_bits <= 8)


class GNorm(nn.Module):
    """GroupNorm(32, eps=1e-6) with carrier-dtype output and param access.

    Drop-in for ``nn.GroupNorm`` (param names/init ``scale``/``bias``, fast
    f32 variance) with two deployment-relevant differences: the output
    keeps the *input* dtype — ``nn.GroupNorm(dtype=None)`` promotes bf16
    inputs to f32, which silently turned the whole bf16/int8 serving
    carrier into f32 HBM traffic after the first norm — and
    ``params_only=True`` returns ``(scale, bias)`` so serving paths can
    hand them to the fused one-HBM-pass kernel (ops/pallas_gn.py).
    """

    num_groups: int = 32
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray = None, params_only: bool = False):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        if params_only:
            return scale, bias
        xf = x.astype(jnp.float32)
        xg = xf.reshape(*x.shape[:-1], self.num_groups,
                        c // self.num_groups)
        axes = tuple(range(1, x.ndim - 1)) + (x.ndim,)
        mean = jnp.mean(xg, axis=axes, keepdims=True)
        # two-pass variance (torch GN semantics; also what the fused
        # serving kernel computes — fast variance's cancellation noise
        # differs per summation order and flips borderline act codes)
        var = jnp.mean((xg - mean) ** 2, axis=axes, keepdims=True)
        y = (xg - mean) * jax.lax.rsqrt(var + self.eps)
        y = y.reshape(x.shape) * scale + bias
        return y.astype(x.dtype)


def _quantize_act_int8(x: jnp.ndarray, delta: jnp.ndarray,
                       zp: jnp.ndarray, n_levels: int):
    """8-bit activation codes recentered to int8.

    The affine code q ∈ [−zp, L−1−zp] spans up to 256 values, so it is
    shifted by c = L/2 − zp into [−128, 127]; the conv epilogue adds the
    ``c·Σw`` correction back (export_serving_int8 docstring).  Returns
    (int8 codes, c) with ``(codes + c)·Δ`` == the fake-quant value.
    Requires n_levels ≤ 256 (callers gate on aq.n_bits ≤ 8).
    """
    assert n_levels <= 256, "int8 act codes require act_bit <= 8"
    xf = x.astype(jnp.float32)
    q = jnp.clip(jnp.round(xf / delta), -zp, n_levels - 1 - zp)
    c = n_levels / 2 - zp
    return (q - c).astype(jnp.int8), c


def _same_pads(h: int, w: int, kh: int, kw: int, sh: int, sw: int):
    def one(size, k, s):
        out = -(-size // s)
        total = max((out - 1) * s + k - size, 0)
        return (total // 2, total - total // 2)
    return one(h, kh, sh), one(w, kw, sw)


class _WeightQuant:
    """Helper mixing weight-quantizer state into QConv/QDense.

    Weight scales are computed one-shot from the parameter tensor (the
    reference reaches the same values via a lazy first forward,
    quant_layer.py:246-263); AdaRound alpha is initialized so hard rounding
    equals round-to-nearest, replacing the reference's quantizer swap
    (block_recon.py:50-64) with a no-op state transition.
    """

    @staticmethod
    def make(mdl: nn.Module, name: str, kernel: jnp.ndarray,
             spec: QuantizerSpec, mode: QuantMode, channel_axis: int):
        shape = [1] * kernel.ndim
        shape[channel_axis] = kernel.shape[channel_axis]
        delta = mdl.variable("quant", f"{name}_delta",
                             lambda: jnp.ones(shape, jnp.float32))
        zp = mdl.variable("quant", f"{name}_zp",
                          lambda: jnp.zeros(shape, jnp.float32))
        alpha = mdl.variable("quant", f"{name}_alpha",
                             lambda: jnp.zeros(kernel.shape, jnp.float32))
        # record the (possibly per-layer overridden) width for deployment
        # export (quant/export.py reads it to clamp correctly)
        mdl.variable("quant", f"{name}_bits",
                     lambda: jnp.asarray(spec.n_bits, jnp.int32))
        if mode.calib_w:
            d, z = search.weight_qparams(
                kernel, spec.n_levels, spec.symmetric,
                channel_axis if spec.channel_wise else None,
                spec.num_candidates, spec.always_zero)
            if not spec.channel_wise:
                d = jnp.full(shape, d)
                z = jnp.full(shape, z)
            a = adaround.init_alpha(kernel, d)
            delta.value, zp.value, alpha.value = d, z, a
            return d, z, a
        return delta.value, zp.value, alpha.value

    @staticmethod
    def quantize(kernel, delta, zp, alpha, spec: QuantizerSpec,
                 mode: QuantMode):
        return adaround.adaround_fake_quant(kernel, delta, zp, alpha,
                                            spec.n_levels, mode.soft_targets)


class QConv(nn.Module):
    """Quantization-aware NHWC convolution.

    Mirrors the roles of ``QuantModule`` wrapping a Conv2d
    (/root/reference/qdiff/quant_layer.py:360-437): input activation
    fake-quant, weight fake-quant (AdaRound-parameterized), and the
    split-shortcut dual-quantizer path — ``split > 0`` quantizes input
    channels ``[:split]`` and ``[split:]`` with independent scale pairs
    (quant_layer.py:406-437, Q-Diffusion's concat-skip trick).
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "SAME"               # or explicit ((t,b),(l,r))
    wq: QuantizerSpec = QuantizerSpec()
    aq: QuantizerSpec = QuantizerSpec()
    split: int = 0
    disable_act_quant: bool = False     # network output layer (quant_model.py:90-95)
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, mode: QuantMode,
                 pre_gn: Optional[tuple] = None) -> jnp.ndarray:
        in_ch = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (*self.kernel_size, in_ch, self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)

        if mode.capture:
            self.sow("taps", "in", x, reduce_fn=_sow_reduce)

        # --- native int8 serving path (export_serving_int8 weights) -------
        # gate in int8_conv_serving; ``pre_gn = (scale, bias, swish?)``
        # additionally fuses the producer GroupNorm(+swish) into the input
        # quantize+pad pass (ops/pallas_gn.py) — callers may pass it only
        # when this gate holds (models check the same predicate).
        if int8_conv_serving(mode, self.wq, self.aq, self.disable_act_quant,
                             self.split):
            return self._int8_forward(x, bias, mode, pre_gn=pre_gn)
        assert pre_gn is None, "pre_gn requires the int8 serving path"

        # --- fused serving path (Pallas quantize+matmul, 1x1 convs) -------
        if (mode.fused and mode.a_quant and not mode.calib_a
                and not mode.w_quant and not mode.training
                and not mode.capture and not self.disable_act_quant
                and self.kernel_size == (1, 1)
                and tuple(self.strides) == (1, 1)):
            return self._fused_forward(x, kernel, bias, mode)

        # --- activation quantization --------------------------------------
        do_act = not self.disable_act_quant
        if self.split > 0:
            q0 = ActQuantizer(self.aq, name="act_quantizer")
            q1 = ActQuantizer(self.aq, name="act_quantizer_1")
            if do_act:
                x = jnp.concatenate([q0(x[..., :self.split], mode),
                                     q1(x[..., self.split:], mode)], axis=-1)
        else:
            q0 = ActQuantizer(self.aq, name="act_quantizer")
            if do_act:
                x = q0(x, mode)

        # --- weight quantization ------------------------------------------
        if self.split > 0:
            k0, k1 = kernel[:, :, :self.split, :], kernel[:, :, self.split:, :]
            d0, z0, a0 = _WeightQuant.make(self, "w0", k0, self.wq, mode, 3)
            d1, z1, a1 = _WeightQuant.make(self, "w1", k1, self.wq, mode, 3)
            if mode.w_quant:
                k0 = _WeightQuant.quantize(k0, d0, z0, a0, self.wq, mode)
                k1 = _WeightQuant.quantize(k1, d1, z1, a1, self.wq, mode)
            w = jnp.concatenate([k0, k1], axis=2)
        else:
            d, z, a = _WeightQuant.make(self, "w0", kernel, self.wq, mode, 3)
            w = (_WeightQuant.quantize(kernel, d, z, a, self.wq, mode)
                 if mode.w_quant else kernel)

        # 1x1 stride-1 convs on the quantized paths lower as channel
        # matmuls: XLA fuses the act fake-quant chain into the dot operand
        # for free, where the convolution lowering pays a separate VPU pass
        # for it (measured on v5e: quant+conv1x1 2.47 ms vs quant+matmul
        # 1.29 ms at batch 500 / 32x32x256).  FP mode keeps the conv
        # lowering, which XLA schedules better without the quant producer.
        # serving trees may carry a reduced-precision carrier (bf16 folded
        # kernels) while callers feed f32 (or vice versa) — promote to the
        # wider dtype so lax.conv's equal-dtype requirement holds
        if w.dtype != x.dtype:
            ct = jnp.promote_types(w.dtype, x.dtype)
            w = w.astype(ct)
            x = x.astype(ct)
        if (self.kernel_size == (1, 1) and tuple(self.strides) == (1, 1)
                and self.padding == "VALID"
                and (mode.a_quant or mode.calib_a)):
            nb, hh, ww_, ci = x.shape
            out = (x.reshape(-1, ci) @ w.reshape(ci, self.features))
            out = out.reshape(nb, hh, ww_, self.features)
        else:
            out = jax.lax.conv_general_dilated(
                x, w, window_strides=self.strides, padding=self.padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if bias is not None:
            out = out + bias

        if mode.capture:
            self.sow("taps", "out", out, reduce_fn=_sow_reduce)
        return out

    def _int8_forward(self, x, bias, mode, pre_gn=None):
        """Serving forward on integer weights: quantize the input to int8,
        run the convolution on the MXU's int8 mode with int32 accumulation,
        and dequantize in a fused f32 epilogue.

        Exact algebra (per channel half h with act params (Δx, zpx) and
        per-output-channel weight scale Δw):
            x̂·ŵ = Δx·Δw · [conv(q_s, w_int) + c·Σw]      c = 128 − zpx

        Padding uses the conv's native zero padding over the CODE array
        plus an exact border correction in the epilogue ("zero-code
        padding").  x = 0 quantizes to code −c, so zero-padding the codes
        over-counts each border tap by +c·w; the epilogue subtracts
        c·border where border = conv(pad_indicator, w_int) is a tiny
        batch-1 int32 map (loop-invariant: XLA hoists it out of sampling
        scans).  This beats the previous explicit ``jnp.pad`` in x-space,
        which broke XLA's producer fusion — the GN-normalize pass had to
        materialize bf16 and a separate quantize+pad pass re-read it
        (measured 464→636 steps/s at 32×32×128 batch 500,
        scripts/probes/conv_epilogue.py; the folded-bf16 path gets 443 and
        bf16-FP 480).  Split layers run one conv per half and sum
        epilogues.

        ``pre_gn = (scale, bias, swish?)``: the producer GroupNorm(+swish)
        runs fused with the quantize+pad in one Pallas HBM pass
        (ops/pallas_gn.py) instead of as separate XLA passes.
        """
        in_ch = x.shape[-1]
        assert pre_gn is None or self.split == 0
        halves = ([(0, self.split, "w0", "act_quantizer"),
                   (self.split, in_ch, "w1", "act_quantizer_1")]
                  if self.split > 0 else [(0, in_ch, "w0", "act_quantizer")])
        kh, kw = self.kernel_size
        sh, sw = self.strides
        if self.padding == "SAME":
            pads = _same_pads(x.shape[1], x.shape[2], kh, kw, sh, sw)
        elif self.padding == "VALID":
            pads = ((0, 0), (0, 0))
        else:
            pads = tuple(self.padding)

        n_lv = self.aq.n_levels
        out = None
        for s, e, name, qname in halves:
            d, zp = ActQuantizer(self.aq, name=qname)(x, mode,
                                                      params_only=True)
            w_int = self.variable(
                "quant", f"{name}_int",
                lambda: jnp.zeros((kh, kw, e - s, self.features), jnp.int8))
            w_isum = self.variable(
                "quant", f"{name}_isum",
                lambda: jnp.zeros((self.features,), jnp.float32))
            w_delta = self.variable(
                "quant", f"{name}_delta",
                lambda: jnp.ones((1, 1, 1, self.features), jnp.float32))
            if pre_gn is not None:
                from ..ops.pallas_gn import gn_swish_int8
                from ..ops.pallas_softmax import pallas_interpret
                gn_scale, gn_bias, gn_swish = pre_gn
                # kernel emits codes already padded with −c → VALID conv
                qs, c = gn_swish_int8(x, gn_scale, gn_bias, d, zp, n_lv,
                                      pads, swish=gn_swish,
                                      interpret=pallas_interpret())
                acc = jax.lax.conv_general_dilated(
                    qs, w_int.value, window_strides=(sh, sw),
                    padding="VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=int8_acc_dtype())
                corr = c * w_isum.value
            else:
                # zero-code padding: quantize UNPADDED (the elementwise
                # chain fuses into the producer GN/swish pass) and let the
                # conv zero-pad the codes; the epilogue subtracts the
                # exact c·border over-count (see docstring)
                xs = x[..., s:e]
                qs, c = _quantize_act_int8(xs, d, zp, n_lv)
                # note: unlike the fake-quant branch, 1×1 convs stay on
                # the conv lowering here — the matmul rewrite was measured
                # SLOWER for int8 codes (bench 17.99→16.87 steps/s); XLA's
                # native int8 conv is the fast path on this stack
                acc = jax.lax.conv_general_dilated(
                    qs, w_int.value, window_strides=(sh, sw),
                    padding=pads,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=int8_acc_dtype())
                if pads != ((0, 0), (0, 0)):
                    # exact int32 pad-indicator conv (f32 convs run at
                    # bf16 precision on TPU and round border sums > 256);
                    # batch-1, loop-invariant — hoisted out of scans
                    ind = jnp.pad(
                        jnp.zeros((1, xs.shape[1], xs.shape[2], e - s),
                                  jnp.int8),
                        ((0, 0), pads[0], pads[1], (0, 0)),
                        constant_values=1)
                    border = jax.lax.conv_general_dilated(
                        ind, w_int.value, window_strides=(sh, sw),
                        padding="VALID",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        preferred_element_type=jnp.int32)
                    corr = c * (w_isum.value - border.astype(jnp.float32))
                else:
                    corr = c * w_isum.value
            term = (acc.astype(jnp.float32) + corr) \
                * (d * w_delta.value.reshape(1, 1, 1, -1))
            out = term if out is None else out + term
        if bias is not None:
            out = out + bias.astype(jnp.float32)
        return out.astype(x.dtype)

    def _fused_forward(self, x, kernel, bias, mode):
        """Deployment fast path: a 1x1 conv is a matmul over channels; the
        act fake-quant fuses into the Pallas tile load
        (ops/pallas_quant.py::fakequant_matmul).  Split layers contribute
        their two (delta, zp) pairs as per-input-channel rows."""
        from ..ops.pallas_quant import fakequant_matmul

        n, hh, ww, c = x.shape
        q0 = ActQuantizer(self.aq, name="act_quantizer")
        if self.split > 0:
            q1 = ActQuantizer(self.aq, name="act_quantizer_1")
            d0, z0 = q0(x, mode, params_only=True)
            d1, z1 = q1(x, mode, params_only=True)
            delta_k = jnp.concatenate([jnp.full((self.split,), 1.0) * d0,
                                       jnp.full((c - self.split,), 1.0) * d1])
            zp_k = jnp.concatenate([jnp.full((self.split,), 1.0) * z0,
                                    jnp.full((c - self.split,), 1.0) * z1])
        else:
            d0, z0 = q0(x, mode, params_only=True)
            delta_k = jnp.full((c,), 1.0) * d0
            zp_k = jnp.full((c,), 1.0) * z0
        out = fakequant_matmul(
            x.reshape(-1, c), kernel.reshape(c, self.features),
            delta_k, zp_k, n_levels=self.aq.n_levels, bias=bias,
            interpret=jax.default_backend() == "cpu")
        return out.reshape(n, hh, ww, self.features)


class QDense(nn.Module):
    """Quantization-aware dense layer (QuantModule wrapping nn.Linear)."""

    features: int
    wq: QuantizerSpec = QuantizerSpec()
    aq: QuantizerSpec = QuantizerSpec()
    disable_act_quant: bool = False
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, mode: QuantMode) -> jnp.ndarray:
        in_ch = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (in_ch, self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)

        if mode.capture:
            self.sow("taps", "in", x, reduce_fn=_sow_reduce)

        # --- native int8 serving path (see QConv._int8_forward) -----------
        if int8_conv_serving(mode, self.wq, self.aq, self.disable_act_quant):
            d, zp = ActQuantizer(self.aq, name="act_quantizer")(
                x, mode, params_only=True)
            w_int = self.variable(
                "quant", "w0_int",
                lambda: jnp.zeros((in_ch, self.features), jnp.int8))
            w_isum = self.variable(
                "quant", "w0_isum",
                lambda: jnp.zeros((self.features,), jnp.float32))
            w_delta = self.variable(
                "quant", "w0_delta",
                lambda: jnp.ones((1, self.features), jnp.float32))
            qs, c = _quantize_act_int8(x, d, zp, self.aq.n_levels)
            acc = jnp.matmul(qs.reshape(-1, in_ch), w_int.value,
                             preferred_element_type=int8_acc_dtype())
            out = (acc.astype(jnp.float32) + c * w_isum.value) \
                * (d * w_delta.value.reshape(1, -1))
            if bias is not None:
                out = out + bias.astype(jnp.float32)
            return out.reshape(*x.shape[:-1],
                               self.features).astype(x.dtype)

        if (mode.fused and mode.a_quant and not mode.calib_a
                and not mode.w_quant and not mode.training
                and not mode.capture and not self.disable_act_quant):
            from ..ops.pallas_quant import fakequant_matmul
            q0 = ActQuantizer(self.aq, name="act_quantizer")
            d0, z0 = q0(x, mode, params_only=True)
            out = fakequant_matmul(
                x.reshape(-1, in_ch), kernel,
                jnp.full((in_ch,), 1.0) * d0, jnp.full((in_ch,), 1.0) * z0,
                n_levels=self.aq.n_levels, bias=bias,
                interpret=jax.default_backend() == "cpu")
            return out.reshape(*x.shape[:-1], self.features)

        if not self.disable_act_quant:
            x = ActQuantizer(self.aq, name="act_quantizer")(x, mode)

        d, z, a = _WeightQuant.make(self, "w0", kernel, self.wq, mode, 1)
        w = (_WeightQuant.quantize(kernel, d, z, a, self.wq, mode)
             if mode.w_quant else kernel)

        out = x @ w
        if bias is not None:
            out = out + bias
        if mode.capture:
            self.sow("taps", "out", out, reduce_fn=_sow_reduce)
        return out


def group_norm(num_groups: int = 32, eps: float = 1e-6,
               name: Optional[str] = None) -> GNorm:
    """GroupNorm(32, eps=1e-6) as used by every norm in both model zoos
    (ddim/models/diffusion.py:32-33, ldm openaimodel normalization).

    Returns :class:`GNorm` — nn.GroupNorm-compatible params, carrier-dtype
    output (see GNorm docstring)."""
    return GNorm(num_groups=num_groups, eps=eps, name=name)


def swish(x: jnp.ndarray) -> jnp.ndarray:
    """x * sigmoid(x) (ddim/models/diffusion.py:27-29)."""
    return jax.nn.silu(x)


def timestep_embedding(t: jnp.ndarray, dim: int,
                       max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal timestep embedding, [sin | cos] order.

    Matches ``get_timestep_embedding`` (ddim/models/diffusion.py:6-24):
    freqs = exp(-ln(10000) * arange(half) / (half - 1)).
    """
    half = dim // 2
    freqs = jnp.exp(-jnp.log(max_period) *
                    jnp.arange(half, dtype=jnp.float32) / (half - 1))
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb
