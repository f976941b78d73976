"""DDPM UNet (CIFAR/LSUN pixel-space) — quantization-aware flax rebuild.

Re-implements the architecture of the reference's ``Model``
(/root/reference/ddim/models/diffusion.py:199-392) with the quantization
insertion points of ``QuantResnetBlock`` / ``QuantAttnBlock``
(/root/reference/qdiff/quant_block.py:300-348,398-451) built in:

* every conv / dense is a :class:`QConv` / :class:`QDense` (act + weight
  fake-quant, AdaRound weights);
* attention matmuls carry four activation quantizers (q, k, v at act_bit and
  the softmax output at sm_abit);
* the up-path 1×1 skip convs use split-channel dual quantizers when
  ``qc.split`` (diffusion.py:354-368 routing split into ``nin_shortcut``);
* the reference's ``set_first_last_layer_to_8bit`` /
  ``disable_network_output_quantization`` policies
  (/root/reference/qdiff/quant_model.py:77-95) are applied at construction:
  first registered weight quantizer (temb dense 0) and last (conv_out) are
  8-bit, conv_out's act quant is disabled and the second-to-last registered
  act quantizer (level-3 upsample conv) is 8-bit.

Layout is NHWC (TPU-native); weight layout HWIO.  Inference-only: dropout is
omitted (the reference always runs quantization in eval mode).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..quant.config import QuantConfig, QuantMode, QuantizerSpec
from ..ops.int8_einsum import (int8_attention_serving, int8_act_einsum,
                               int8_code_einsum, quantize_act_int8)
from ..ops.pallas_softmax import softmax_int8_codes, pallas_interpret
from ..ops.serving_policy import (attention_impl, use_fused_gn,
                                  use_fused_softmax, int8_serving)
from ..ops.pallas_attention import int8_fused_attention
from ..ops.pallas_gn import gn_norm
from ..nn.layers import (QConv, QDense, ActQuantizer, GNorm, group_norm,
                         int8_conv_serving, swish, timestep_embedding,
                         _sow_reduce)


@dataclasses.dataclass(frozen=True)
class DDPMConfig:
    """Architecture hyperparameters (configs/cifar10.yml 'model' section)."""
    in_channels: int = 3
    out_ch: int = 3
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 2, 2)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (16,)
    resolution: int = 32

    @property
    def temb_ch(self) -> int:
        return self.ch * 4

    @property
    def num_resolutions(self) -> int:
        return len(self.ch_mult)


class ResnetBlockD(nn.Module):
    """DDPM ResnetBlock (diffusion.py:77-141 / quant_block.py:300-348).

    ``split`` > 0 activates the dual-quantizer path on the 1×1 shortcut conv
    only (the reference routes split exclusively into ``nin_shortcut``,
    diffusion.py:136-139).
    """

    out_ch: int
    temb_ch: int
    wq: QuantizerSpec
    aq: QuantizerSpec
    split: int = 0
    conv_shortcut: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: jnp.ndarray,
                 mode: QuantMode) -> jnp.ndarray:
        if mode.capture:
            self.sow("taps", "block_in", x, reduce_fn=_sow_reduce)
        in_ch = x.shape[-1]
        # on the int8 serving path the producer GN(+swish) fuses with the
        # conv input quantize+pad into one Pallas HBM pass (pre_gn)
        int8_path = int8_conv_serving(mode, self.wq, self.aq)
        gn1 = group_norm(name="GroupNorm_0")
        if int8_path and use_fused_gn(*x.shape[1:]):
            h = QConv(self.out_ch, (3, 3), wq=self.wq, aq=self.aq,
                      name="conv1")(x, mode,
                                    pre_gn=(*gn1(x, params_only=True), True))
        else:
            h = QConv(self.out_ch, (3, 3), wq=self.wq, aq=self.aq,
                      name="conv1")(swish(gn1(x)), mode)
        h = h + QDense(self.out_ch, wq=self.wq, aq=self.aq,
                       name="temb_proj")(swish(temb), mode)[:, None, None, :]
        gn2 = group_norm(name="GroupNorm_1")
        if int8_path and use_fused_gn(*h.shape[1:]):
            h = QConv(self.out_ch, (3, 3), wq=self.wq, aq=self.aq,
                      name="conv2")(h, mode,
                                    pre_gn=(*gn2(h, params_only=True), True))
        else:
            h = QConv(self.out_ch, (3, 3), wq=self.wq, aq=self.aq,
                      name="conv2")(swish(gn2(h)), mode)
        if in_ch != self.out_ch:
            if self.conv_shortcut:
                x = QConv(self.out_ch, (3, 3), wq=self.wq, aq=self.aq,
                          name="conv_shortcut")(x, mode)
            else:
                x = QConv(self.out_ch, (1, 1), padding="VALID", wq=self.wq,
                          aq=self.aq, split=self.split,
                          name="nin_shortcut")(x, mode)
        out = x + h
        if mode.capture:
            self.sow("taps", "block_out", out, reduce_fn=_sow_reduce)
        return out

    def inner_taps(self, in_ch: int) -> List[Tuple[str, ...]]:
        """Ordered QuantModule output taps (reference hook order,
        block_recon.py:47-49 over modules()); the FBR loss excludes the last."""
        taps = [("conv1",), ("temb_proj",), ("conv2",)]
        if in_ch != self.out_ch:
            taps.append(("conv_shortcut",) if self.conv_shortcut
                        else ("nin_shortcut",))
        return taps


class AttnBlockD(nn.Module):
    """DDPM self-attention block (diffusion.py:144-196 / quant_block.py:398-451).

    Quantizer placement (CIFAR flavour): q and k are quantized *unscaled*
    after their 1×1 convs; the softmax output is quantized at sm_abit and v
    at act_bit before the second matmul.
    """

    wq: QuantizerSpec
    aq: QuantizerSpec
    aq_w: QuantizerSpec          # softmax-output quantizer spec (sm_abit)

    @nn.compact
    def __call__(self, x: jnp.ndarray, mode: QuantMode) -> jnp.ndarray:
        if mode.capture:
            self.sow("taps", "block_in", x, reduce_fn=_sow_reduce)
        n, hh, ww, c = x.shape
        gn = group_norm(name="GroupNorm_0")
        if int8_serving(mode) and use_fused_gn(hh, ww, c):
            # multi-consumer GN output (q/k/v convs): emit the carrier
            # dtype in one HBM pass instead of XLA's two-pass GN
            h = gn_norm(x, *gn(x, params_only=True),
                        interpret=pallas_interpret())
        else:
            h = gn(x)
        q = QConv(c, (1, 1), padding="VALID", wq=self.wq, aq=self.aq,
                  name="q")(h, mode)
        k = QConv(c, (1, 1), padding="VALID", wq=self.wq, aq=self.aq,
                  name="k")(h, mode)
        v = QConv(c, (1, 1), padding="VALID", wq=self.wq, aq=self.aq,
                  name="v")(h, mode)
        q = q.reshape(n, hh * ww, c)
        k = k.reshape(n, hh * ww, c)
        v = v.reshape(n, hh * ww, c)

        # invoked unconditionally (no-op outside quant/calib modes) so every
        # QuantMode shares one variable treedef — a conditional here made the
        # first calib forward *create* these leaves, forcing a second full
        # compile of the calibration graph on batch 1
        if int8_attention_serving(mode) and self.aq.n_levels <= 256 \
                and self.aq_w.n_levels <= 256:
            # serving: both matmuls run int8×int8→int32 on the MXU with the
            # exact recentering epilogue (ops/int8_einsum.py); quantizers
            # contribute their frozen (Δ, zp) only
            dq, zq = ActQuantizer(self.aq, name="act_quantizer_q")(
                q, mode, params_only=True)
            dk, zk = ActQuantizer(self.aq, name="act_quantizer_k")(
                k, mode, params_only=True)
            dv, zv = ActQuantizer(self.aq, name="act_quantizer_v")(
                v, mode, params_only=True)
            dw, zw = ActQuantizer(self.aq_w, name="act_quantizer_w")(
                jnp.zeros((), x.dtype), mode, params_only=True)
            s_hw = hh * ww
            if attention_impl(n, 1, s_hw, s_hw, c) == "fused":
                # whole attention for a batch element stays in VMEM: the
                # (n, hw, hw) logits are never materialized in HBM
                # (ops/pallas_attention.py)
                Qc, cq = quantize_act_int8(q, dq, zq, self.aq.n_levels)
                Kc, ck = quantize_act_int8(k, dk, zk, self.aq.n_levels)
                V, cv = quantize_act_int8(v, dv, zv, self.aq.n_levels)
                h = int8_fused_attention(
                    Qc, cq, dq, Kc, ck, dk, V, cv, dv, c ** -0.5,
                    dw, zw, self.aq_w.n_levels,
                    interpret=pallas_interpret())
            else:
                w = int8_act_einsum("nic,njc->nij",
                                    q, (dq, zq, self.aq.n_levels),
                                    k, (dk, zk, self.aq.n_levels)) \
                    * (c ** -0.5)
                if use_fused_softmax():
                    # fused softmax→codes: one pass over the (n, hw, hw)
                    # logits instead of XLA's multi-pass f32 softmax+quantize
                    W, cw = softmax_int8_codes(w, dw, zw, self.aq_w.n_levels,
                                               interpret=pallas_interpret())
                else:
                    W, cw = quantize_act_int8(
                        jax.nn.softmax(w, axis=-1), dw, zw,
                        self.aq_w.n_levels)
                V, cv = quantize_act_int8(v, dv, zv, self.aq.n_levels)
                h = int8_code_einsum("nij,njc->nic", W, cw, dw, V, cv, dv)
        else:
            q = ActQuantizer(self.aq, name="act_quantizer_q")(q, mode)
            k = ActQuantizer(self.aq, name="act_quantizer_k")(k, mode)
            w = jnp.einsum("nic,njc->nij", q, k,
                           preferred_element_type=jnp.float32) * (c ** -0.5)
            # softmax in f32 for stability; the (n, hw, hw) probability
            # tensor is materialized in the carrier dtype (half traffic on
            # the bf16 path)
            w = jax.nn.softmax(w, axis=-1).astype(x.dtype)
            v = ActQuantizer(self.aq, name="act_quantizer_v")(v, mode)
            w = ActQuantizer(self.aq_w, name="act_quantizer_w")(w, mode)
            h = jnp.einsum("nij,njc->nic", w, v,
                           preferred_element_type=jnp.float32)
        # keep MXU accumulation in f32 but return to the carrier dtype so a
        # bf16 serving pass is not promoted back to f32 by the residual add
        h = h.astype(x.dtype).reshape(n, hh, ww, c)
        h = QConv(c, (1, 1), padding="VALID", wq=self.wq, aq=self.aq,
                  name="proj_out")(h, mode)
        out = x + h
        if mode.capture:
            self.sow("taps", "block_out", out, reduce_fn=_sow_reduce)
        return out

    def inner_taps(self, in_ch: int = 0) -> List[Tuple[str, ...]]:
        return [("q",), ("k",), ("v",), ("proj_out",)]


class Downsample(nn.Module):
    """Stride-2 conv with the reference's asymmetric (0,1) padding
    (diffusion.py:55-74)."""

    wq: QuantizerSpec
    aq: QuantizerSpec

    @nn.compact
    def __call__(self, x: jnp.ndarray, mode: QuantMode) -> jnp.ndarray:
        c = x.shape[-1]
        return QConv(c, (3, 3), strides=(2, 2), padding=((0, 1), (0, 1)),
                     wq=self.wq, aq=self.aq, name="conv")(x, mode)


class Upsample(nn.Module):
    """2× nearest upsample + 3×3 conv (diffusion.py:36-52)."""

    wq: QuantizerSpec
    aq: QuantizerSpec
    aq_override: Optional[QuantizerSpec] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, mode: QuantMode) -> jnp.ndarray:
        c = x.shape[-1]
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        aq = self.aq_override or self.aq
        return QConv(c, (3, 3), wq=self.wq, aq=aq, name="conv")(x, mode)


class DownLevel(nn.Module):
    cfg: DDPMConfig
    level: int
    wq: QuantizerSpec
    aq: QuantizerSpec
    aq_w: QuantizerSpec

    def setup(self):
        cfg = self.cfg
        curr_res = cfg.resolution // (2 ** self.level)
        block_out = cfg.ch * cfg.ch_mult[self.level]
        self.block = [ResnetBlockD(block_out, cfg.temb_ch, self.wq, self.aq)
                      for _ in range(cfg.num_res_blocks)]
        self.attn = ([AttnBlockD(self.wq, self.aq, self.aq_w)
                      for _ in range(cfg.num_res_blocks)]
                     if curr_res in cfg.attn_resolutions else [])
        if self.level != cfg.num_resolutions - 1:
            self.downsample = Downsample(self.wq, self.aq)

    def __call__(self, h, temb, mode):
        outs = []
        for i, blk in enumerate(self.block):
            h = blk(h, temb, mode)
            if self.attn:
                h = self.attn[i](h, mode)
            outs.append(h)
        if self.level != self.cfg.num_resolutions - 1:
            h = self.downsample(h, mode)
            outs.append(h)
        return h, outs


class UpLevel(nn.Module):
    cfg: DDPMConfig
    level: int
    wq: QuantizerSpec
    aq: QuantizerSpec
    aq_w: QuantizerSpec
    split_channels: Tuple[int, ...]     # h-channels before each concat, or 0s
    aq_upsample_override: Optional[QuantizerSpec] = None

    def setup(self):
        cfg = self.cfg
        curr_res = cfg.resolution // (2 ** self.level)
        block_out = cfg.ch * cfg.ch_mult[self.level]
        self.block = [
            ResnetBlockD(block_out, cfg.temb_ch, self.wq, self.aq,
                         split=self.split_channels[i])
            for i in range(cfg.num_res_blocks + 1)]
        self.attn = ([AttnBlockD(self.wq, self.aq, self.aq_w)
                      for _ in range(cfg.num_res_blocks + 1)]
                     if curr_res in cfg.attn_resolutions else [])
        if self.level != 0:
            self.upsample = Upsample(self.wq, self.aq,
                                     aq_override=self.aq_upsample_override)

    def __call__(self, h, skips: List[jnp.ndarray], temb, mode):
        for i, blk in enumerate(self.block):
            h = blk(jnp.concatenate([h, skips.pop()], axis=-1), temb, mode)
            if self.attn:
                h = self.attn[i](h, mode)
        if self.level != 0:
            h = self.upsample(h, mode)
        return h


class DDPMUNet(nn.Module):
    """The full pixel-space UNet (diffusion.py:199-392)."""

    cfg: DDPMConfig = DDPMConfig()
    qc: QuantConfig = QuantConfig()

    def setup(self):
        cfg, qc = self.cfg, self.qc
        wq, aq = qc.wq, qc.aq
        # CIFAR softmax-weight quantizer: bits only (quant_block.py:414-416)
        aq_w = qc.aq_softmax(always_zero=False)
        self._wq, self._aq, self._aq_w = wq, aq, aq_w

        # first/last policy (quant_model.py:77-95): first registered weight
        # quantizer = temb dense 0; last = conv_out
        self.temb_dense_0 = QDense(cfg.temb_ch, wq=wq.with_bits(8), aq=aq)
        self.temb_dense_1 = QDense(cfg.temb_ch, wq=wq, aq=aq)
        self.conv_in = QConv(cfg.ch, (3, 3), wq=wq, aq=aq)

        self.down = [DownLevel(cfg, i, wq, aq, aq_w)
                     for i in range(cfg.num_resolutions)]

        mid_ch = cfg.ch * cfg.ch_mult[-1]
        self.mid_block_1 = ResnetBlockD(mid_ch, cfg.temb_ch, wq, aq)
        self.mid_attn_1 = AttnBlockD(wq, aq, aq_w)
        self.mid_block_2 = ResnetBlockD(mid_ch, cfg.temb_ch, wq, aq)

        self.up = [
            UpLevel(cfg, i, wq, aq, aq_w,
                    split_channels=self._split_channels(i),
                    aq_upsample_override=(
                        # second-to-last registered act quantizer → 8 bit
                        aq.with_bits(8)
                        if i == cfg.num_resolutions - 1 else None))
            for i in range(cfg.num_resolutions)]

        self.norm_out = GNorm()
        self.conv_out = QConv(cfg.out_ch, (3, 3), wq=wq.with_bits(8), aq=aq,
                              disable_act_quant=True)

    # ------------------------------------------------------------------
    def _split_channels(self, level: int) -> Tuple[int, ...]:
        """Channels of h entering each up-block concat (h.size(1) in
        diffusion.py:356-357), used as the static split point."""
        if not self.qc.split:
            return tuple(0 for _ in range(self.cfg.num_res_blocks + 1))
        cfg = self.cfg
        block_out = cfg.ch * cfg.ch_mult[level]
        if level == cfg.num_resolutions - 1:
            first = cfg.ch * cfg.ch_mult[-1]        # straight out of mid
        else:
            first = cfg.ch * cfg.ch_mult[level + 1]  # after upsample above
        chans = [first] + [block_out] * cfg.num_res_blocks
        return tuple(chans)

    def __call__(self, x: jnp.ndarray, t: jnp.ndarray,
                 mode: QuantMode = QuantMode()) -> jnp.ndarray:
        cfg = self.cfg
        # carrier dtype follows the input (bf16 on the deployment path); the
        # f32 sinusoid is cast before the first dense so the temb chain does
        # not promote every residual add back to f32
        temb = timestep_embedding(t, cfg.ch).astype(x.dtype)
        temb = self.temb_dense_0(temb, mode)
        temb = self.temb_dense_1(swish(temb), mode)
        if mode.capture:
            self.sow("taps", "temb", temb, reduce_fn=_sow_reduce)

        hs = [self.conv_in(x, mode)]
        h = hs[-1]
        for lvl in self.down:
            h, outs = lvl(h, temb, mode)
            hs.extend(outs)

        h = self.mid_block_1(h, temb, mode)
        h = self.mid_attn_1(h, mode)
        h = self.mid_block_2(h, temb, mode)

        for i in reversed(range(cfg.num_resolutions)):
            h = self.up[i](h, hs, temb, mode)

        if int8_serving(mode) and use_fused_gn(*h.shape[1:]):
            h = gn_norm(h, *self.norm_out(h, params_only=True), swish=True,
                        interpret=pallas_interpret())
        else:
            h = swish(self.norm_out(h))
        return self.conv_out(h, mode)


# --------------------------------------------------------------------------
# reconstruction plan
# --------------------------------------------------------------------------

def ddpm_recon_plan(cfg: DDPMConfig, qc: QuantConfig):
    """Ordered reconstruction targets for the DDPM UNet.

    Mirrors the walk of ``recon_block_Qmodel``
    (/root/reference/qdiff/recon_block_Qmodel.py:18-94): temb denses and
    conv_in as layers, down levels (blocks/attns interleaved in forward order
    — the reference's down.1 special case — with each downsample conv as a
    layer), mid, up levels in reversed index order, conv_out last.  The order
    matters because each target's asymmetric input capture runs under the
    quantizer state left by earlier targets.
    """
    from ..calib.recon import ReconTarget

    wq, aq = qc.wq, qc.aq
    aq_w = qc.aq_softmax(always_zero=False)
    ch, temb_ch = cfg.ch, cfg.temb_ch
    in_ch_mult = (1,) + cfg.ch_mult
    res_taps = lambda in_ch, out_ch: tuple(
        (t,) for t in (["conv1", "temb_proj", "conv2"] +
                       (["nin_shortcut"] if in_ch != out_ch else [])))
    attn_taps = (("q",), ("k",), ("v",), ("proj_out",))

    plan = [
        ReconTarget("temb_dense_0", ("temb_dense_0",),
                    QDense(temb_ch, wq=wq.with_bits(8), aq=aq), "layer"),
        ReconTarget("temb_dense_1", ("temb_dense_1",),
                    QDense(temb_ch, wq=wq, aq=aq), "layer"),
        ReconTarget("conv_in", ("conv_in",),
                    QConv(ch, (3, 3), wq=wq, aq=aq), "layer"),
    ]

    def resblock(path, name, in_ch, out_ch, split=0):
        return ReconTarget(name, path,
                           ResnetBlockD(out_ch, temb_ch, wq, aq, split=split),
                           "block", has_temb=True,
                           inner_taps=res_taps(in_ch, out_ch))

    def attnblock(path, name):
        return ReconTarget(name, path, AttnBlockD(wq, aq, aq_w), "block",
                           inner_taps=attn_taps)

    # down path
    for i in range(cfg.num_resolutions):
        curr_res = cfg.resolution // (2 ** i)
        has_attn = curr_res in cfg.attn_resolutions
        block_in = ch * in_ch_mult[i]
        block_out = ch * cfg.ch_mult[i]
        for j in range(cfg.num_res_blocks):
            plan.append(resblock(("%s_%d" % ("down", i), "block_%d" % j),
                                 f"down_{i}.block_{j}", block_in, block_out))
            block_in = block_out
            if has_attn:
                plan.append(attnblock((f"down_{i}", f"attn_{j}"),
                                      f"down_{i}.attn_{j}"))
        if i != cfg.num_resolutions - 1:
            plan.append(ReconTarget(
                f"down_{i}.downsample.conv",
                (f"down_{i}", "downsample", "conv"),
                QConv(block_out, (3, 3), strides=(2, 2),
                      padding=((0, 1), (0, 1)), wq=wq, aq=aq), "layer"))

    # mid
    mid_ch = ch * cfg.ch_mult[-1]
    plan.append(resblock(("mid_block_1",), "mid_block_1", mid_ch, mid_ch))
    plan.append(attnblock(("mid_attn_1",), "mid_attn_1"))
    plan.append(resblock(("mid_block_2",), "mid_block_2", mid_ch, mid_ch))

    # up path, reversed level order (recon_up_model, recon_block_Qmodel.py:60-89)
    dummy = DDPMUNet(cfg=cfg, qc=qc)
    for i in reversed(range(cfg.num_resolutions)):
        curr_res = cfg.resolution // (2 ** i)
        has_attn = curr_res in cfg.attn_resolutions
        block_out = ch * cfg.ch_mult[i]
        splits = dummy._split_channels(i)
        for j in range(cfg.num_res_blocks + 1):
            skip_in = (ch * in_ch_mult[i] if j == cfg.num_res_blocks
                       else ch * cfg.ch_mult[i])
            in_ch = splits[j] if splits[j] else (
                (mid_ch if i == cfg.num_resolutions - 1
                 else ch * cfg.ch_mult[i + 1]) if j == 0 else block_out)
            in_ch = in_ch + skip_in
            plan.append(resblock((f"up_{i}", f"block_{j}"),
                                 f"up_{i}.block_{j}", in_ch, block_out,
                                 split=splits[j]))
            if has_attn:
                plan.append(attnblock((f"up_{i}", f"attn_{j}"),
                                      f"up_{i}.attn_{j}"))
        if i != 0:
            plan.append(ReconTarget(
                f"up_{i}.upsample.conv", (f"up_{i}", "upsample", "conv"),
                QConv(block_out, (3, 3), wq=wq,
                      aq=(aq.with_bits(8) if i == cfg.num_resolutions - 1
                          else aq)), "layer"))

    plan.append(ReconTarget("conv_out", ("conv_out",),
                            QConv(cfg.out_ch, (3, 3), wq=wq.with_bits(8),
                                  aq=aq, disable_act_quant=True), "layer"))
    return plan


def ddpm_layer_plan(cfg: DDPMConfig, qc: QuantConfig):
    """Layer-mode reconstruction plan (the reference's ablation path,
    qdiff/recon_layer_Qmodel.py:13-120): every QuantModule reconstructs
    individually; attention blocks get q/k/v layer recon, a whole-block
    act-delta-only recon (qdiff/attn_layer_recon.py:13-133), then proj_out."""
    from ..calib.recon import ReconTarget

    block_plan = ddpm_recon_plan(cfg, qc)
    wq, aq = qc.wq, qc.aq
    plan = []
    last_ch = cfg.ch
    for t in block_plan:
        if t.kind == "layer":
            plan.append(t)
        elif isinstance(t.module, AttnBlockD):
            # attention always follows a res block at the same width
            for leaf in ("q", "k", "v"):
                plan.append(ReconTarget(
                    f"{t.name}.{leaf}", t.path + (leaf,),
                    QConv(last_ch, (1, 1), padding="VALID", wq=wq, aq=aq),
                    "layer"))
            plan.append(ReconTarget(f"{t.name}.acts", t.path, t.module,
                                    "block", act_only=True,
                                    inner_taps=t.inner_taps))
            plan.append(ReconTarget(
                f"{t.name}.proj_out", t.path + ("proj_out",),
                QConv(last_ch, (1, 1), padding="VALID", wq=wq, aq=aq),
                "layer"))
        else:  # ResnetBlockD → per-layer in registration order
            out_ch = t.module.out_ch
            last_ch = out_ch
            for tap in t.inner_taps:
                leaf = tap[0]
                mod = (QDense(out_ch, wq=wq, aq=aq) if leaf == "temb_proj"
                       else QConv(out_ch,
                                  (1, 1) if leaf == "nin_shortcut"
                                  else (3, 3),
                                  padding=("VALID" if leaf == "nin_shortcut"
                                           else "SAME"),
                                  wq=wq, aq=aq,
                                  split=(t.module.split
                                         if leaf == "nin_shortcut" else 0)))
                plan.append(ReconTarget(f"{t.name}.{leaf}", t.path + (leaf,),
                                        mod, "layer"))
    return plan
