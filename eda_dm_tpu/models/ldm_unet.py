"""LDM / Stable-Diffusion UNet (openai architecture) — quantization-aware
flax rebuild.

Re-implements /root/reference/ldm/modules/diffusionmodules/openaimodel.py
(UNetModel:447, ResBlock:162, AttentionBlock:283, QKVAttentionLegacy:372)
and /root/reference/ldm/modules/attention.py (CrossAttention:152,
BasicTransformerBlock:222, SpatialTransformer:244), with the quantization
insertion points of the reference's quant wrappers built in:

* QK / SMV matmul quantizers inside AttentionBlock
  (qdiff/quant_block.py:119-165): q·scale and k·scale at act_bit, softmax
  output at sm_abit (always_zero, asymmetric), v at act_bit;
* cross-attention q/k/v/softmax quantizers (quant_block.py:204-296):
  q, k, v unscaled at act_bit, softmax output at sm_abit (always_zero,
  inherited symmetry);
* split-shortcut dual quantizers on output-block skip convs
  (openaimodel.py:772-778, ResBlock split routing :243-278);
* first/last-8-bit and output-quant policies (qdiff/quant_model.py:77-95)
  applied by registration order computed from the same layout the model is
  built from.

Layout NHWC / sequence-last-channel; weights HWIO / IO.  Inference-only
(dropout omitted; the reference quantizes in eval mode).

Supported configs (models/ldm/*/config.yaml, configs/stable-diffusion/
v1-inference.yaml): LDM-4 bedroom, LDM-8 church (use_scale_shift_norm +
resblock_updown), LDM-4 cin256 (class-conditional spatial transformer),
SD v1.4 (text cross-attention).
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
from ..ops.pallas_attention import (int8_fused_attention_heads,
                                    int8_flash_attention_heads)
from ..ops.pallas_gn import gn_norm
from ..nn.layers import (QConv, QDense, ActQuantizer, GNorm, group_norm,
                         int8_conv_serving, swish, timestep_embedding,
                         _sow_reduce)


@dataclasses.dataclass(frozen=True)
class LDMUNetConfig:
    """UNetModel constructor args (openaimodel.py:477-503)."""
    image_size: int = 64
    in_channels: int = 3
    model_channels: int = 224
    out_channels: int = 3
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (8, 4, 2)  # in downsample rates
    channel_mult: Tuple[int, ...] = (1, 2, 3, 4)
    conv_resample: bool = True
    num_classes: Optional[int] = None
    num_heads: int = -1
    num_head_channels: int = -1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    use_spatial_transformer: bool = False
    transformer_depth: int = 1
    context_dim: Optional[int] = None
    legacy: bool = True

    @property
    def time_embed_dim(self) -> int:
        return self.model_channels * 4

    def head_split(self, ch: int) -> Tuple[int, int]:
        """(num_heads, dim_head) at a given channel width
        (openaimodel.py:578-590)."""
        if self.num_head_channels == -1:
            heads, dim = self.num_heads, ch // self.num_heads
        else:
            heads, dim = ch // self.num_head_channels, self.num_head_channels
        if self.legacy:
            dim = ch // heads if self.use_spatial_transformer \
                else self.num_head_channels
        return heads, dim


# --------------------------------------------------------------------------
# layout: a declarative description of every block, shared by the model,
# the converter and the recon planner
# --------------------------------------------------------------------------

@dataclasses.dataclass
class LayerItem:
    key: str              # flax dict key, e.g. "3_0"
    kind: str             # 'conv' | 'res' | 'attn' | 'tx' | 'down' | 'up'
    in_ch: int = 0
    out_ch: int = 0
    heads: int = 0
    dim_head: int = 0
    split: int = 0        # split point for output-block skip convs
    updown: str = ""      # '', 'up', 'down' for resblock_updown ResBlocks


@dataclasses.dataclass
class UNetLayout:
    input_blocks: List[LayerItem]
    middle_block: List[LayerItem]
    output_blocks: List[LayerItem]


def build_layout(cfg: LDMUNetConfig, split_shortcut: bool) -> UNetLayout:
    """Replays UNetModel.__init__'s channel bookkeeping
    (openaimodel.py:552-720)."""
    mc = cfg.model_channels
    inputs: List[LayerItem] = [
        LayerItem("0_0", "conv", cfg.in_channels, mc)]
    input_chans = [mc]
    ch, ds = mc, 1
    idx = 1                      # TimestepEmbedSequential index
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            inputs.append(LayerItem(f"{idx}_0", "res", ch, mult * mc))
            ch = mult * mc
            if ds in cfg.attention_resolutions:
                heads, dim = cfg.head_split(ch)
                inputs.append(LayerItem(
                    f"{idx}_1",
                    "tx" if cfg.use_spatial_transformer else "attn",
                    ch, ch, heads, dim))
            input_chans.append(ch)
            idx += 1
        if level != len(cfg.channel_mult) - 1:
            if cfg.resblock_updown:
                inputs.append(LayerItem(f"{idx}_0", "res", ch, ch,
                                        updown="down"))
            else:
                inputs.append(LayerItem(f"{idx}_0", "down", ch, ch))
            input_chans.append(ch)
            idx += 1
            ds *= 2

    heads, dim = cfg.head_split(ch)
    middle = [LayerItem("0", "res", ch, ch),
              LayerItem("1", "tx" if cfg.use_spatial_transformer else "attn",
                        ch, ch, heads, dim),
              LayerItem("2", "res", ch, ch)]

    outputs: List[LayerItem] = []
    out_idx = 0
    for level, mult in list(enumerate(cfg.channel_mult))[::-1]:
        for i in range(cfg.num_res_blocks + 1):
            ich = input_chans.pop()
            split = ch if split_shortcut else 0
            outputs.append(LayerItem(f"{out_idx}_0", "res", ch + ich,
                                     mc * mult, split=split))
            ch = mc * mult
            j = 1
            if ds in cfg.attention_resolutions:
                heads, dim = cfg.head_split(ch)
                outputs.append(LayerItem(
                    f"{out_idx}_{j}",
                    "tx" if cfg.use_spatial_transformer else "attn",
                    ch, ch, heads, dim))
                j += 1
            if level and i == cfg.num_res_blocks:
                if cfg.resblock_updown:
                    outputs.append(LayerItem(f"{out_idx}_{j}", "res", ch, ch,
                                             updown="up"))
                else:
                    outputs.append(LayerItem(f"{out_idx}_{j}", "up", ch, ch))
                ds //= 2
            out_idx += 1
    return UNetLayout(inputs, middle, outputs)


def _group_input_blocks(items: List[LayerItem]) -> Dict[int, List[LayerItem]]:
    grouped: Dict[int, List[LayerItem]] = {}
    for it in items:
        grouped.setdefault(int(it.key.split("_")[0]), []).append(it)
    return grouped


# --------------------------------------------------------------------------
# blocks
# --------------------------------------------------------------------------

class ResBlockL(nn.Module):
    """LDM ResBlock (openaimodel.py:162-278 / QuantResBlock
    quant_block.py:46-116), incl. scale-shift-norm and resblock-updown."""

    out_ch: int
    wq: QuantizerSpec
    aq: QuantizerSpec
    use_scale_shift_norm: bool = False
    updown: str = ""                  # '', 'up', 'down'
    split: int = 0
    use_conv_skip: bool = False
    # override for the registration-last act quantizer (skip conv) — the
    # "second-to-last act quantizer → 8-bit" policy lands here when this
    # ResBlock is the last item of the last output block
    # (quant_model.py:87-88; see LDMUNet.setup)
    aq_last: Optional[QuantizerSpec] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray,
                 mode: QuantMode) -> jnp.ndarray:
        if mode.capture:
            self.sow("taps", "block_in", x, reduce_fn=_sow_reduce)
        in_ch = x.shape[-1]
        # int8 serving: producer GN(+swish) fuses into the conv's input
        # quantize+pad Pallas pass (ops/pallas_gn.py; no-op change for
        # up/down blocks where a resample sits between GN and conv)
        int8_path = int8_conv_serving(mode, self.wq, self.aq)
        gn_in = group_norm(name="in_layers_0")
        if (int8_path and self.updown == ""
                and use_fused_gn(*x.shape[1:])):
            h = QConv(self.out_ch, (3, 3), wq=self.wq, aq=self.aq,
                      name="in_layers_2")(
                          x, mode, pre_gn=(*gn_in(x, params_only=True), True))
        else:
            h = swish(gn_in(x))
            if self.updown == "up":
                h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
            elif self.updown == "down":
                h = nn.avg_pool(h, (2, 2), strides=(2, 2))
            h = QConv(self.out_ch, (3, 3), wq=self.wq, aq=self.aq,
                      name="in_layers_2")(h, mode)
        if self.updown == "up":
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        elif self.updown == "down":
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        emb_dim = 2 * self.out_ch if self.use_scale_shift_norm else self.out_ch
        emb_out = QDense(emb_dim, wq=self.wq, aq=self.aq,
                         name="emb_layers_1")(swish(emb), mode)
        gn_out = group_norm(name="out_layers_0")
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out[:, None, None, :], 2, axis=-1)
            h = gn_out(h) * (1 + scale) + shift
            h = swish(h)
            h = QConv(self.out_ch, (3, 3), wq=self.wq, aq=self.aq,
                      name="out_layers_3")(h, mode)
        else:
            h = h + emb_out[:, None, None, :]
            if int8_path and use_fused_gn(*h.shape[1:]):
                h = QConv(self.out_ch, (3, 3), wq=self.wq, aq=self.aq,
                          name="out_layers_3")(
                              h, mode,
                              pre_gn=(*gn_out(h, params_only=True), True))
            else:
                h = QConv(self.out_ch, (3, 3), wq=self.wq, aq=self.aq,
                          name="out_layers_3")(swish(gn_out(h)), mode)
        if in_ch != self.out_ch:
            aq_skip = self.aq_last or self.aq
            if self.use_conv_skip:
                x = QConv(self.out_ch, (3, 3), wq=self.wq, aq=aq_skip,
                          name="skip_connection")(x, mode)
            else:
                x = QConv(self.out_ch, (1, 1), padding="VALID", wq=self.wq,
                          aq=aq_skip, split=self.split,
                          name="skip_connection")(x, mode)
        out = x + h
        if mode.capture:
            self.sow("taps", "block_out", out, reduce_fn=_sow_reduce)
        return out

    @staticmethod
    def inner_taps(in_ch: int, out_ch: int) -> Tuple[Tuple[str, ...], ...]:
        taps = [("in_layers_2",), ("emb_layers_1",), ("out_layers_3",)]
        if in_ch != out_ch:
            taps.append(("skip_connection",))
        return tuple(taps)


class AttentionBlockL(nn.Module):
    """LDM AttentionBlock with legacy QKV attention
    (openaimodel.py:283-343,372-406) and the QK/SMV quantizer placement
    (quant_block.py:119-165): q·scale and k·scale quantized before the
    logits matmul; softmax output (sm_abit, always_zero) and v quantized
    before the value matmul."""

    num_heads: int
    wq: QuantizerSpec
    aq: QuantizerSpec
    aq_w: QuantizerSpec
    # registration-last act quantizer (proj_out) override — see ResBlockL
    aq_last: Optional[QuantizerSpec] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, mode: QuantMode) -> jnp.ndarray:
        if mode.capture:
            self.sow("taps", "block_in", x, reduce_fn=_sow_reduce)
        b, hh, ww, c = x.shape
        t_len = hh * ww
        gn = group_norm(name="norm")
        if int8_serving(mode) and use_fused_gn(hh, ww, c):
            # one-HBM-pass GN (GN is per-(sample, group) — spatial layout
            # is irrelevant, so normalize the 4-D view and flatten after)
            xs = gn_norm(x, *gn(x, params_only=True),
                         interpret=pallas_interpret()).reshape(b, t_len, c)
        else:
            xs = gn(x.reshape(b, t_len, c))
        qkv = QDense(3 * c, wq=self.wq, aq=self.aq,
                     name="qkv")(xs, mode)
        ch = c // self.num_heads
        # torch channel layout: heads × (q|k|v) × ch (QKVAttentionLegacy:384)
        qkv = qkv.reshape(b, t_len, self.num_heads, 3, ch)
        q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
        scale = 1.0 / jnp.sqrt(jnp.sqrt(float(ch)))
        q = q * scale
        k = k * scale
        # unconditional (no-op outside quant/calib modes): keeps one
        # variable treedef across QuantModes (see ddpm_unet.AttnBlockD note)
        if int8_attention_serving(mode) and self.aq.n_levels <= 256 \
                and self.aq_w.n_levels <= 256:
            # serving: int8×int8→int32 MXU matmuls with exact recentering
            # epilogues (ops/int8_einsum.py)
            dq, zq = ActQuantizer(self.aq, name="act_quantizer_q")(
                q, mode, params_only=True)
            dk, zk = ActQuantizer(self.aq, name="act_quantizer_k")(
                k, mode, params_only=True)
            dw, zw = ActQuantizer(self.aq_w, name="act_quantizer_w")(
                jnp.zeros((), x.dtype), mode, params_only=True)
            dv, zv = ActQuantizer(self.aq, name="act_quantizer_v")(
                v, mode, params_only=True)
            impl = attention_impl(b, self.num_heads, t_len, t_len, ch)
            if impl in ("fused", "flash"):
                # the (b,h,t,s) logits are never materialized in HBM
                # (ops/pallas_attention.py, heads layout): whole-in-VMEM
                # kernel for small S, two-pass tiled kernel otherwise —
                # shape-keyed choice in ops/serving_policy.py
                Qc, cq = quantize_act_int8(q, dq, zq, self.aq.n_levels)
                Kc, ck = quantize_act_int8(k, dk, zk, self.aq.n_levels)
                V, cv = quantize_act_int8(v, dv, zv, self.aq.n_levels)
                attn_fn = (int8_fused_attention_heads
                           if impl == "fused"
                           else int8_flash_attention_heads)
                a = attn_fn(
                    Qc, cq, dq, Kc, ck, dk, V, cv, dv, 1.0,
                    dw, zw, self.aq_w.n_levels,
                    interpret=pallas_interpret())
            else:
                w = int8_act_einsum("bthc,bshc->bhts",
                                    q, (dq, zq, self.aq.n_levels),
                                    k, (dk, zk, self.aq.n_levels))
                if use_fused_softmax():
                    # fused softmax→codes (ops/pallas_softmax.py): single
                    # pass over the (b, h, t, s) logits
                    W, cw = softmax_int8_codes(w, dw, zw,
                                               self.aq_w.n_levels,
                                               interpret=pallas_interpret())
                else:
                    W, cw = quantize_act_int8(jax.nn.softmax(w, axis=-1),
                                              dw, zw, self.aq_w.n_levels)
                V, cv = quantize_act_int8(v, dv, zv, self.aq.n_levels)
                a = int8_code_einsum("bhts,bshc->bthc",
                                     W, cw, dw, V, cv, dv)
        else:
            q = ActQuantizer(self.aq, name="act_quantizer_q")(q, mode)
            k = ActQuantizer(self.aq, name="act_quantizer_k")(k, mode)
            w = jnp.einsum("bthc,bshc->bhts", q, k,
                           preferred_element_type=jnp.float32)
            # f32 MXU accumulation + f32 softmax; materialize attention
            # tensors in the carrier dtype (bf16 on the deployment path)
            w = jax.nn.softmax(w, axis=-1).astype(x.dtype)
            w = ActQuantizer(self.aq_w, name="act_quantizer_w")(w, mode)
            v = ActQuantizer(self.aq, name="act_quantizer_v")(v, mode)
            a = jnp.einsum("bhts,bshc->bthc", w, v,
                           preferred_element_type=jnp.float32)
        a = a.astype(x.dtype).reshape(b, t_len, c)
        h = QDense(c, wq=self.wq, aq=self.aq_last or self.aq,
                   name="proj_out")(a, mode)
        out = (xs + h).reshape(b, hh, ww, c)
        if mode.capture:
            self.sow("taps", "block_out", out, reduce_fn=_sow_reduce)
        return out

    @staticmethod
    def inner_taps(*_) -> Tuple[Tuple[str, ...], ...]:
        return (("qkv",), ("proj_out",))


class CrossAttentionL(nn.Module):
    """CrossAttention with quantizers (attention.py:152-221 +
    cross_attn_forward quant points, quant_block.py:204-235): q/k/v
    quantized unscaled after the head split; softmax output at sm_abit."""

    heads: int
    dim_head: int
    out_dim: int
    wq: QuantizerSpec
    aq: QuantizerSpec
    aq_w: QuantizerSpec

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: Optional[jnp.ndarray],
                 mode: QuantMode) -> jnp.ndarray:
        inner = self.heads * self.dim_head
        ctx = x if context is None else context
        q = QDense(inner, wq=self.wq, aq=self.aq, use_bias=False,
                   name="to_q")(x, mode)
        k = QDense(inner, wq=self.wq, aq=self.aq, use_bias=False,
                   name="to_k")(ctx, mode)
        v = QDense(inner, wq=self.wq, aq=self.aq, use_bias=False,
                   name="to_v")(ctx, mode)
        b, n, _ = q.shape
        m = k.shape[1]
        q = q.reshape(b, n, self.heads, self.dim_head)
        k = k.reshape(b, m, self.heads, self.dim_head)
        v = v.reshape(b, m, self.heads, self.dim_head)
        # unconditional (no-op outside quant/calib modes): one treedef
        if int8_attention_serving(mode) and self.aq.n_levels <= 256 \
                and self.aq_w.n_levels <= 256:
            # serving: int8×int8→int32 MXU matmuls with exact recentering
            # epilogues (ops/int8_einsum.py)
            dq, zq = ActQuantizer(self.aq, name="act_quantizer_q")(
                q, mode, params_only=True)
            dk, zk = ActQuantizer(self.aq, name="act_quantizer_k")(
                k, mode, params_only=True)
            dw, zw = ActQuantizer(self.aq_w, name="act_quantizer_w")(
                jnp.zeros((), x.dtype), mode, params_only=True)
            dv, zv = ActQuantizer(self.aq, name="act_quantizer_v")(
                v, mode, params_only=True)
            impl = attention_impl(b, self.heads, n, m, self.dim_head)
            if impl in ("fused", "flash"):
                # SD self-attention (64² = 4096 tokens): the (b,h,i,j)
                # logits never touch HBM — whole-in-VMEM kernel when one
                # head's working set fits (n == m only), two-pass tiled
                # kernel otherwise (ops/serving_policy.py)
                Qc, cq = quantize_act_int8(q, dq, zq, self.aq.n_levels)
                Kc, ck = quantize_act_int8(k, dk, zk, self.aq.n_levels)
                V, cv = quantize_act_int8(v, dv, zv, self.aq.n_levels)
                attn_fn = (int8_fused_attention_heads
                           if impl == "fused"
                           else int8_flash_attention_heads)
                out = attn_fn(
                    Qc, cq, dq, Kc, ck, dk, V, cv, dv,
                    self.dim_head ** -0.5, dw, zw, self.aq_w.n_levels,
                    interpret=pallas_interpret())
            else:
                sim = int8_act_einsum("bihd,bjhd->bhij",
                                      q, (dq, zq, self.aq.n_levels),
                                      k, (dk, zk, self.aq.n_levels)) \
                    * (self.dim_head ** -0.5)
                if use_fused_softmax():
                    # fused softmax→codes (ops/pallas_softmax.py); handles
                    # the 77-token CLIP context via in-kernel masking
                    W, cw = softmax_int8_codes(sim, dw, zw,
                                               self.aq_w.n_levels,
                                               interpret=pallas_interpret())
                else:
                    W, cw = quantize_act_int8(jax.nn.softmax(sim, axis=-1),
                                              dw, zw, self.aq_w.n_levels)
                V, cv = quantize_act_int8(v, dv, zv, self.aq.n_levels)
                out = int8_code_einsum("bhij,bjhd->bihd",
                                       W, cw, dw, V, cv, dv)
        else:
            q = ActQuantizer(self.aq, name="act_quantizer_q")(q, mode)
            k = ActQuantizer(self.aq, name="act_quantizer_k")(k, mode)
            sim = jnp.einsum("bihd,bjhd->bhij", q, k,
                             preferred_element_type=jnp.float32) \
                * (self.dim_head ** -0.5)
            # f32 MXU accumulation + f32 softmax; carrier-dtype
            # materialization
            attn = jax.nn.softmax(sim, axis=-1).astype(x.dtype)
            attn = ActQuantizer(self.aq_w, name="act_quantizer_w")(attn, mode)
            v = ActQuantizer(self.aq, name="act_quantizer_v")(v, mode)
            out = jnp.einsum("bhij,bjhd->bihd", attn, v,
                             preferred_element_type=jnp.float32)
        out = out.astype(x.dtype).reshape(b, n, inner)
        return QDense(self.out_dim, wq=self.wq, aq=self.aq,
                      name="to_out_0")(out, mode)


class FeedForwardL(nn.Module):
    """GEGLU feed-forward (attention.py:36-63, gated)."""

    dim: int
    wq: QuantizerSpec
    aq: QuantizerSpec
    mult: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, mode: QuantMode) -> jnp.ndarray:
        inner = self.dim * self.mult
        h = QDense(inner * 2, wq=self.wq, aq=self.aq,
                   name="net_0_proj")(x, mode)
        a, gate = jnp.split(h, 2, axis=-1)
        h = a * jax.nn.gelu(gate)
        return QDense(self.dim, wq=self.wq, aq=self.aq, name="net_2")(h, mode)


class BasicTransformerBlockL(nn.Module):
    """attn1 (self) → attn2 (cross) → ff with pre-LayerNorms
    (attention.py:222-242 / QuantBasicTransformerBlock
    quant_block.py:238-296)."""

    heads: int
    dim_head: int
    dim: int
    wq: QuantizerSpec
    aq: QuantizerSpec
    aq_w: QuantizerSpec

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: Optional[jnp.ndarray],
                 mode: QuantMode) -> jnp.ndarray:
        if mode.capture:
            self.sow("taps", "block_in", x, reduce_fn=_sow_reduce)
            if context is not None:
                self.sow("taps", "block_ctx", context, reduce_fn=_sow_reduce)
        x = CrossAttentionL(self.heads, self.dim_head, self.dim, self.wq,
                            self.aq, self.aq_w, name="attn1")(
            nn.LayerNorm(name="norm1")(x), None, mode) + x
        x = CrossAttentionL(self.heads, self.dim_head, self.dim, self.wq,
                            self.aq, self.aq_w, name="attn2")(
            nn.LayerNorm(name="norm2")(x), context, mode) + x
        x = FeedForwardL(self.dim, self.wq, self.aq, name="ff")(
            nn.LayerNorm(name="norm3")(x), mode) + x
        if mode.capture:
            self.sow("taps", "block_out", x, reduce_fn=_sow_reduce)
        return x

    @staticmethod
    def inner_taps(*_) -> Tuple[Tuple[str, ...], ...]:
        # reference hook order over modules(): attn1.to_q/k/v, attn1.to_out.0,
        # ff.net.0.proj, ff.net.2, attn2.to_q/k/v, attn2.to_out.0
        return (("attn1", "to_q"), ("attn1", "to_k"), ("attn1", "to_v"),
                ("attn1", "to_out_0"), ("ff", "net_0_proj"), ("ff", "net_2"),
                ("attn2", "to_q"), ("attn2", "to_k"), ("attn2", "to_v"),
                ("attn2", "to_out_0"))


class SpatialTransformerL(nn.Module):
    """SpatialTransformer (attention.py:244-286)."""

    heads: int
    dim_head: int
    depth: int
    wq: QuantizerSpec
    aq: QuantizerSpec
    aq_w: QuantizerSpec
    # registration-last act quantizer (proj_out) override — see ResBlockL
    aq_last: Optional[QuantizerSpec] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: Optional[jnp.ndarray],
                 mode: QuantMode) -> jnp.ndarray:
        if mode.capture:
            # TDAC hooks the middle block's second member, which may be a
            # SpatialTransformer (calibration.py:387/520)
            self.sow("taps", "block_in", x, reduce_fn=_sow_reduce)
        b, hh, ww, c = x.shape
        inner = self.heads * self.dim_head
        gn = group_norm(name="norm")
        if (int8_conv_serving(mode, self.wq, self.aq)
                and use_fused_gn(hh, ww, c)):
            # GN (no swish) fuses into proj_in's input quantize pass
            h = QConv(inner, (1, 1), padding="VALID", wq=self.wq, aq=self.aq,
                      name="proj_in")(
                          x, mode, pre_gn=(*gn(x, params_only=True), False))
        else:
            h = QConv(inner, (1, 1), padding="VALID", wq=self.wq, aq=self.aq,
                      name="proj_in")(gn(x), mode)
        h = h.reshape(b, hh * ww, inner)
        for d in range(self.depth):
            h = BasicTransformerBlockL(
                self.heads, self.dim_head, inner, self.wq, self.aq, self.aq_w,
                name=f"transformer_blocks_{d}")(h, context, mode)
        h = h.reshape(b, hh, ww, inner)
        h = QConv(c, (1, 1), padding="VALID", wq=self.wq,
                  aq=self.aq_last or self.aq, name="proj_out")(h, mode)
        return x + h


class DownsampleL(nn.Module):
    wq: QuantizerSpec
    aq: QuantizerSpec

    @nn.compact
    def __call__(self, x: jnp.ndarray, mode: QuantMode) -> jnp.ndarray:
        return QConv(x.shape[-1], (3, 3), strides=(2, 2),
                     padding=((1, 1), (1, 1)), wq=self.wq, aq=self.aq,
                     name="op")(x, mode)


class UpsampleL(nn.Module):
    wq: QuantizerSpec
    aq: QuantizerSpec
    aq_override: Optional[QuantizerSpec] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, mode: QuantMode) -> jnp.ndarray:
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return QConv(x.shape[-1], (3, 3), wq=self.wq,
                     aq=self.aq_override or self.aq, name="conv")(x, mode)


# --------------------------------------------------------------------------
# the UNet
# --------------------------------------------------------------------------

class LDMUNet(nn.Module):
    cfg: LDMUNetConfig = LDMUNetConfig()
    qc: QuantConfig = QuantConfig()

    def setup(self):
        cfg, qc = self.cfg, self.qc
        wq, aq = qc.wq, qc.aq
        # LDM SMV softmax quantizer: always_zero + asymmetric
        # (quant_block.py:151-155); SD cross-attn w: always_zero, inherited
        # symmetry (:262-266)
        aq_w_attn = qc.aq_softmax(always_zero=True, symmetric=False)
        aq_w_tx = qc.aq_softmax(always_zero=True)
        self.layout = build_layout(cfg, qc.split)

        # first/last-8-bit policy by registration order (quant_model.py:77-95):
        # first weight quantizer = time_embed.0; last = out.2
        self.time_embed = {
            "0": QDense(cfg.time_embed_dim, wq=wq.with_bits(8), aq=aq),
            "2": QDense(cfg.time_embed_dim, wq=wq, aq=aq),
        }
        if cfg.num_classes is not None:
            self.label_emb = nn.Embed(cfg.num_classes, cfg.time_embed_dim)

        def make(it: LayerItem, aq_last: Optional[QuantizerSpec] = None):
            if it.kind == "conv":
                return QConv(cfg.model_channels, (3, 3), wq=wq, aq=aq)
            if it.kind == "res":
                return ResBlockL(it.out_ch, wq, aq,
                                 use_scale_shift_norm=cfg.use_scale_shift_norm,
                                 updown=it.updown, split=it.split,
                                 aq_last=aq_last)
            if it.kind == "attn":
                return AttentionBlockL(it.heads, wq, aq, aq_w_attn,
                                       aq_last=aq_last)
            if it.kind == "tx":
                return SpatialTransformerL(it.heads, it.dim_head,
                                           cfg.transformer_depth, wq, aq,
                                           aq_w_tx, aq_last=aq_last)
            if it.kind == "down":
                return DownsampleL(wq, aq)
            if it.kind == "up":
                return UpsampleL(wq, aq, aq_override=aq_last)
            raise ValueError(it.kind)

        # second-to-last registered act quantizer → 8 bit
        # (quant_model.py:87-88): in named_modules order the last act
        # quantizer is out.2's, and the one before it is the
        # registration-last QuantModule of the *last output-block item*
        # (skip conv of a ResBlock / proj_out of attn and transformer
        # blocks).  A no-op at act_bit=8; real at narrower act widths.
        last_key = self.layout.output_blocks[-1].key
        aq_m2 = aq.with_bits(8)
        self.input_blocks = {it.key: make(it) for it in self.layout.input_blocks}
        self.middle_block = {it.key: make(it) for it in self.layout.middle_block}
        self.output_blocks = {
            it.key: make(it, aq_last=aq_m2 if it.key == last_key else None)
            for it in self.layout.output_blocks}
        self.out = {
            "0": GNorm(),
            "2": QConv(cfg.out_channels, (3, 3), wq=wq.with_bits(8), aq=aq,
                       disable_act_quant=True),
        }

    def __call__(self, x: jnp.ndarray, t: jnp.ndarray,
                 context: Optional[jnp.ndarray] = None,
                 y: Optional[jnp.ndarray] = None,
                 mode: QuantMode = QuantMode()) -> jnp.ndarray:
        # unconditional tasks never consume `context`, so a QuantMode passed
        # positionally where DDPMUNet takes its mode (x, t, MODE) would be
        # silently swallowed and the whole net would run FP — fail loudly
        if isinstance(context, QuantMode) or isinstance(y, QuantMode):
            raise TypeError("pass the QuantMode as mode=...; LDMUNet's "
                            "positional order is (x, t, context, y, mode)")
        cfg = self.cfg
        # carrier dtype follows the input (bf16 on the deployment path)
        emb = timestep_embedding(t, cfg.model_channels).astype(x.dtype)
        emb = self.time_embed["0"](emb, mode)
        emb = self.time_embed["2"](swish(emb), mode)
        if cfg.num_classes is not None:
            emb = emb + self.label_emb(y)
        if mode.capture:
            self.sow("taps", "temb", emb, reduce_fn=_sow_reduce)
            if context is not None:
                self.sow("taps", "context", context, reduce_fn=_sow_reduce)

        grouped_in = _group_input_blocks(self.layout.input_blocks)
        grouped_out = _group_input_blocks(self.layout.output_blocks)

        def run(items, mods, h):
            for it in items:
                m = mods[it.key]
                if it.kind in ("conv", "down", "up"):
                    h = m(h, mode)
                elif it.kind == "res":
                    h = m(h, emb, mode)
                elif it.kind == "attn":
                    h = m(h, mode)
                else:  # tx
                    h = m(h, context, mode)
            return h

        hs = []
        h = x
        for i in sorted(grouped_in):
            h = run(grouped_in[i], self.input_blocks, h)
            hs.append(h)
        h = run(self.layout.middle_block, self.middle_block, h)
        for i in sorted(grouped_out):
            h = jnp.concatenate([h, hs.pop()], axis=-1)
            h = run(grouped_out[i], self.output_blocks, h)

        if int8_serving(mode) and use_fused_gn(*h.shape[1:]):
            h = gn_norm(h, *self.out["0"](h, params_only=True), swish=True,
                        interpret=pallas_interpret())
        else:
            h = swish(self.out["0"](h))
        return self.out["2"](h, mode)


# --------------------------------------------------------------------------
# reconstruction plan
# --------------------------------------------------------------------------

def ldm_recon_plan(cfg: LDMUNetConfig, qc: QuantConfig):
    """Ordered reconstruction targets for the LDM/SD UNet.

    Mirrors the walk of recon_block_Qmodel over a wrapped UNetModel
    (qdiff/recon_block_Qmodel.py:26-58 and the qdiff_control variant
    :18-43): time_embed denses as layers; every ResBlock and AttentionBlock
    (after Change_LDM_model_attnblock) as a block; SpatialTransformers
    decomposed into proj_in (layer) + BasicTransformerBlocks (blocks) +
    proj_out (layer); down/upsample convs and out.2 as layers.
    output_blocks iterate in natural (= execution) order.
    """
    from ..calib.recon import ReconTarget

    wq, aq = qc.wq, qc.aq
    aq_w_attn = qc.aq_softmax(always_zero=True, symmetric=False)
    aq_w_tx = qc.aq_softmax(always_zero=True)
    layout = build_layout(cfg, qc.split)

    plan = [
        ReconTarget("time_embed_0", ("time_embed_0",),
                    QDense(cfg.time_embed_dim, wq=wq.with_bits(8), aq=aq),
                    "layer"),
        ReconTarget("time_embed_2", ("time_embed_2",),
                    QDense(cfg.time_embed_dim, wq=wq, aq=aq), "layer"),
    ]

    def add_item(prefix: str, it: LayerItem):
        base = (f"{prefix}_{it.key}",)
        name = f"{prefix}.{it.key}"
        if it.kind == "conv":
            plan.append(ReconTarget(
                name, base, QConv(cfg.model_channels, (3, 3), wq=wq, aq=aq),
                "layer"))
        elif it.kind == "res":
            plan.append(ReconTarget(
                name, base,
                ResBlockL(it.out_ch, wq, aq,
                          use_scale_shift_norm=cfg.use_scale_shift_norm,
                          updown=it.updown, split=it.split),
                "block", has_temb=True,
                inner_taps=ResBlockL.inner_taps(it.in_ch, it.out_ch)))
        elif it.kind == "attn":
            plan.append(ReconTarget(
                name, base, AttentionBlockL(it.heads, wq, aq, aq_w_attn),
                "block", inner_taps=AttentionBlockL.inner_taps()))
        elif it.kind == "tx":
            inner = it.heads * it.dim_head
            plan.append(ReconTarget(
                f"{name}.proj_in", base + ("proj_in",),
                QConv(inner, (1, 1), padding="VALID", wq=wq, aq=aq), "layer"))
            for d in range(cfg.transformer_depth):
                plan.append(ReconTarget(
                    f"{name}.tx_{d}", base + (f"transformer_blocks_{d}",),
                    BasicTransformerBlockL(it.heads, it.dim_head, inner, wq,
                                           aq, aq_w_tx),
                    "block", has_ctx=cfg.context_dim is not None,
                    inner_taps=BasicTransformerBlockL.inner_taps()))
            plan.append(ReconTarget(
                f"{name}.proj_out", base + ("proj_out",),
                QConv(it.out_ch, (1, 1), padding="VALID", wq=wq, aq=aq),
                "layer"))
        elif it.kind == "down":
            plan.append(ReconTarget(
                name, base + ("op",),
                QConv(it.out_ch, (3, 3), strides=(2, 2),
                      padding=((1, 1), (1, 1)), wq=wq, aq=aq), "layer"))
        elif it.kind == "up":
            plan.append(ReconTarget(
                name, base + ("conv",),
                QConv(it.out_ch, (3, 3), wq=wq, aq=aq), "layer"))

    for it in layout.input_blocks:
        add_item("input_blocks", it)
    for it in layout.middle_block:
        add_item("middle_block", it)
    for it in layout.output_blocks:
        add_item("output_blocks", it)

    plan.append(ReconTarget(
        "out_2", ("out_2",),
        QConv(cfg.out_channels, (3, 3), wq=wq.with_bits(8), aq=aq,
              disable_act_quant=True), "layer"))
    return plan


def ldm_layer_plan(cfg: LDMUNetConfig, qc: QuantConfig):
    """Layer-mode reconstruction plan for the LDM/SD UNet — the reference's
    ablation path applied to a wrapped UNetModel
    (qdiff/recon_layer_Qmodel.py:13-120): every QuantModule reconstructs
    individually; attention blocks decompose into their qkv projection, a
    whole-block act-delta-only reconstruction
    (qdiff/attn_layer_recon.py:13-133) and proj_out.  SpatialTransformer
    blocks keep their block targets (the reference's layer walker predates
    the conditional fork and has no transformer decomposition)."""
    from ..calib.recon import ReconTarget

    wq, aq = qc.wq, qc.aq
    layout = build_layout(cfg, qc.split)
    widths = {}                      # block path prefix → channel width
    for prefix, items in (("input_blocks", layout.input_blocks),
                          ("middle_block", layout.middle_block),
                          ("output_blocks", layout.output_blocks)):
        for it in items:
            widths[(f"{prefix}_{it.key}",)] = it
    plan = []
    for t in ldm_recon_plan(cfg, qc):
        if t.kind == "layer" or isinstance(t.module, BasicTransformerBlockL):
            plan.append(t)
        elif isinstance(t.module, AttentionBlockL):
            ch = widths[t.path].out_ch
            plan.append(ReconTarget(
                f"{t.name}.qkv", t.path + ("qkv",),
                QDense(3 * ch, wq=wq, aq=aq), "layer"))
            plan.append(ReconTarget(f"{t.name}.acts", t.path, t.module,
                                    "block", act_only=True,
                                    inner_taps=t.inner_taps))
            plan.append(ReconTarget(
                f"{t.name}.proj_out", t.path + ("proj_out",),
                QDense(ch, wq=wq, aq=aq), "layer"))
        else:                                    # ResBlockL → per-layer
            m = t.module
            emb_dim = (2 * m.out_ch if cfg.use_scale_shift_norm
                       else m.out_ch)
            for tap in t.inner_taps:
                leaf = tap[0]
                if leaf == "emb_layers_1":
                    mod = QDense(emb_dim, wq=wq, aq=aq)
                elif leaf == "skip_connection":
                    mod = QConv(m.out_ch, (1, 1), padding="VALID", wq=wq,
                                aq=aq, split=m.split)
                else:
                    mod = QConv(m.out_ch, (3, 3), wq=wq, aq=aq)
                plan.append(ReconTarget(f"{t.name}.{leaf}", t.path + (leaf,),
                                        mod, "layer"))
    return plan
