"""Analytic serving roofline (round-4 verdict next #4).

Computes, for one denoise step of each task's UNet at its production
batch, the per-step HBM traffic (weight bytes + activation bytes +
epilogue materializations) and MXU MACs, then the bandwidth-limited and
compute-limited step times on TPU v5e, and compares with the measured
ms/step from PERF.md.  This quantifies how far the serving path sits
from speed-of-light and prices the two candidate levers the round-4
verdict named: int8 codes as the inter-op carrier, and int4-packed
weight reads.

Traffic model (assumptions, deliberately simple and stated):

* XLA fuses every elementwise chain into its producer/consumer, so HBM
  traffic is counted only at fusion boundaries: each conv/matmul reads
  its input once and writes its output once; each GN(+swish)+quantize
  producer pass reads the previous op's output once and writes the
  quantize codes once.  This matches the measured post-zero-code-padding
  behavior (PERF.md session 6: the whole pre-conv elementwise chain is a
  single producer pass writing s8 codes).
* GroupNorm needs mean/var before it can scale, so a GN chain is
  genuinely read-twice in the worst case; XLA's column-reduce fusion
  usually keeps the stats pass in-register per tile.  We count ONE read
  (optimistic bound) — the difference is reported as `gn_reread` so the
  pessimistic bound is total + gn_reread.
* Attention: `flash` keeps S×S logits in VMEM (HBM traffic = q,k,v in +
  out); `mat` materializes logits and softmax weights once each
  (write+read).  We report the min as the best-kernel bound — the
  shape-keyed serving policy picks per shape.
* Residual adds fuse into the consuming conv's epilogue: one extra read
  of the skip tensor.
* Weights are read once per step (no reuse across batch elements beyond
  a single kernel invocation — true at these batch sizes).

Dtypes per serve mode
  fp32   carrier f32(4)  weights f32(4)  matmul @ ~0.5x bf16 peak
  fpbf16 carrier bf16(2) weights bf16(2) matmul @ bf16 peak
  int8   carrier bf16(2) codes s8(1)     weights s8(1)  matmul @ int8 peak
  int8+s8carrier: inter-op carrier is the s8 codes themselves (lever 1)
  int8+w4: int4-packed weight reads (lever 2)

Peaks (TPU v5e / "TPU v5 lite" datasheet figures): HBM 819 GB/s,
bf16 197 TFLOP/s, int8 394 TOP/s.

Reference analogue: the README deployment tables (README.md:92-124)
claim quantized-vs-FP ratios; this file states the hardware ceiling those
ratios are judged against on TPU.
"""

import argparse
import json
import sys
from dataclasses import dataclass

sys.path.insert(0, "/root/repo")

from eda_dm_tpu.models.ldm_unet import build_layout  # noqa: E402
from eda_dm_tpu.models.latent_diffusion import (  # noqa: E402
    bedroom_config, church_config, imagenet_config, sd_v1_config)

HBM_BPS = 819e9
BF16_FLOPS = 197e12
# Datasheet int8 is 394 TOP/s, but the int8 MXU mode measures ~1.3x the
# bf16 rate on this chip via XLA-generated s8xs8->s32 convs (bench.py
# docstring; probes/mosaic_int8).  Use the measured rate so MAC bounds
# are achievable, and report the datasheet number as context only.
INT8_OPS = 1.3 * BF16_FLOPS
INT8_OPS_DATASHEET = 394e12
FP32_FLOPS = 0.5 * BF16_FLOPS  # approx: f32 emulated via bf16 passes


@dataclass
class Acc:
    """Byte/MAC accumulator for one UNet forward."""
    cb: float     # carrier bytes/elt (inter-op activation dtype)
    code: float   # conv/matmul input bytes/elt (quantize codes; =cb if FP)
    wb: float     # weight bytes/elt
    quantized: bool
    w_bytes: float = 0.0
    a_bytes: float = 0.0
    macs: float = 0.0
    gn_reread: float = 0.0
    attn_flash: float = 0.0   # activation bytes if flash kernels everywhere
    attn_mat: float = 0.0     # ... if materializing kernels everywhere

    def fuse(self, n):
        """Producer pass: GN(+swish)(+quantize): read carrier, write codes."""
        self.a_bytes += n * (self.cb + self.code)
        self.gn_reread += n * self.cb

    def conv(self, b, s, cin, cout, k=3, s_in=None):
        """s = output tokens (MACs + output write); s_in = input tokens
        read (differs for stride-2 down / nearest-2x up convs)."""
        self.w_bytes += k * k * cin * cout * self.wb
        self.a_bytes += b * ((s_in or s) * cin * self.code
                             + s * cout * self.cb)
        self.macs += b * s * k * k * cin * cout

    def dense_w(self, cin, cout, b_rows=0):
        """Weight-dominated dense (temb MLP, embeddings)."""
        self.w_bytes += cin * cout * self.wb
        self.macs += max(b_rows, 1) * cin * cout

    def residual(self, b, s, ch):
        self.a_bytes += b * s * ch * self.cb

    def attention(self, b, s, ch, heads, s_kv=None):
        """q,k,v,out projections counted by caller; this is the two
        einsums. flash: no S^2 HBM traffic. mat: logits + weights
        materialized once each (write + read)."""
        s_kv = s_kv or s
        lb = 1.0 if self.quantized else self.cb  # softmax codes are s8
        logits = b * heads * s * s_kv
        self.macs += 2 * b * s * s_kv * ch
        self.attn_flash += 0.0
        self.attn_mat += logits * (2 * self.cb + 2 * lb)


def resblock(a: Acc, b, s, cin, cout, temb, scale_shift=False, split=False):
    a.fuse(b * s * cin)
    a.conv(b, s, cin, cout, 3)
    a.dense_w(temb, cout * (2 if scale_shift else 1), b)
    a.fuse(b * s * cout)
    a.conv(b, s, cout, cout, 3)
    if cin != cout or split:
        a.fuse(b * s * cin)          # skip conv quantizes its own input
        a.conv(b, s, cin, cout, 1)
    a.residual(b, s, cout)


def attnblock(a: Acc, b, s, ch, heads):
    a.fuse(b * s * ch)
    a.conv(b, s, ch, 3 * ch, 1)      # qkv
    a.attention(b, s, ch, heads)
    a.fuse(b * s * ch)               # quantize attn output for proj
    a.conv(b, s, ch, ch, 1)
    a.residual(b, s, ch)


def txblock(a: Acc, b, s, ch, heads, ctx_tokens, ctx_dim):
    a.fuse(b * s * ch)               # norm + proj_in
    a.conv(b, s, ch, ch, 1)
    # attn1 (self): q,k,v,out
    a.fuse(b * s * ch)
    for _ in range(3):
        a.conv(b, s, ch, ch, 1)
    a.attention(b, s, ch, heads)
    a.conv(b, s, ch, ch, 1)
    a.residual(b, s, ch)
    # attn2 (cross)
    a.fuse(b * s * ch)
    a.conv(b, s, ch, ch, 1)                       # q
    a.w_bytes += 2 * ctx_dim * ch * a.wb          # k,v from context
    a.macs += 2 * b * ctx_tokens * ctx_dim * ch
    a.a_bytes += b * ctx_tokens * ctx_dim * a.cb
    a.attention(b, s, ch, heads, s_kv=ctx_tokens)
    a.conv(b, s, ch, ch, 1)
    a.residual(b, s, ch)
    # ff GEGLU: ch -> 4ch*2, gate, 4ch -> ch
    a.fuse(b * s * ch)
    a.conv(b, s, ch, 8 * ch, 1)
    a.fuse(b * s * 4 * ch)
    a.conv(b, s, 4 * ch, ch, 1)
    a.residual(b, s, ch)
    # proj_out
    a.fuse(b * s * ch)
    a.conv(b, s, ch, ch, 1)
    a.residual(b, s, ch)


def ldm_unet(a: Acc, cfg, b):
    lay = build_layout(cfg, split_shortcut=True)
    temb = cfg.time_embed_dim
    a.dense_w(cfg.model_channels, temb, b)
    a.dense_w(temb, temb, b)
    res = cfg.image_size

    def run_item(it, s):
        if it.kind == "conv":
            a.a_bytes += b * s * it.in_ch * a.cb
            a.conv(b, s, it.in_ch, it.out_ch, 3)
        elif it.kind == "res":
            if it.updown == "down":
                resblock(a, b, s // 4, it.in_ch, it.out_ch, temb,
                         cfg.use_scale_shift_norm)
                return s // 4
            if it.updown == "up":
                resblock(a, b, s * 4, it.in_ch, it.out_ch, temb,
                         cfg.use_scale_shift_norm)
                return s * 4
            resblock(a, b, s, it.in_ch, it.out_ch, temb,
                     cfg.use_scale_shift_norm, split=it.split > 0)
        elif it.kind == "attn":
            attnblock(a, b, s, it.out_ch, it.heads)
        elif it.kind == "tx":
            ctx_tok = 77 if cfg.context_dim and cfg.context_dim >= 768 else 1
            txblock(a, b, s, it.out_ch, it.heads, ctx_tok,
                    cfg.context_dim or it.out_ch)
        elif it.kind == "down":
            a.fuse(b * s * it.in_ch)
            a.conv(b, s // 4, it.in_ch, it.out_ch, 3, s_in=s)
            return s // 4
        elif it.kind == "up":
            a.fuse(b * s * it.in_ch)
            a.conv(b, s * 4, it.in_ch, it.out_ch, 3, s_in=s * 4)
            return s * 4
        return s

    s = res * res
    for it in lay.input_blocks:
        s = run_item(it, s)
    for it in lay.middle_block:
        s = run_item(it, s)
    for it in lay.output_blocks:
        # skip concat read: the concatenated skip tensor is re-read by
        # the first res of each output block (counted inside resblock's
        # input read via in_ch = ch + ich)
        s = run_item(it, s)
    # out head
    a.fuse(b * s * cfg.model_channels)
    a.conv(b, s, cfg.model_channels, cfg.out_channels, 3)


def ddpm_unet(a: Acc, b):
    """CIFAR DDPM UNet (configs/cifar10.yml): ch=128, mult (1,2,2,2),
    2 res blocks, attn at 16x16, res 32."""
    ch, mults, nres, res = 128, (1, 2, 2, 2), 2, 32
    temb = 4 * ch
    a.dense_w(ch, temb, b)
    a.dense_w(temb, temb, b)
    s = res * res
    a.a_bytes += b * s * 3 * a.cb
    a.conv(b, s, 3, ch, 3)
    skips = [(ch, s)]
    cur = ch
    cur_res = res
    for lvl, m in enumerate(mults):
        for _ in range(nres):
            resblock(a, b, s, cur, m * ch, temb)
            cur = m * ch
            if cur_res == 16:
                attnblock(a, b, s, cur, 1)
            skips.append((cur, s))
        if lvl != len(mults) - 1:
            a.fuse(b * s * cur)
            a.conv(b, s // 4, cur, cur, 3, s_in=s)
            s //= 4
            cur_res //= 2
            skips.append((cur, s))
    resblock(a, b, s, cur, cur, temb)
    attnblock(a, b, s, cur, 1)
    resblock(a, b, s, cur, cur, temb)
    for lvl, m in list(enumerate(mults))[::-1]:
        for _ in range(nres + 1):
            sk, s_sk = skips.pop()
            resblock(a, b, s, cur + sk, m * ch, temb)
            cur = m * ch
            if cur_res == 16:
                attnblock(a, b, s, cur, 1)
        if lvl:
            a.fuse(b * s * cur)
            s *= 4
            cur_res *= 2
            a.conv(b, s, cur, cur, 3)
    a.fuse(b * s * cur)
    a.conv(b, s, cur, 3, 3)


MODES = {
    # name: (carrier, code, weight, mac_rate)
    "fp32": (4, 4, 4, FP32_FLOPS),
    "fpbf16": (2, 2, 2, BF16_FLOPS),
    "int8": (2, 1, 1, INT8_OPS),
    "int8+s8carrier": (1, 1, 1, INT8_OPS),
    "int8+w4": (2, 1, 0.5, INT8_OPS),
}

TASKS = {
    # task: (builder, production batch, CFG double-batch?)
    "bench-cifar": (None, 500, False),
    "bedroom": (bedroom_config, 50, False),
    "church": (church_config, 50, False),
    "imagenet": (imagenet_config, 50, True),
    "coco": (sd_v1_config, 4, True),
}


def account(task, mode):
    cb, code, wb, rate = MODES[mode]
    builder, b, cfg_double = TASKS[task]
    beff = b * (2 if cfg_double else 1)
    a = Acc(cb=cb, code=code, wb=wb, quantized=mode.startswith("int8"))
    if builder is None:
        ddpm_unet(a, beff)
    else:
        ldm_unet(a, builder().unet, beff)
    attn = min(a.attn_flash, a.attn_mat)
    total = a.w_bytes + a.a_bytes + attn
    t_bw = total / HBM_BPS
    t_mac = 2 * a.macs / rate
    return {
        "task": task, "mode": mode, "batch_eff": beff,
        "weight_MB": round(a.w_bytes / 1e6, 1),
        "act_MB": round(a.a_bytes / 1e6, 1),
        "attn_best_MB": round(attn / 1e6, 1),
        "attn_mat_MB": round(a.attn_mat / 1e6, 1),
        "gn_reread_MB": round(a.gn_reread / 1e6, 1),
        "total_MB": round(total / 1e6, 1),
        "tflops": round(2 * a.macs / 1e12, 2),
        "t_bw_ms": round(t_bw * 1e3, 2),
        "t_mac_ms": round(t_mac * 1e3, 2),
        "t_roofline_ms": round(max(t_bw, t_mac) * 1e3, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="all")
    ap.add_argument("--mode", default="all")
    ap.add_argument("--measured", type=float, default=None,
                    help="measured ms/step to compare (prints achieved "
                         "fraction of the roofline bound)")
    args = ap.parse_args()
    tasks = TASKS if args.task == "all" else [args.task]
    modes = MODES if args.mode == "all" else [args.mode]
    for t in tasks:
        for m in modes:
            r = account(t, m)
            if args.measured:
                r["measured_ms"] = args.measured
                r["roofline_frac"] = round(r["t_roofline_ms"]
                                           / args.measured, 3)
            print(json.dumps(r))


if __name__ == "__main__":
    main()
