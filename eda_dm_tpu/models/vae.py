"""First-stage VAE (VQ-f4/f8, KL-f8) — FP32 flax rebuild.

Reference: /root/reference/ldm/modules/diffusionmodules/model.py
(Encoder:371, Decoder:465, ResnetBlock/AttnBlock) and
/root/reference/ldm/models/autoencoder.py (AutoencoderKL:285,
VQModelInterface:264).  The first stage is never quantized
(QuantModel wraps only the diffusion UNet — SURVEY §2.4), so these are
plain flax modules, NHWC.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Dict, Mapping, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """ddconfig from the model yamls (e.g. models/ldm/lsun_beds256/
    config.yaml:36-50)."""
    ch: int = 128
    out_ch: int = 3
    ch_mult: Tuple[int, ...] = (1, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = ()
    in_channels: int = 3
    resolution: int = 256
    z_channels: int = 3
    double_z: bool = False
    # autoencoder level
    embed_dim: int = 3
    n_embed: Optional[int] = None     # set → VQ model, else KL


def _swish(x):
    return jax.nn.silu(x)


def _gn(name=None):
    return nn.GroupNorm(num_groups=32, epsilon=1e-6, name=name)


class VAEResnetBlock(nn.Module):
    """model.py ResnetBlock with temb_channels=0."""
    out_ch: int

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = nn.Conv(self.out_ch, (3, 3), name="conv1")(_swish(
            _gn(name="norm1")(x)))
        h = nn.Conv(self.out_ch, (3, 3), name="conv2")(_swish(
            _gn(name="norm2")(h)))
        if in_ch != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), name="nin_shortcut")(x)
        return x + h


class VAEAttnBlock(nn.Module):
    """model.py AttnBlock (single-head spatial self-attention)."""

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        h = _gn(name="norm")(x)
        q = nn.Conv(c, (1, 1), name="q")(h).reshape(b, hh * ww, c)
        k = nn.Conv(c, (1, 1), name="k")(h).reshape(b, hh * ww, c)
        v = nn.Conv(c, (1, 1), name="v")(h).reshape(b, hh * ww, c)
        w = jnp.einsum("nic,njc->nij", q, k,
                       preferred_element_type=jnp.float32) * (c ** -0.5)
        w = jax.nn.softmax(w, axis=-1)
        h = jnp.einsum("nij,njc->nic", w, v,
                       preferred_element_type=jnp.float32)
        h = nn.Conv(c, (1, 1), name="proj_out")(h.reshape(b, hh, ww, c))
        return x + h


class VAEEncoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        curr_res = cfg.resolution
        h = nn.Conv(cfg.ch, (3, 3), name="conv_in")(x)
        for i in range(len(cfg.ch_mult)):
            out_ch = cfg.ch * cfg.ch_mult[i]
            for j in range(cfg.num_res_blocks):
                h = VAEResnetBlock(out_ch, name=f"down_{i}_block_{j}")(h)
                if curr_res in cfg.attn_resolutions:
                    h = VAEAttnBlock(name=f"down_{i}_attn_{j}")(h)
            if i != len(cfg.ch_mult) - 1:
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(h.shape[-1], (3, 3), strides=(2, 2),
                            padding="VALID", name=f"down_{i}_downsample")(h)
                curr_res //= 2
        h = VAEResnetBlock(h.shape[-1], name="mid_block_1")(h)
        h = VAEAttnBlock(name="mid_attn_1")(h)
        h = VAEResnetBlock(h.shape[-1], name="mid_block_2")(h)
        h = _swish(_gn(name="norm_out")(h))
        z_ch = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        return nn.Conv(z_ch, (3, 3), name="conv_out")(h)


class VAEDecoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        n_lv = len(cfg.ch_mult)
        block_in = cfg.ch * cfg.ch_mult[-1]
        curr_res = cfg.resolution // 2 ** (n_lv - 1)
        h = nn.Conv(block_in, (3, 3), name="conv_in")(z)
        h = VAEResnetBlock(block_in, name="mid_block_1")(h)
        h = VAEAttnBlock(name="mid_attn_1")(h)
        h = VAEResnetBlock(block_in, name="mid_block_2")(h)
        for i in reversed(range(n_lv)):
            out_ch = cfg.ch * cfg.ch_mult[i]
            for j in range(cfg.num_res_blocks + 1):
                h = VAEResnetBlock(out_ch, name=f"up_{i}_block_{j}")(h)
                if curr_res in cfg.attn_resolutions:
                    h = VAEAttnBlock(name=f"up_{i}_attn_{j}")(h)
            if i != 0:
                h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
                h = nn.Conv(h.shape[-1], (3, 3), name=f"up_{i}_upsample")(h)
                curr_res *= 2
        h = _swish(_gn(name="norm_out")(h))
        return nn.Conv(cfg.out_ch, (3, 3), name="conv_out")(h)


class FirstStage(nn.Module):
    """AutoencoderKL / VQModelInterface decode+encode surface.

    VQ decode passes z through the nearest-codebook quantizer unless
    force_not_quantize (autoencoder.py:274-282); KL decode is
    post_quant_conv → decoder (autoencoder.py:332-335).
    """

    cfg: VAEConfig

    def setup(self):
        cfg = self.cfg
        self.encoder = VAEEncoder(cfg)
        self.decoder = VAEDecoder(cfg)
        quant_in = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        quant_out = 2 * cfg.embed_dim if cfg.double_z else cfg.embed_dim
        self.quant_conv = nn.Conv(quant_out, (1, 1))
        self.post_quant_conv = nn.Conv(cfg.z_channels, (1, 1))
        if cfg.n_embed is not None:
            self.codebook = self.param(
                "codebook", nn.initializers.uniform(1.0),
                (cfg.n_embed, cfg.embed_dim))

    def quantize(self, z):
        """Nearest-codebook lookup (taming VectorQuantizer2 inference path).

        The (pixels, n_embed) distance matrix is never materialized whole:
        at production decode shapes it is HBM-scale (cin256: batch 50 ×
        64² latents × 16384 codes = 13.4 GB f32 — OOM'd the round-4
        queue), so rows are processed in lax.map chunks (≤0.5 GB each,
        sequential, same argmin)."""
        flat = z.reshape(-1, self.cfg.embed_dim)
        cb2 = jnp.sum(self.codebook ** 2, axis=1)[None, :]

        def nearest(fc):
            d = (jnp.sum(fc ** 2, axis=1, keepdims=True)
                 - 2.0 * fc @ self.codebook.T + cb2)
            return jnp.argmin(d, axis=1)

        n = flat.shape[0]
        chunk = min(n, 8192)
        if n % chunk:
            flat = jnp.pad(flat, ((0, -n % chunk), (0, 0)))
        idx = jax.lax.map(nearest,
                          flat.reshape(-1, chunk, self.cfg.embed_dim))
        idx = idx.reshape(-1)[:n]
        zq = self.codebook[idx].reshape(z.shape)
        # straight-through (inference: value identical to zq)
        return z + jax.lax.stop_gradient(zq - z)

    def encode(self, x):
        h = self.quant_conv(self.encoder(x))
        return h          # VQ: pre-quant latents; KL: concat(mean, logvar)

    def decode(self, z, force_not_quantize: bool = False):
        if self.cfg.n_embed is not None and not force_not_quantize:
            z = self.quantize(z)
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, z, force_not_quantize: bool = False):
        return self.decode(z, force_not_quantize)


# --------------------------------------------------------------------------
# converter
# --------------------------------------------------------------------------

_VAE_RULES = [
    (re.compile(r"^(encoder|decoder)\.mid\.(\w+)\."),
     lambda m: f"{m.group(1)}.mid_{m.group(2)}."),
    (re.compile(r"^(encoder|decoder)\.(down|up)\.(\d+)\.(block|attn)\.(\d+)\."),
     lambda m: f"{m.group(1)}.{m.group(2)}_{m.group(3)}_{m.group(4)}_{m.group(5)}."),
    (re.compile(r"^(encoder|decoder)\.(down|up)\.(\d+)\.(downsample|upsample)\.conv\."),
     lambda m: f"{m.group(1)}.{m.group(2)}_{m.group(3)}_{m.group(4)}."),
    (re.compile(r"^quantize\.embedding\.weight$"), lambda m: "codebook"),
]


def vae_state_dict_to_params(state_dict: Mapping) -> Dict:
    """Convert an AutoencoderKL/VQModel state dict to FirstStage params."""
    from .convert import _insert
    params: Dict = {}
    for key, val in state_dict.items():
        if key.startswith("loss."):
            continue
        arr = np.asarray(getattr(val, "numpy", lambda: val)()
                         if hasattr(val, "numpy") else val, dtype=np.float32)
        tkey = key
        for pat, repl in _VAE_RULES:
            tkey = pat.sub(repl, tkey)
        if tkey == "codebook":
            _insert(params, ["codebook"], arr)
            continue
        parts = tkey.split(".")
        leaf = parts[-1]
        if leaf == "weight":
            if arr.ndim == 4:
                leaf, arr = "kernel", np.transpose(arr, (2, 3, 1, 0))
            else:
                leaf = "scale"
        _insert(params, parts[:-1] + [leaf], arr)
    return params
