"""LatentDiffusion wrapper: quantized UNet + FP first stage + conditioner.

Functional equivalent of /root/reference/ldm/models/diffusion/ddpm.py
(LatentDiffusion:428 — apply_model:895, decode_first_stage:710,
get_learned_conditioning:555) and DiffusionWrapper's cond-key dispatch
(:1419-1445).  Instead of a LightningModule owning mutable submodules, this
is a plain driver holding flax module definitions; all state rides explicit
variable dicts.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .ldm_unet import LDMUNet, LDMUNetConfig
from .vae import FirstStage, VAEConfig, vae_state_dict_to_params
from .encoders import ClassEmbedder, class_embedder_state_dict_to_params
from .convert import ldm_unet_state_dict_to_params, \
    split_latent_diffusion_state_dict
from ..quant.config import QuantConfig, QuantMode, FP


@dataclasses.dataclass
class LatentDiffusionConfig:
    unet: LDMUNetConfig
    vae: VAEConfig
    timesteps: int = 1000
    linear_start: float = 0.0015
    linear_end: float = 0.0195
    scale_factor: float = 1.0
    cond: str = "none"            # 'none' | 'class' | 'text'
    n_classes: int = 1001         # cin256-v2.yaml: 1001 (1000 = uncond token)
    class_embed_dim: int = 512


class LatentDiffusion:
    """Holds module definitions + conversion/loading helpers."""

    def __init__(self, cfg: LatentDiffusionConfig, qc: QuantConfig):
        self.cfg = cfg
        self.qc = qc
        self.unet = LDMUNet(cfg=cfg.unet, qc=qc)
        self.first_stage = FirstStage(cfg=cfg.vae)
        self.class_embedder = (ClassEmbedder(cfg.class_embed_dim,
                                             cfg.n_classes)
                               if cfg.cond == "class" else None)

    # ------------------------------------------------------------------
    def init_variables(self, key: jax.Array) -> Dict[str, Any]:
        cfg = self.cfg
        res = cfg.unet.image_size
        x = jnp.zeros((1, res, res, cfg.unet.in_channels))
        t = jnp.zeros((1,))
        ctx = (jnp.zeros((1, 1, cfg.unet.context_dim))
               if cfg.unet.context_dim else None)
        variables = {"unet": self.unet.init(key, x, t, context=ctx, mode=FP)}
        lat = res // 1  # latent resolution == unet input resolution
        z = jnp.zeros((1, lat, lat, cfg.vae.embed_dim))
        variables["first_stage"] = self.first_stage.init(key, z)
        if self.class_embedder is not None:
            variables["cond_stage"] = self.class_embedder.init(
                key, jnp.zeros((1,), jnp.int32))
        return variables

    def load_checkpoint(self, variables: Dict[str, Any],
                        path: str) -> Dict[str, Any]:
        """Graft a reference LatentDiffusion checkpoint
        (scripts/sample_diffusion_ldm_bedroom.py:169-186 load path)."""
        import torch
        state = torch.load(path, map_location="cpu", weights_only=True)
        if isinstance(state, dict) and "state_dict" in state:
            state = state["state_dict"]
        unet_sd, first_sd, cond_sd = split_latent_diffusion_state_dict(state)
        if "scale_factor" in state:      # scale_by_std models (church)
            self.cfg.scale_factor = float(np.asarray(state["scale_factor"]))
        variables = dict(variables)
        variables["unet"] = {
            **variables["unet"],
            "params": jax.tree.map(
                jnp.asarray, ldm_unet_state_dict_to_params(unet_sd))}
        if first_sd:
            variables["first_stage"] = {
                "params": jax.tree.map(
                    jnp.asarray, vae_state_dict_to_params(first_sd))}
        if cond_sd and self.class_embedder is not None:
            variables["cond_stage"] = {
                "params": jax.tree.map(
                    jnp.asarray,
                    class_embedder_state_dict_to_params(cond_sd))}
        return variables

    # ------------------------------------------------------------------
    def apply_model(self, unet_variables, x, t, context=None,
                    mode: QuantMode = FP, **apply_kw):
        """ddpm.py:895 apply_model → DiffusionWrapper crossattn dispatch."""
        return self.unet.apply(unet_variables, x, t, context=context,
                               mode=mode, **apply_kw)

    def get_learned_conditioning(self, cond_variables, labels=None):
        """ddpm.py:555 for the class conditioner."""
        if self.class_embedder is None:
            return None
        return self.class_embedder.apply(cond_variables,
                                         jnp.asarray(labels, jnp.int32))

    def decode_first_stage(self, first_stage_variables, z,
                           force_not_quantize: bool = False):
        """ddpm.py:710: z / scale_factor → first-stage decode (VQ passes the
        codebook quantizer unless forced)."""
        z = z / self.cfg.scale_factor
        return self.first_stage.apply(first_stage_variables, z,
                                      force_not_quantize,
                                      method=self.first_stage.decode)


# --------------------------------------------------------------------------
# task model configs (models/ldm/*/config.yaml,
# configs/latent-diffusion/cin256-v2.yaml, configs/stable-diffusion/
# v1-inference.yaml)
# --------------------------------------------------------------------------

def bedroom_config(qc_split: bool = True) -> LatentDiffusionConfig:
    """LDM-4 LSUN-Bedroom (models/ldm/lsun_beds256/config.yaml)."""
    return LatentDiffusionConfig(
        unet=LDMUNetConfig(image_size=64, in_channels=3, model_channels=224,
                           out_channels=3, num_res_blocks=2,
                           attention_resolutions=(8, 4, 2),
                           channel_mult=(1, 2, 3, 4), num_head_channels=32),
        vae=VAEConfig(ch=128, out_ch=3, ch_mult=(1, 2, 4), num_res_blocks=2,
                      attn_resolutions=(), in_channels=3, resolution=256,
                      z_channels=3, double_z=False, embed_dim=3,
                      n_embed=8192),
        linear_start=0.0015, linear_end=0.0195)


def church_config() -> LatentDiffusionConfig:
    """LDM-8 LSUN-Church (models/ldm/lsun_churches256/config.yaml)."""
    return LatentDiffusionConfig(
        unet=LDMUNetConfig(image_size=32, in_channels=4, model_channels=192,
                           out_channels=4, num_res_blocks=2,
                           attention_resolutions=(1, 2, 4, 8),
                           channel_mult=(1, 2, 2, 4, 4), num_heads=8,
                           use_scale_shift_norm=True, resblock_updown=True),
        vae=VAEConfig(ch=128, out_ch=3, ch_mult=(1, 2, 4, 4),
                      num_res_blocks=2, attn_resolutions=(), in_channels=3,
                      resolution=256, z_channels=4, double_z=True,
                      embed_dim=4, n_embed=None),
        # scale_by_std=True: the actual scale_factor is a checkpoint buffer
        # (ddpm.py registers it on first batch); default 1.0 until loaded
        linear_start=0.0015, linear_end=0.0155, scale_factor=1.0)


def imagenet_config() -> LatentDiffusionConfig:
    """LDM-4 class-conditional ImageNet (configs/latent-diffusion/
    cin256-v2.yaml — the config for_imagenet.sh loads; NOT
    models/ldm/cin256/config.yaml, whose f8 VAE pairs with a 32²·4ch
    latent).  First stage is VQ-f4: ch_mult (1,2,4), embed_dim 3,
    n_embed 8192 (cin256-v2.yaml:40-58)."""
    return LatentDiffusionConfig(
        unet=LDMUNetConfig(image_size=64, in_channels=3, model_channels=192,
                           out_channels=3, num_res_blocks=2,
                           attention_resolutions=(8, 4, 2),
                           channel_mult=(1, 2, 3, 5), num_heads=1,
                           use_spatial_transformer=True, transformer_depth=1,
                           context_dim=512),
        vae=VAEConfig(ch=128, out_ch=3, ch_mult=(1, 2, 4),
                      num_res_blocks=2, attn_resolutions=(),
                      in_channels=3, resolution=256, z_channels=3,
                      double_z=False, embed_dim=3, n_embed=8192),
        linear_start=0.0015, linear_end=0.0195, cond="class",
        n_classes=1001, class_embed_dim=512)


def sd_v1_config() -> LatentDiffusionConfig:
    """Stable Diffusion v1.4 (configs/stable-diffusion/v1-inference.yaml)."""
    return LatentDiffusionConfig(
        unet=LDMUNetConfig(image_size=64, in_channels=4, model_channels=320,
                           out_channels=4, num_res_blocks=2,
                           attention_resolutions=(4, 2, 1),
                           channel_mult=(1, 2, 4, 4), num_heads=8,
                           use_spatial_transformer=True, transformer_depth=1,
                           context_dim=768, legacy=False),
        vae=VAEConfig(ch=128, out_ch=3, ch_mult=(1, 2, 4, 4),
                      num_res_blocks=2, attn_resolutions=(), in_channels=3,
                      resolution=256, z_channels=4, double_z=True,
                      embed_dim=4, n_embed=None),
        linear_start=0.00085, linear_end=0.0120, scale_factor=0.18215,
        cond="text")
