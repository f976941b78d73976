"""Converter tree-congruence at the FULL production configs.

Round-1 parity tests exercised converters only on tiny configs; these build
each task's *production* architecture (bedroom / church / cin256 / SD v1 /
CIFAR) in the reference PyTorch zoo with random weights, run our checkpoint
converter on its state_dict, and assert exact pytree congruence (paths +
shapes) with the flax model's init — catching layout bugs before real
weights ever arrive.  Spatial size is shrunk (convs are spatially agnostic);
channel widths, depths, attention placement and conditioning are production.

Skipped without /root/reference (the converters themselves are tested on
synthetic dicts elsewhere).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import jax.tree_util as jtu

from eda_dm_tpu.models.ldm_unet import LDMUNet, LDMUNetConfig
from eda_dm_tpu.models.latent_diffusion import (bedroom_config, church_config,
                                                imagenet_config, sd_v1_config)
from eda_dm_tpu.models.convert import (ldm_unet_state_dict_to_params,
                                       ddpm_state_dict_to_params)
from eda_dm_tpu.quant import QuantConfig, FP


def _ref_unet_kwargs(cfg: LDMUNetConfig) -> dict:
    """LDMUNetConfig -> reference UNetModel constructor args
    (openaimodel.py:477-503 / the models/ldm/*/config.yaml unet_config
    params)."""
    kw = dict(
        image_size=cfg.image_size, in_channels=cfg.in_channels,
        model_channels=cfg.model_channels, out_channels=cfg.out_channels,
        num_res_blocks=cfg.num_res_blocks,
        attention_resolutions=list(cfg.attention_resolutions),
        channel_mult=list(cfg.channel_mult), conv_resample=cfg.conv_resample,
        num_heads=cfg.num_heads, num_head_channels=cfg.num_head_channels,
        use_scale_shift_norm=cfg.use_scale_shift_norm,
        resblock_updown=cfg.resblock_updown,
        use_spatial_transformer=cfg.use_spatial_transformer,
        transformer_depth=cfg.transformer_depth, context_dim=cfg.context_dim,
        legacy=cfg.legacy, dropout=0.0)
    if cfg.num_classes is not None:
        kw["num_classes"] = cfg.num_classes
    return kw


def _shape_map(tree) -> dict:
    return {jtu.keystr(k): tuple(v.shape)
            for k, v in jtu.tree_flatten_with_path(tree)[0]}


def _assert_congruent(converted, init_params):
    got, want = _shape_map(converted), _shape_map(init_params)
    missing = set(want) - set(got)
    extra = set(got) - set(want)
    mismatched = {k: (got[k], want[k]) for k in got.keys() & want.keys()
                  if got[k] != want[k]}
    assert not (missing or extra or mismatched), (
        f"missing={sorted(missing)[:8]} extra={sorted(extra)[:8]} "
        f"shape-mismatch={dict(list(mismatched.items())[:8])}")


def _check_ldm(reference_path, cfg: LDMUNetConfig, ctx_dim=None):
    import torch
    from tests.test_parity_ldm import make_ref_unet

    ref = make_ref_unet(reference_path, **_ref_unet_kwargs(cfg))
    converted = ldm_unet_state_dict_to_params(ref.state_dict())
    del ref

    model = LDMUNet(cfg=cfg, qc=QuantConfig())
    x = jnp.zeros((1, 16, 16, cfg.in_channels))
    t = jnp.zeros((1,))
    ctx = jnp.zeros((1, 5, ctx_dim)) if ctx_dim is not None else None
    init = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x, t, context=ctx,
                           mode=FP))
    _assert_congruent(converted, init["params"])


def test_bedroom_production_converter(reference_path):
    _check_ldm(reference_path, bedroom_config().unet)


def test_church_production_converter(reference_path):
    _check_ldm(reference_path, church_config().unet)


def test_cin256_production_converter(reference_path):
    cfg = imagenet_config()
    _check_ldm(reference_path, cfg.unet, ctx_dim=cfg.unet.context_dim)


def test_sd_v1_production_converter(reference_path):
    cfg = sd_v1_config()
    _check_ldm(reference_path, cfg.unet, ctx_dim=cfg.unet.context_dim)


def test_cifar_production_converter(reference_path):
    """Full CIFAR-10 DDPM arch (configs/cifar10.yml: ch=128, mult (1,2,2,2),
    2 res blocks, attn @16)."""
    import torch
    import types
    from ddim.models.diffusion import Model
    from eda_dm_tpu.models.ddpm_unet import DDPMUNet, DDPMConfig

    cfg = DDPMConfig()     # production defaults
    m = types.SimpleNamespace(
        ch=cfg.ch, out_ch=cfg.out_ch, ch_mult=list(cfg.ch_mult),
        num_res_blocks=cfg.num_res_blocks,
        attn_resolutions=list(cfg.attn_resolutions), dropout=0.0,
        in_channels=cfg.in_channels, resamp_with_conv=True,
        var_type="fixedlarge", type="simple")
    torch_cfg = types.SimpleNamespace(
        model=m, data=types.SimpleNamespace(image_size=cfg.resolution),
        diffusion=types.SimpleNamespace(num_diffusion_timesteps=1000))
    torch.manual_seed(0)
    ref = Model(torch_cfg)
    converted = ddpm_state_dict_to_params(ref.state_dict())
    del ref

    model = DDPMUNet(cfg=cfg, qc=QuantConfig())
    x = jnp.zeros((1, cfg.resolution, cfg.resolution, cfg.in_channels))
    t = jnp.zeros((1,))
    init = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x, t, FP))
    _assert_congruent(converted, init["params"])
