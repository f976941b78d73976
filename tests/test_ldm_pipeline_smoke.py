"""End-to-end LDM pipeline smoke on tiny models: unconditional (bedroom-like)
and CFG-conditional (imagenet-like) paths, including VAE decode."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp

from eda_dm_tpu.models.latent_diffusion import (LatentDiffusion,
                                                LatentDiffusionConfig)
from eda_dm_tpu.models.ldm_unet import LDMUNetConfig, ldm_recon_plan
from eda_dm_tpu.models.vae import VAEConfig
from eda_dm_tpu.pipelines.latent import LDMPipeline, LDMTaskConfig
from eda_dm_tpu.quant import WAQ


def tiny_model_cfg(cond: str = "none", transformer: bool = False):
    return LatentDiffusionConfig(
        unet=LDMUNetConfig(
            image_size=8, in_channels=3, model_channels=32, out_channels=3,
            num_res_blocks=1, attention_resolutions=(2,),
            channel_mult=(1, 2),
            num_head_channels=16,
            use_spatial_transformer=transformer,
            context_dim=16 if transformer else None),
        vae=VAEConfig(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                      attn_resolutions=(), in_channels=3, resolution=16,
                      z_channels=3, double_z=False, embed_dim=3,
                      n_embed=64),
        timesteps=50, cond=cond, n_classes=11, class_embed_dim=16)


def test_unconditional_ldm_end_to_end():
    cfg = LDMTaskConfig(task="bedroom", custom_steps=4, eta=1.0,
                        calib_num_samples=6, batch_samples=6, iters=2,
                        recon_batch_size=4, n_samples=2, batch_size=2,
                        lamda=1.0)
    pipe = LDMPipeline(cfg, model_cfg=tiny_model_cfg())
    variables = pipe.init_variables()
    sel = pipe.tdac_calibration(variables, jax.random.PRNGKey(0))
    assert sel.calib_x.shape == (6, 8, 8, 3)
    cali = pipe.build_cali_data(sel)
    variables = pipe.calibrate(variables, cali)

    plan = ldm_recon_plan(pipe.mc.unet, pipe.qc)
    # run a representative prefix: time_embed, conv, first res block
    from eda_dm_tpu.calib.recon import ReconArgs, reconstruct
    variables = {**variables, "unet": reconstruct(
        pipe.ld.unet, variables["unet"], cali, plan[:4],
        ReconArgs(iters=2, batch_size=4), jax.random.PRNGKey(1))}

    imgs = pipe.sample_batch(variables, jax.random.PRNGKey(2), batch_size=2)
    assert imgs.shape == (2, 16, 16, 3)        # VAE upsamples 8 → 16
    assert np.isfinite(np.asarray(imgs)).all()
    assert 0.0 <= float(imgs.min()) and float(imgs.max()) <= 1.0


def test_conditional_cfg_ldm_end_to_end():
    cfg = LDMTaskConfig(task="imagenet", custom_steps=3, eta=0.0, scale=3.0,
                        calib_num_samples=4, batch_samples=4, iters=2,
                        recon_batch_size=4, n_samples=2, batch_size=2,
                        lamda=0.5)
    pipe = LDMPipeline(cfg, model_cfg=tiny_model_cfg(cond="class",
                                                     transformer=True))
    variables = pipe.init_variables()
    labels = jnp.asarray([1, 2, 3, 4])
    ctx = pipe.ld.get_learned_conditioning(variables["cond_stage"], labels)
    unc = pipe.ld.get_learned_conditioning(variables["cond_stage"],
                                           jnp.full((4,), 10))
    assert ctx.shape == (4, 1, 16)
    sel = pipe.tdac_calibration(variables, jax.random.PRNGKey(0),
                                context=ctx, uncond=unc)
    cali = pipe.build_cali_data(sel, context=ctx, uncond=unc)
    # CFG assembly doubles rows: [uncond; cond] (qdiff_control/data_utils)
    assert cali[0].shape[0] == 8 and cali[2].shape[0] == 8
    np.testing.assert_allclose(np.asarray(cali[2][:4]), np.asarray(unc))

    variables = pipe.calibrate(variables, cali)

    plan = ldm_recon_plan(pipe.mc.unet, pipe.qc)
    tx_targets = [t for t in plan if t.has_ctx]
    assert tx_targets, "transformer blocks must be recon targets"
    from eda_dm_tpu.calib.recon import ReconArgs, reconstruct
    # one res block + one transformer block exercises both target shapes
    subset = [plan[2], tx_targets[0]]
    variables = {**variables, "unet": reconstruct(
        pipe.ld.unet, variables["unet"], cali, subset,
        ReconArgs(iters=2, batch_size=4), jax.random.PRNGKey(1))}

    imgs = pipe.sample_batch(variables, jax.random.PRNGKey(2), batch_size=2,
                             context=ctx[:2], uncond=unc[:2])
    assert imgs.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(imgs)).all()
