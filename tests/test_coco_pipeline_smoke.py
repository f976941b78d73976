"""SD/COCO text-to-image path exercised end-to-end without pretrained
weights (VERDICT round-1 item #8): COCO captions JSON → TinyTextEncoder
(CLIP-shaped random flax module) → CFG calib assembly → PLMS sampling →
transformer-block reconstruction → FID-prep crop."""

import json

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from eda_dm_tpu.data import load_coco_prompts
from eda_dm_tpu.models.encoders import TinyTextEncoder
from eda_dm_tpu.models.latent_diffusion import (LatentDiffusionConfig,
                                                sd_v1_config)
from eda_dm_tpu.models.ldm_unet import LDMUNetConfig, ldm_recon_plan
from eda_dm_tpu.models.vae import VAEConfig
from eda_dm_tpu.pipelines.latent import LDMPipeline, LDMTaskConfig


CTX_DIM = 24


def tiny_sd_cfg() -> LatentDiffusionConfig:
    """sd_v1_config shrunk to CPU size: same topology knobs (text cond,
    spatial transformer, legacy=False, KL VAE, PLMS/CFG path)."""
    base = sd_v1_config()
    return LatentDiffusionConfig(
        unet=LDMUNetConfig(
            image_size=8, in_channels=4, model_channels=32, out_channels=4,
            num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
            num_heads=4, use_spatial_transformer=True, transformer_depth=1,
            context_dim=CTX_DIM, legacy=False),
        vae=VAEConfig(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                      attn_resolutions=(), in_channels=3, resolution=16,
                      z_channels=4, double_z=True, embed_dim=4, n_embed=None),
        timesteps=50, linear_start=base.linear_start,
        linear_end=base.linear_end, scale_factor=base.scale_factor,
        cond="text")


@pytest.mark.slow
def test_coco_sd_pipeline_smoke(tmp_path):
    # captions file → prompts (qdiff_control/coco_prompt.py:12-21 semantics)
    ann = {"annotations": [{"caption": f"a photo of thing {i}"}
                           for i in range(8)]}
    cap = tmp_path / "captions_val2014.json"
    cap.write_text(json.dumps(ann))
    prompts = load_coco_prompts(str(cap), seed=0, limit=4)

    enc = TinyTextEncoder(context_dim=CTX_DIM, max_length=6, vocab=128)
    ctx = enc.encode(prompts)
    unc = enc.encode([""] * len(prompts))
    assert ctx.shape == (4, 6, CTX_DIM)

    cfg = LDMTaskConfig(task="coco", custom_steps=3, eta=0.0, scale=7.5,
                        sampler="plms", calib_num_samples=4, batch_samples=4,
                        iters=2, recon_batch_size=4, n_samples=2,
                        batch_size=2, lamda=50.0)
    pipe = LDMPipeline(cfg, model_cfg=tiny_sd_cfg())
    assert pipe.is_conditional
    variables = pipe.init_variables()

    sel = pipe.tdac_calibration(variables, jax.random.PRNGKey(0),
                                context=ctx, uncond=unc)
    cali = pipe.build_cali_data(sel, context=ctx, uncond=unc)
    assert cali[0].shape[0] == 8                   # CFG-doubled rows
    variables = pipe.calibrate(variables, cali)

    plan = ldm_recon_plan(pipe.mc.unet, pipe.qc)
    tx = [t for t in plan if t.has_ctx]
    assert tx, "SD plan must contain transformer targets"
    from eda_dm_tpu.calib.recon import ReconArgs, reconstruct
    variables = {**variables, "unet": reconstruct(
        pipe.ld.unet, variables["unet"], cali, [tx[0]],
        ReconArgs(iters=2, batch_size=4), jax.random.PRNGKey(1))}

    imgs = pipe.sample_batch(variables, jax.random.PRNGKey(2), batch_size=2,
                             context=ctx[:2], uncond=unc[:2])
    assert imgs.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(imgs)).all()

    # FID reference prep crop (coco_prompt.py:24-46)
    from eda_dm_tpu.eval.metrics import center_resize_image
    ref = (np.asarray(imgs[0]) * 255).astype(np.uint8)
    out = center_resize_image(ref, size=8)
    assert out.shape == (8, 8, 3)
