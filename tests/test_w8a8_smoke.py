"""BASELINE config 1: W8A8 DDIM CIFAR calibration + sampling, CPU-runnable
(tiny shapes).  No reconstruction — scale init only, like the reference's
W8A8 recipe path."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax

from eda_dm_tpu.models.ddpm_unet import DDPMConfig
from eda_dm_tpu.pipelines.cifar import CifarPipeline, CifarConfig
from eda_dm_tpu.quant import FP, WAQ


def test_w8a8_calib_and_sample():
    cfg = CifarConfig(
        arch=DDPMConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                        attn_resolutions=(8,), resolution=16),
        image_size=16, weight_bit=8, act_bit=8, timesteps=4,
        skip_type="uniform", num_diffusion_timesteps=80,
        calib_num_samples=8, batch_samples=8, recon=False,
        max_images=4, sample_batch_size=4)
    pipe = CifarPipeline(cfg)
    variables = pipe.init_variables()
    cx, ct, _ = pipe.tdac_calibration(variables, jax.random.PRNGKey(0))
    variables = pipe.calibrate(variables, (cx, ct))

    # W8A8 should track FP closely even without reconstruction
    fp = pipe.model.apply(variables, cx[:4], ct[:4], FP)
    q = pipe.model.apply(variables, cx[:4], ct[:4], WAQ)
    rel = float(np.abs(np.asarray(q - fp)).mean()
                / (np.abs(np.asarray(fp)).mean() + 1e-9))
    assert rel < 0.15, rel

    imgs = pipe.sample_batch(variables, jax.random.PRNGKey(1), batch_size=2)
    assert np.isfinite(np.asarray(imgs)).all()
