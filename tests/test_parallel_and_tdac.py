"""Multi-batch TDAC trajectories and dp-mesh sharded calibration/sampling."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from eda_dm_tpu.pipelines.latent import LDMPipeline, LDMTaskConfig
from tests.test_ldm_pipeline_smoke import tiny_model_cfg


def test_tdac_multi_batch_trajectories():
    """calib_num_samples > batch_samples draws each slice from its own
    trajectory (bedroom generator, calibration.py:156-260)."""
    cfg = LDMTaskConfig(task="bedroom", custom_steps=3, eta=0.0,
                        calib_num_samples=8, batch_samples=4, lamda=1.0)
    pipe = LDMPipeline(cfg, model_cfg=tiny_model_cfg())
    variables = pipe.init_variables()
    sel = pipe.tdac_calibration(variables, jax.random.PRNGKey(0))
    assert sel.calib_x.shape == (8, 8, 8, 3)
    assert sel.t_num.sum() == 8
    # samples sharing a timestep code across the two batches must come from
    # different trajectories (different noise) → not identical
    codes = sel.time_codes
    for c in set(codes[:4]) & set(codes[4:]):
        i = int(np.where(codes[:4] == c)[0][0])
        j = 4 + int(np.where(codes[4:] == c)[0][0])
        if i % 4 == j % 4:  # same position, same code, different trajectory
            assert not np.allclose(np.asarray(sel.calib_x[i]),
                                   np.asarray(sel.calib_x[j]))


@pytest.mark.slow
def test_dp_sharded_act_calibration_matches_single_device():
    """GSPMD-sharded activation calibration equals the single-device result
    (the reference has no distributed path; SURVEY §2 requires psum'd
    statistics — here XLA's all-reduce of the global reductions)."""
    from eda_dm_tpu.parallel.mesh import make_mesh
    from eda_dm_tpu.parallel.dp import dp_calibrate_acts
    from eda_dm_tpu.calib.scale_init import set_act_quantize_params, \
        set_weight_quantize_params
    from eda_dm_tpu.models.ddpm_unet import DDPMUNet, DDPMConfig
    from eda_dm_tpu.quant import QuantConfig, FP

    arch = DDPMConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                      attn_resolutions=(8,), resolution=16)
    model = DDPMUNet(cfg=arch, qc=QuantConfig())
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (8, 16, 16, 3))
    t = jnp.full((8,), 10.0)
    variables = model.init(key, x, t, FP)
    variables = set_weight_quantize_params(model, variables, (x, t))

    single = set_act_quantize_params(model, variables, (x, t))
    mesh = make_mesh(8)
    sharded = dp_calibrate_acts(model, variables, (x, t), mesh)

    s1 = single["quant"]["conv_in"]["act_quantizer"]
    s2 = sharded["quant"]["conv_in"]["act_quantizer"]
    np.testing.assert_allclose(np.asarray(s1["delta"]),
                               np.asarray(s2["delta"]), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(s1["running_max"]),
                               np.asarray(s2["running_max"]), rtol=1e-4)


def test_dp_sharded_sampling_runs():
    from eda_dm_tpu.parallel.mesh import make_mesh, shard_batch, replicate
    from eda_dm_tpu.pipelines.cifar import CifarPipeline, CifarConfig
    from eda_dm_tpu.models.ddpm_unet import DDPMConfig
    from eda_dm_tpu.quant import FP

    arch = DDPMConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                      attn_resolutions=(8,), resolution=16)
    cfg = CifarConfig(arch=arch, image_size=16, timesteps=2,
                      skip_type="uniform", num_diffusion_timesteps=40)
    pipe = CifarPipeline(cfg)
    variables = pipe.init_variables()
    mesh = make_mesh(8)
    variables = replicate(mesh, variables)
    x_T = shard_batch(mesh, jax.random.normal(jax.random.PRNGKey(1),
                                              (16, 16, 16, 3)))

    from eda_dm_tpu.samplers.ddim import generalized_steps

    @jax.jit
    def sample(v, x):
        out, _ = generalized_steps(
            x, pipe.seq, lambda a, b: pipe.model.apply(v, a, b, FP),
            pipe.betas)
        return out

    out = sample(variables, x_T)
    assert out.shape == (16, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()
    # the output keeps the dp sharding
    assert len(out.sharding.device_set) == 8
