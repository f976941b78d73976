"""End-to-end W4A8 PTQ smoke on a tiny model: TDAC → scale init → a few
reconstruction targets → quantized sampling.  CPU-sized version of
BASELINE config 1 (the reference CIFAR flow, sample_diffusion_ddim.py:226-328)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp

from eda_dm_tpu.models.ddpm_unet import DDPMUNet, DDPMConfig, ddpm_recon_plan
from eda_dm_tpu.pipelines.cifar import CifarPipeline, CifarConfig
from eda_dm_tpu.quant import QuantConfig, WAQ, FP
from eda_dm_tpu.calib.recon import ReconArgs, reconstruct, build_target_data, \
    reconstruct_target
from eda_dm_tpu.utils.tree import get_subtree

TINY_ARCH = DDPMConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                       attn_resolutions=(8,), resolution=16)


@pytest.fixture(scope="module")
def pipeline():
    cfg = CifarConfig(
        arch=TINY_ARCH, image_size=16, timesteps=4, skip_type="uniform",
        num_diffusion_timesteps=100, calib_num_samples=8, batch_samples=8,
        iters=3, recon_batch_size=4, max_images=4, sample_batch_size=4)
    return CifarPipeline(cfg)


@pytest.fixture(scope="module")
def calibrated(pipeline):
    variables = pipeline.init_variables()
    calib_x, calib_t, sel = pipeline.tdac_calibration(
        variables, jax.random.PRNGKey(0))
    assert calib_x.shape == (8, 16, 16, 3)
    assert sel.t_num.sum() == 8 and len(sel.t_num) == 4
    # t values map through the reversed seq (calibration.py:146-149)
    assert set(np.asarray(calib_t, np.int32)).issubset(
        set(np.asarray(pipeline.seq)))
    cali_data = (calib_x, calib_t)
    variables = pipeline.calibrate(variables, cali_data)
    return variables, cali_data


def test_scale_init_populates_state(pipeline, calibrated):
    variables, _ = calibrated
    q = variables["quant"]
    # conv_in weight delta positive, act quantizer inited with EMA range
    assert float(jnp.min(q["conv_in"]["w0_delta"])) > 0
    aq = q["conv_in"]["act_quantizer"]
    assert bool(aq["inited"]) and float(aq["delta"]) > 0
    assert float(aq["running_max"]) > float(aq["running_min"])


def test_quant_forward_reasonable(pipeline, calibrated):
    variables, cali_data = calibrated
    x, t = cali_data
    fp = pipeline.model.apply(variables, x[:4], t[:4], FP)
    q = pipeline.model.apply(variables, x[:4], t[:4], WAQ)
    err = float(jnp.abs(q - fp).mean()) / (float(jnp.abs(fp).mean()) + 1e-9)
    assert np.isfinite(np.asarray(q)).all()
    assert err < 1.0  # W4A8 on random weights: degraded but sane


def test_recon_reduces_block_loss(pipeline, calibrated):
    """A single block target: FBR optimization should not increase the
    block-output loss (and should actually move the alphas)."""
    variables, cali_data = calibrated
    plan = ddpm_recon_plan(pipeline.cfg.arch, pipeline.qc)
    target = next(t for t in plan if t.name == "down_0.block_0")
    args = ReconArgs(iters=40, batch_size=8, input_prob=0.5)
    data = build_target_data(pipeline.model, variables, cali_data, target,
                             args)
    alpha_before = get_subtree(variables["quant"],
                               target.path)["conv1"]["w0_alpha"]
    new_vars, losses = reconstruct_target(target, variables, data, args,
                                          jax.random.PRNGKey(1))
    alpha_after = get_subtree(new_vars["quant"],
                              target.path)["conv1"]["w0_alpha"]
    assert float(jnp.abs(alpha_after - alpha_before).max()) > 0
    assert np.isfinite(np.asarray(losses)).all()
    # averaged tail loss should not exceed the head (noisy minibatches)
    assert np.mean(np.asarray(losses)[-10:]) <= \
        np.mean(np.asarray(losses)[:10]) * 1.5


def test_recon_sequence_and_sampling(pipeline, calibrated):
    """Run a prefix of the plan through the orchestrator, then sample."""
    variables, cali_data = calibrated
    plan = ddpm_recon_plan(pipeline.cfg.arch, pipeline.qc)
    args = ReconArgs(iters=3, batch_size=4)
    variables = reconstruct(pipeline.model, variables, cali_data, plan[:4],
                            args, jax.random.PRNGKey(2))
    imgs = pipeline.sample_batch(variables, jax.random.PRNGKey(3),
                                 batch_size=2)
    assert imgs.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(imgs)).all()
    assert 0.0 <= float(imgs.min()) and float(imgs.max()) <= 1.0


def test_tdac_against_naive_numpy():
    """Density/diversity scoring matches a direct O(T²) implementation
    (calibration.py:47-70)."""
    from eda_dm_tpu.calib.tdac import _pair_scores, timestep_counts
    rng = np.random.RandomState(0)
    feats = rng.randn(5, 2, 3, 3, 4).astype(np.float32)
    mse, cos_sum = _pair_scores(jnp.asarray(feats))
    mse, cos_sum = np.asarray(mse), np.asarray(cos_sum)

    T = feats.shape[0]
    mse_ref = np.zeros((T, T))
    cos_ref = np.zeros((T, T))
    for i in range(T):
        for j in range(T):
            mse_ref[i, j] = np.mean((feats[i] - feats[j]) ** 2)
            a = feats[i].reshape(-1, 4)
            b = feats[j].reshape(-1, 4)
            na = np.linalg.norm(a, axis=1)
            nb = np.linalg.norm(b, axis=1)
            cos_ref[i, j] = np.sum(
                (a * b).sum(1) / np.maximum(na * nb, 1e-12))
    np.testing.assert_allclose(mse, mse_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(cos_sum, cos_ref, rtol=1e-4, atol=1e-4)

    t_num, density, diversity = timestep_counts(mse, cos_sum, 18, 1.2, 100,
                                                dense_r=float(np.median(mse)))
    assert t_num.sum() == 100 and (t_num >= 0).all()
