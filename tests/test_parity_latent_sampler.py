"""LDM schedule + DDIM/PLMS sampler parity vs the reference implementations."""

import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp

from eda_dm_tpu.samplers.latent import (make_beta_schedule, make_ldm_schedule,
                                        ldm_ddim_sample, ldm_plms_sample,
                                        cfg_model_fn)


def test_schedule_parity(reference_path):
    from ldm.modules.diffusionmodules.util import (
        make_beta_schedule as ref_betas, make_ddim_timesteps,
        make_ddim_sampling_parameters)

    betas_ref = ref_betas("linear", 1000, linear_start=0.0015,
                          linear_end=0.0195)
    np.testing.assert_allclose(
        make_beta_schedule("linear", 1000, 0.0015, 0.0195), betas_ref,
        rtol=1e-6)

    sched = make_ldm_schedule(1000, 0.0015, 0.0195, ddim_steps=20, eta=1.0)
    ts_ref = make_ddim_timesteps("uniform", 20, 1000, verbose=False)
    np.testing.assert_array_equal(sched.ddim_timesteps, ts_ref)

    import torch
    alphacums = torch.from_numpy(
        np.cumprod(1.0 - betas_ref.astype(np.float64)).astype(np.float32))
    sig, al, al_prev = make_ddim_sampling_parameters(
        alphacums=alphacums, ddim_timesteps=ts_ref, eta=1.0, verbose=False)
    np.testing.assert_allclose(sched.ddim_alphas, al, rtol=1e-5)
    np.testing.assert_allclose(sched.ddim_alphas_prev, al_prev, rtol=1e-5)
    np.testing.assert_allclose(sched.ddim_sigmas, sig, rtol=1e-4, atol=1e-7)


class _ShimModel:
    """Minimal stand-in for LatentDiffusion as DDIMSampler sees it."""

    def __init__(self, unet, betas):
        import torch
        self.unet = unet
        self.num_timesteps = len(betas)
        self.betas = torch.from_numpy(betas)
        ac = torch.from_numpy(
            np.cumprod(1.0 - betas.astype(np.float64)).astype(np.float32))
        self.alphas_cumprod = ac
        self.alphas_cumprod_prev = torch.cat(
            [torch.ones(1), ac[:-1]])
        self.sqrt_one_minus_alphas_cumprod = torch.sqrt(1.0 - ac)
        self.device = torch.device("cpu")
        self.parameterization = "eps"

    def apply_model(self, x, t, c):
        return self.unet(x, t, context=c)


@pytest.fixture()
def cpu_to(monkeypatch):
    import torch
    orig_to = torch.Tensor.to

    def _to(self, *args, **kw):
        args = tuple("cpu" if (isinstance(a, (str, torch.device))
                               and str(a).startswith("cuda")) else a
                     for a in args)
        return orig_to(self, *args, **kw)

    monkeypatch.setattr(torch.Tensor, "to", _to)


def _tiny_models(reference_path):
    import torch
    from tests.test_parity_ldm import make_ref_unet
    from eda_dm_tpu.models.ldm_unet import LDMUNet, LDMUNetConfig
    from eda_dm_tpu.models.convert import ldm_unet_state_dict_to_params
    from eda_dm_tpu.quant import QuantConfig, FP

    kw = dict(image_size=8, in_channels=3, model_channels=32, out_channels=3,
              num_res_blocks=1, attention_resolutions=(2,),
              channel_mult=(1, 2), num_head_channels=16, dims=2)
    tm = make_ref_unet(reference_path, **kw)
    cfg = LDMUNetConfig(image_size=8, in_channels=3, model_channels=32,
                        out_channels=3, num_res_blocks=1,
                        attention_resolutions=(2,), channel_mult=(1, 2),
                        num_head_channels=16)
    model = LDMUNet(cfg=cfg, qc=QuantConfig())
    params = ldm_unet_state_dict_to_params(tm.state_dict())
    x = jnp.zeros((1, 8, 8, 3))
    vars0 = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)), mode=FP)
    variables = {**vars0, "params": jax.tree.map(jnp.asarray, params)}

    def jax_fn(x, t):
        return model.apply(variables, x, t, mode=FP)

    return tm, jax_fn


def test_ddim_sampler_parity(reference_path, cpu_to):
    import torch
    from ldm.models.diffusion.ddim import DDIMSampler

    tm, jax_fn = _tiny_models(reference_path)
    betas = make_beta_schedule("linear", 100, 0.0015, 0.0195)
    shim = _ShimModel(tm, betas)
    sampler = DDIMSampler(shim)
    sampler.make_schedule(5, ddim_eta=0.0, verbose=False)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 8, 8).astype(np.float32)

    img = torch.from_numpy(x)
    with torch.no_grad():
        out, inter, _ = sampler.ddim_sampling(None, x.shape,
                                              x_T=img.clone())
    ref = out.numpy()

    sched = make_ldm_schedule(100, 0.0015, 0.0195, ddim_steps=5, eta=0.0)
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    ours, traj = jax.jit(lambda xx: ldm_ddim_sample(
        xx, sched, jax_fn, record_xt=True))(x_nhwc)
    ours_nchw = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    np.testing.assert_allclose(ours_nchw, ref, rtol=5e-3, atol=5e-4)
    # recorded ts match the reference's intermediates['ts']
    ref_ts = [int(t[0]) for t in inter["ts"]]
    assert list(np.asarray(traj["t"])) == ref_ts


def test_plms_sampler_parity(reference_path, cpu_to):
    import torch
    from ldm.models.diffusion.plms import PLMSSampler

    tm, jax_fn = _tiny_models(reference_path)
    betas = make_beta_schedule("linear", 100, 0.0015, 0.0195)
    shim = _ShimModel(tm, betas)
    sampler = PLMSSampler(shim)
    sampler.make_schedule(6, ddim_eta=0.0, verbose=False)

    rng = np.random.RandomState(1)
    x = rng.randn(1, 3, 8, 8).astype(np.float32)
    # the reference unconditionally records cond/uncond at the last step
    # (plms.py:199-201); guidance scale 1.0 keeps the math unconditional
    dummy = torch.zeros(1)
    with torch.no_grad():
        out, inter, _ = sampler.plms_sampling(
            dummy, x.shape, x_T=torch.from_numpy(x),
            unconditional_guidance_scale=1.0,
            unconditional_conditioning=dummy)
    ref = out.numpy()

    sched = make_ldm_schedule(100, 0.0015, 0.0195, ddim_steps=6, eta=0.0)
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    ours, _ = jax.jit(lambda xx: ldm_plms_sample(xx, sched, jax_fn))(x_nhwc)
    ours_nchw = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    np.testing.assert_allclose(ours_nchw, ref, rtol=1e-2, atol=1e-3)


def test_cfg_model_fn_math():
    """eps = e_u + s (e_c - e_u) with a doubled batch (ddim.py:194-210)."""
    def apply_fn(x, t, c):
        # eps depends linearly on the context so the CFG blend is exact
        return x * c[:, None, None, :]

    x = jnp.ones((2, 4, 4, 1))
    t = jnp.zeros((2,))
    cond = jnp.full((2, 1), 3.0)
    uncond = jnp.full((2, 1), 1.0)
    fn = cfg_model_fn(apply_fn, cond, uncond, scale=2.0)
    out = fn(x, t)
    np.testing.assert_allclose(out, 1.0 + 2.0 * (3.0 - 1.0))
