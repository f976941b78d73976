"""FP32 numerical parity: flax DDPMUNet + DDIM sampler vs the reference
PyTorch model zoo (random weights, tiny config).  Skipped without
/root/reference."""

import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp

from eda_dm_tpu.models.ddpm_unet import DDPMUNet, DDPMConfig
from eda_dm_tpu.models.convert import ddpm_state_dict_to_params
from eda_dm_tpu.quant import QuantConfig, FP
from eda_dm_tpu.samplers.schedules import get_beta_schedule, skip_sequence
from eda_dm_tpu.samplers import ddim as jddim

TINY = dict(ch=32, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(8,),
            resolution=16, in_channels=3, out_ch=3)


def _torch_config():
    m = types.SimpleNamespace(
        ch=TINY["ch"], out_ch=TINY["out_ch"], ch_mult=list(TINY["ch_mult"]),
        num_res_blocks=TINY["num_res_blocks"],
        attn_resolutions=list(TINY["attn_resolutions"]), dropout=0.0,
        in_channels=TINY["in_channels"], resamp_with_conv=True,
        var_type="fixedlarge", type="simple")
    d = types.SimpleNamespace(image_size=TINY["resolution"])
    diff = types.SimpleNamespace(num_diffusion_timesteps=100)
    return types.SimpleNamespace(model=m, data=d, diffusion=diff)


@pytest.fixture(scope="module")
def torch_model(reference_path):
    import torch
    from ddim.models.diffusion import Model
    torch.manual_seed(0)
    model = Model(_torch_config())
    model.eval()
    return model


@pytest.fixture(scope="module")
def flax_setup(torch_model):
    cfg = DDPMConfig(**TINY)
    model = DDPMUNet(cfg=cfg, qc=QuantConfig())
    params = ddpm_state_dict_to_params(torch_model.state_dict())
    x = jnp.zeros((1, 16, 16, 3))
    t = jnp.zeros((1,))
    ref_vars = model.init(jax.random.PRNGKey(0), x, t, FP)
    # graft converted weights; verify tree congruence
    import jax.tree_util as jtu
    ref_flat = {jtu.keystr(k): v.shape for k, v in
                jtu.tree_flatten_with_path(ref_vars["params"])[0]}
    new_flat = {jtu.keystr(k): v.shape for k, v in
                jtu.tree_flatten_with_path(params)[0]}
    assert ref_flat == new_flat, (
        set(ref_flat) ^ set(new_flat),
        {k: (ref_flat.get(k), new_flat.get(k))
         for k in ref_flat if ref_flat.get(k) != new_flat.get(k)})
    variables = {**ref_vars, "params": jax.tree.map(jnp.asarray, params)}
    return model, variables


def test_fp_forward_parity(reference_path, torch_model, flax_setup):
    import torch
    model, variables = flax_setup
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 16, 16).astype(np.float32)
    t = np.array([10.0, 55.0], dtype=np.float32)

    with torch.no_grad():
        ref = torch_model(torch.from_numpy(x), torch.from_numpy(t)).numpy()

    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    ours = jax.jit(lambda v, xx, tt: model.apply(v, xx, tt, FP))(
        variables, x_nhwc, jnp.asarray(t))
    ours_nchw = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    np.testing.assert_allclose(ours_nchw, ref, rtol=2e-3, atol=2e-4)


def test_ddim_sampler_parity(reference_path, torch_model, flax_setup,
                             monkeypatch):
    """Deterministic (eta=0) DDIM trajectories agree end-to-end."""
    import torch
    from ddim.functions.denoising import generalized_steps

    # the reference hardcodes .to('cuda') inside its step loop; run it on cpu
    orig_to = torch.Tensor.to

    def _to_cpu(self, *args, **kw):
        args = tuple("cpu" if a == "cuda" else a for a in args)
        return orig_to(self, *args, **kw)

    monkeypatch.setattr(torch.Tensor, "to", _to_cpu)

    model, variables = flax_setup
    betas = get_beta_schedule("linear", beta_start=1e-4, beta_end=0.02,
                              num_diffusion_timesteps=100)
    seq = skip_sequence("quad", 5, 100)

    rng = np.random.RandomState(1)
    x = rng.randn(2, 3, 16, 16).astype(np.float32)

    class _Args:
        pass
    with torch.no_grad():
        xs, _ = generalized_steps(torch.from_numpy(x), list(seq), torch_model,
                                  torch.from_numpy(betas), eta=0.0,
                                  args=_Args())
    ref_final = xs[-1].numpy()

    def model_fn(xx, tt):
        return model.apply(variables, xx, tt, FP)

    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    ours_final, _ = jax.jit(
        lambda xx: jddim.generalized_steps(xx, seq, model_fn, betas, eta=0.0)
    )(x_nhwc)
    ours_nchw = np.transpose(np.asarray(ours_final), (0, 3, 1, 2))
    np.testing.assert_allclose(ours_nchw, ref_final, rtol=5e-3, atol=5e-4)


def test_trajectory_capture_matches_reference_layout(reference_path,
                                                     flax_setup):
    """Capture path returns per-step x_t with x_T first (calibration.py:29-42
    all_sample = xs[:-1] ordering)."""
    model, variables = flax_setup
    betas = get_beta_schedule("linear", beta_start=1e-4, beta_end=0.02,
                              num_diffusion_timesteps=100)
    seq = skip_sequence("uniform", 4, 100)

    def model_fn(xx, tt):
        return model.apply(variables, xx, tt, FP)

    x0 = jnp.asarray(np.random.RandomState(2).randn(1, 16, 16, 3),
                     jnp.float32)
    final, traj = jax.jit(lambda xx: jddim.generalized_steps(
        xx, seq, model_fn, betas, eta=0.0, record_xt=True))(x0)
    xs, ts = traj["x"], traj["t"]
    assert xs.shape == (4, 1, 16, 16, 3)
    np.testing.assert_allclose(xs[0], x0, rtol=1e-6)   # first entry is x_T
    assert list(np.asarray(ts, np.int32)) == sorted(
        list(np.asarray(ts, np.int32)), reverse=True)  # descending t
