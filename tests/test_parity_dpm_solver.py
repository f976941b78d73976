"""DPM-Solver(++) multistep parity vs the reference implementation."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp

from eda_dm_tpu.samplers.dpm_solver import (NoiseScheduleVP, dpm_time_steps,
                                            dpm_solver_sample,
                                            model_input_time)
from eda_dm_tpu.samplers.schedules import get_beta_schedule


@pytest.fixture(scope="module")
def betas():
    return get_beta_schedule("linear", beta_start=1e-4, beta_end=0.02,
                             num_diffusion_timesteps=100)


def test_noise_schedule_parity(reference_path, betas):
    import torch
    from ddim.dpm_solver_pytorch import NoiseScheduleVP as RefNS

    ref = RefNS("discrete", betas=torch.from_numpy(betas))
    ours = NoiseScheduleVP("discrete", betas=betas)
    t = np.linspace(0.011, 1.0, 37)
    tt = torch.from_numpy(t.astype(np.float32))
    np.testing.assert_allclose(ours.marginal_log_mean_coeff(t),
                               ref.marginal_log_mean_coeff(tt).numpy(),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(ours.marginal_lambda(t),
                               ref.marginal_lambda(tt).numpy(), rtol=1e-4,
                               atol=1e-5)
    # probe within the schedule's lambda range — outside it the reference
    # linearly extrapolates to t > 1 (never reached by any time grid) while
    # np.interp clamps
    lam_lo = float(ours.marginal_lambda(np.asarray(1.0))) + 1e-3
    lam_hi = float(ours.marginal_lambda(np.asarray(0.011))) - 1e-3
    lam = np.linspace(lam_lo, lam_hi, 11)
    np.testing.assert_allclose(
        ours.inverse_lambda(lam),
        ref.inverse_lambda(torch.from_numpy(lam.astype(np.float32))).numpy(),
        rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("algorithm,order", [("dpmsolver", 2),
                                             ("dpmsolver++", 2),
                                             ("dpmsolver++", 3)])
def test_multistep_sampling_parity(reference_path, betas, algorithm, order):
    """End-to-end multistep sampling against the reference DPM_Solver on a
    shared analytic 'model' (eps = c(t) * x) so no UNet is needed."""
    import torch
    from ddim.dpm_solver_pytorch import (NoiseScheduleVP as RefNS,
                                         model_wrapper, DPM_Solver)

    def torch_model(x, t, **kw):
        return 0.01 * x * (1.0 + 0.001 * t.reshape(-1, 1, 1, 1))

    ref_ns = RefNS("discrete", betas=torch.from_numpy(betas))
    wrapped = model_wrapper(torch_model, ref_ns, model_type="noise")
    solver = DPM_Solver(wrapped, ref_ns, algorithm_type=algorithm)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 8, 8).astype(np.float32)
    with torch.no_grad():
        ref_out = solver.sample(torch.from_numpy(x), steps=8, order=order,
                                skip_type="time_uniform", method="multistep",
                                lower_order_final=True).numpy()

    ours_ns = NoiseScheduleVP("discrete", betas=betas)

    def jax_model(xv, t_model):
        return 0.01 * xv * (1.0 + 0.001 * t_model.reshape(-1, 1, 1, 1))

    ours = dpm_solver_sample(jnp.asarray(x), jax_model, ours_ns, steps=8,
                             order=order, algorithm_type=algorithm)
    np.testing.assert_allclose(np.asarray(ours), ref_out, rtol=2e-3,
                               atol=2e-4)


@pytest.mark.parametrize("algorithm,order,skip", [
    ("dpmsolver", 2, "time_uniform"),
    ("dpmsolver++", 2, "time_uniform"),
    ("dpmsolver++", 3, "time_uniform"),
    ("dpmsolver++", 3, "logSNR"),
    ("dpmsolver++", 1, "time_uniform"),
])
def test_singlestep_sampling_parity(reference_path, betas, algorithm, order,
                                    skip):
    """Singlestep method parity (dpm_solver_pytorch.py:915-951 block
    schedule + :491-711 updates) on the shared analytic model."""
    import torch
    from ddim.dpm_solver_pytorch import (NoiseScheduleVP as RefNS,
                                         model_wrapper, DPM_Solver)
    from eda_dm_tpu.samplers.dpm_solver import dpm_solver_sample_singlestep

    def torch_model(x, t, **kw):
        return 0.01 * x * (1.0 + 0.001 * t.reshape(-1, 1, 1, 1))

    ref_ns = RefNS("discrete", betas=torch.from_numpy(betas))
    wrapped = model_wrapper(torch_model, ref_ns, model_type="noise")
    solver = DPM_Solver(wrapped, ref_ns, algorithm_type=algorithm)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 8, 8).astype(np.float32)
    with torch.no_grad():
        ref_out = solver.sample(torch.from_numpy(x), steps=7, order=order,
                                skip_type=skip,
                                method="singlestep").numpy()

    ours_ns = NoiseScheduleVP("discrete", betas=betas)

    def jax_model(xv, t_model):
        return 0.01 * xv * (1.0 + 0.001 * t_model.reshape(-1, 1, 1, 1))

    ours = dpm_solver_sample_singlestep(jnp.asarray(x), jax_model, ours_ns,
                                        steps=7, order=order, skip_type=skip,
                                        algorithm_type=algorithm)
    np.testing.assert_allclose(np.asarray(ours), ref_out, rtol=2e-3,
                               atol=2e-4)


@pytest.mark.parametrize("order", [2, 3])
def test_adaptive_sampling_parity(reference_path, betas, order):
    """Adaptive controller parity (dpm_solver_adaptive,
    dpm_solver_pytorch.py:953-1053)."""
    import torch
    from ddim.dpm_solver_pytorch import (NoiseScheduleVP as RefNS,
                                         model_wrapper, DPM_Solver)
    from eda_dm_tpu.samplers.dpm_solver import dpm_solver_sample_adaptive

    def torch_model(x, t, **kw):
        return 0.01 * x * (1.0 + 0.001 * t.reshape(-1, 1, 1, 1))

    ref_ns = RefNS("discrete", betas=torch.from_numpy(betas))
    wrapped = model_wrapper(torch_model, ref_ns, model_type="noise")
    solver = DPM_Solver(wrapped, ref_ns, algorithm_type="dpmsolver++")

    rng = np.random.RandomState(1)
    x = rng.randn(2, 3, 8, 8).astype(np.float32)
    with torch.no_grad():
        ref_out = solver.sample(torch.from_numpy(x), order=order,
                                method="adaptive", atol=0.0078,
                                rtol=0.05).numpy()

    ours_ns = NoiseScheduleVP("discrete", betas=betas)

    def jax_model(xv, t_model):
        return 0.01 * xv * (1.0 + 0.001 * t_model.reshape(-1, 1, 1, 1))

    ours = dpm_solver_sample_adaptive(jnp.asarray(x), jax_model, ours_ns,
                                      order=order)
    # controller step-size decisions amplify tiny fp differences; accept
    # solution-level agreement
    np.testing.assert_allclose(np.asarray(ours), ref_out, rtol=5e-3,
                               atol=5e-3)


def test_time_steps_logsnr(reference_path, betas):
    import torch
    from ddim.dpm_solver_pytorch import NoiseScheduleVP as RefNS, DPM_Solver

    ref_ns = RefNS("discrete", betas=torch.from_numpy(betas))
    solver = DPM_Solver(lambda x, t: x, ref_ns)
    ref_ts = solver.get_time_steps("logSNR", 1.0, 0.01, 10,
                                   torch.device("cpu")).numpy()
    ours_ns = NoiseScheduleVP("discrete", betas=betas)
    ts = dpm_time_steps(ours_ns, "logSNR", 1.0, 0.01, 10)
    np.testing.assert_allclose(ts, ref_ts, rtol=1e-3, atol=1e-4)
