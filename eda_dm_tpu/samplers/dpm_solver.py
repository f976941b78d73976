"""DPM-Solver / DPM-Solver++ (multistep, orders 1–3) for TPU.

Rebuild of /root/reference/ddim/dpm_solver_pytorch.py (NoiseScheduleVP:6,
model_wrapper:178, DPM_Solver:345; multistep updates :804-913; sample loop
:1055-1259) and the LDM wrapper (ldm/models/diffusion/dpm_solver/).

TPU-first restructuring: the reference interleaves schedule math (lambda,
sigma, phi coefficients) with the device loop; here the time grid is static,
so every per-step coefficient is precomputed on host as a numpy array and the
device-side ``lax.scan`` does exactly one model evaluation plus a
``lax.switch`` over the order-1/2/3 linear-combination formulas.  The
3-deep multistep history is a fixed-shape carry.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp


class NoiseScheduleVP:
    """Forward-SDE (VP) schedule wrapper — host-side numpy.

    Reference: dpm_solver_pytorch.py:6-176.  'discrete' interpolates
    log(alpha) over the training grid; 'linear'/'cosine' are closed-form.
    """

    def __init__(self, schedule: str = "discrete",
                 betas: Optional[np.ndarray] = None,
                 alphas_cumprod: Optional[np.ndarray] = None,
                 continuous_beta_0: float = 0.1,
                 continuous_beta_1: float = 20.0):
        self.schedule = schedule
        if schedule == "discrete":
            if betas is not None:
                log_alphas = 0.5 * np.cumsum(np.log(1.0 - np.asarray(
                    betas, np.float64)))
            else:
                log_alphas = 0.5 * np.log(np.asarray(alphas_cumprod,
                                                     np.float64))
            self.total_N = len(log_alphas)
            self.T = 1.0
            self.t_array = np.linspace(0.0, 1.0, self.total_N + 1)[1:]
            self.log_alpha_array = log_alphas
        elif schedule in ("linear", "cosine"):
            self.total_N = 1000
            self.T = 1.0 if schedule == "linear" else 0.9946
            self.beta_0 = continuous_beta_0
            self.beta_1 = continuous_beta_1
            self.cosine_s = 0.008
            self.cosine_log_alpha_0 = math.log(
                math.cos(self.cosine_s / (1.0 + self.cosine_s) * math.pi / 2))
        else:
            raise ValueError(schedule)

    def marginal_log_mean_coeff(self, t: np.ndarray) -> np.ndarray:
        t = np.asarray(t, np.float64)
        if self.schedule == "discrete":
            return np.interp(t, self.t_array, self.log_alpha_array)
        if self.schedule == "linear":
            return -0.25 * t ** 2 * (self.beta_1 - self.beta_0) \
                - 0.5 * t * self.beta_0
        return np.log(np.cos((t + self.cosine_s) / (1.0 + self.cosine_s)
                             * math.pi / 2)) - self.cosine_log_alpha_0

    def marginal_alpha(self, t):
        return np.exp(self.marginal_log_mean_coeff(t))

    def marginal_std(self, t):
        return np.sqrt(1.0 - np.exp(2.0 * self.marginal_log_mean_coeff(t)))

    def marginal_lambda(self, t):
        log_a = self.marginal_log_mean_coeff(t)
        return log_a - 0.5 * np.log(1.0 - np.exp(2.0 * log_a))

    def inverse_lambda(self, lamb: np.ndarray) -> np.ndarray:
        lamb = np.asarray(lamb, np.float64)
        if self.schedule == "discrete":
            log_alpha = -0.5 * np.logaddexp(0.0, -2.0 * lamb)
            return np.interp(log_alpha, self.log_alpha_array[::-1],
                             self.t_array[::-1])
        if self.schedule == "linear":
            tmp = 2.0 * (self.beta_1 - self.beta_0) * np.logaddexp(
                -2.0 * lamb, 0.0)
            delta = self.beta_0 ** 2 + tmp
            return tmp / (np.sqrt(delta) + self.beta_0) / (self.beta_1
                                                           - self.beta_0)
        log_alpha = -0.5 * np.logaddexp(-2.0 * lamb, 0.0)
        return np.arccos(np.exp(log_alpha + self.cosine_log_alpha_0)) \
            * 2.0 * (1.0 + self.cosine_s) / math.pi - self.cosine_s


def dpm_time_steps(ns: NoiseScheduleVP, skip_type: str, t_T: float,
                   t_0: float, N: int) -> np.ndarray:
    """Intermediate time grid (dpm_solver_pytorch.py:461-489)."""
    if skip_type == "logSNR":
        lam = np.linspace(ns.marginal_lambda(t_T), ns.marginal_lambda(t_0),
                          N + 1)
        return ns.inverse_lambda(lam)
    if skip_type == "time_uniform":
        return np.linspace(t_T, t_0, N + 1)
    if skip_type == "time_quadratic":
        return np.linspace(t_T ** 0.5, t_0 ** 0.5, N + 1) ** 2
    raise ValueError(skip_type)


def model_input_time(ns: NoiseScheduleVP, t: np.ndarray) -> np.ndarray:
    """Continuous time → discrete model input (dpm_solver_pytorch.py:279-288):
    t in [1/N, 1] → 1000 * (t - 1/N)."""
    if ns.schedule == "discrete":
        return (t - 1.0 / ns.total_N) * 1000.0
    return t


@dataclasses.dataclass
class _StepCoeffs:
    """Static per-step scalars for the multistep updates."""
    order: np.ndarray          # (steps,) int32
    t_model: np.ndarray        # (steps,) model-input time at the NEW point
    ratio: np.ndarray          # sigma_t/sigma_prev (++) or exp(dlog_alpha)
    c1: np.ndarray             # first-order coefficient (alpha_t*phi1 or sigma_t*phi1)
    c2: np.ndarray             # second-order D1 coefficient
    c3_1: np.ndarray           # third-order D1 coefficient
    c3_2: np.ndarray           # third-order D2 coefficient
    r0: np.ndarray             # h_0 / h
    r1: np.ndarray             # h_1 / h


def _build_coeffs(ns: NoiseScheduleVP, ts: np.ndarray, order: int,
                  algorithm_type: str, solver_type: str,
                  lower_order_final: bool) -> _StepCoeffs:
    steps = len(ts) - 1
    lam = ns.marginal_lambda(ts)
    log_a = ns.marginal_log_mean_coeff(ts)
    sigma = ns.marginal_std(ts)
    alpha = np.exp(log_a)

    orders = np.zeros(steps, np.int32)
    ratio = np.zeros(steps)
    c1 = np.zeros(steps)
    c2 = np.zeros(steps)
    c31 = np.zeros(steps)
    c32 = np.zeros(steps)
    r0 = np.ones(steps)
    r1 = np.ones(steps)
    for i in range(1, steps + 1):
        # warm-up with increasing order, optional lower order at the tail
        # (sample loop, dpm_solver_pytorch.py:1184-1216)
        o = min(i, order)
        if lower_order_final and steps < 15:
            o = min(o, steps + 1 - i)
        orders[i - 1] = o
        h = lam[i] - lam[i - 1]
        if i >= 2:
            r0[i - 1] = (lam[i - 1] - lam[i - 2]) / h
        if i >= 3:
            r1[i - 1] = (lam[i - 2] - lam[i - 3]) / h
        if algorithm_type == "dpmsolver++":
            phi1 = np.expm1(-h)
            phi2 = phi1 / h + 1.0
            phi3 = phi2 / h - 0.5
            ratio[i - 1] = sigma[i] / sigma[i - 1]
            c1[i - 1] = -alpha[i] * phi1
            c2[i - 1] = (-0.5 * alpha[i] * phi1 if solver_type == "dpmsolver"
                         else alpha[i] * phi2)
            c31[i - 1] = alpha[i] * phi2
            c32[i - 1] = -alpha[i] * phi3
        else:
            phi1 = np.expm1(h)
            phi2 = phi1 / h - 1.0
            phi3 = phi2 / h - 0.5
            ratio[i - 1] = np.exp(log_a[i] - log_a[i - 1])
            c1[i - 1] = -sigma[i] * phi1
            c2[i - 1] = (-0.5 * sigma[i] * phi1 if solver_type == "dpmsolver"
                         else -sigma[i] * phi2)
            c31[i - 1] = -sigma[i] * phi2
            c32[i - 1] = -sigma[i] * phi3
    t_model = model_input_time(ns, ts)
    f32 = lambda a: np.asarray(a, np.float32)
    return _StepCoeffs(orders, f32(t_model[1:]), f32(ratio), f32(c1),
                       f32(c2), f32(c31), f32(c32), f32(r0), f32(r1))


def dpm_solver_sample(x: jnp.ndarray, model_fn: Callable,
                      ns: NoiseScheduleVP, steps: int = 20, order: int = 3,
                      skip_type: str = "time_uniform",
                      algorithm_type: str = "dpmsolver++",
                      solver_type: str = "dpmsolver",
                      lower_order_final: bool = True,
                      t_start: Optional[float] = None,
                      t_end: Optional[float] = None,
                      denoise_to_zero: bool = False) -> jnp.ndarray:
    """Multistep DPM-Solver sampling (method='multistep').

    model_fn(x, t_model_input) -> eps (CFG pre-folded).  One model eval per
    step; the order-1/2/3 combination is a lax.switch over precomputed
    coefficients (multistep updates at dpm_solver_pytorch.py:555-601,
    804-913).
    """
    t_0 = (1.0 / ns.total_N) if t_end is None else t_end
    t_T = ns.T if t_start is None else t_start
    ts = dpm_time_steps(ns, skip_type, t_T, t_0, steps)
    co = _build_coeffs(ns, ts, order, algorithm_type, solver_type,
                       lower_order_final)

    n = x.shape[0]
    sigma0 = np.float32(ns.marginal_std(ts[0]))
    alpha0 = np.float32(ns.marginal_alpha(ts[0]))
    t0_model = np.float32(model_input_time(ns, ts[0]))

    def F(xv, t_scalar, sigma_t, alpha_t):
        """The solver's model function: eps (dpmsolver) or x0 (dpmsolver++),
        dpm_solver_pytorch.py:435-459."""
        eps = model_fn(xv, jnp.full((n,), t_scalar, jnp.float32))
        if algorithm_type == "dpmsolver++":
            return (xv - sigma_t * eps) / alpha_t
        return eps

    sig_arr = jnp.asarray(np.asarray(ns.marginal_std(ts), np.float32))
    alp_arr = jnp.asarray(np.asarray(ns.marginal_alpha(ts), np.float32))
    tm_arr = jnp.asarray(co.t_model)

    m0 = F(x, t0_model, sigma0, alpha0)
    buf = jnp.stack([m0, m0, m0])          # [-3, -2, -1], newest last

    def body(carry, i):
        x, buf = carry
        m0 = buf[2]                         # most recent model value
        m1 = buf[1]
        m2 = buf[0]

        def upd1(_):
            return co_ratio[i] * x + co_c1[i] * m0

        def upd2(_):
            D1_0 = (m0 - m1) / co_r0[i]
            return co_ratio[i] * x + co_c1[i] * m0 + co_c2[i] * D1_0

        def upd3(_):
            rr0, rr1 = co_r0[i], co_r1[i]
            D1_0 = (m0 - m1) / rr0
            D1_1 = (m1 - m2) / rr1
            D1 = D1_0 + (rr0 / (rr0 + rr1)) * (D1_0 - D1_1)
            D2 = (D1_0 - D1_1) / (rr0 + rr1)
            return (co_ratio[i] * x + co_c1[i] * m0 + co_c31[i] * D1
                    + co_c32[i] * D2)

        x_new = jax.lax.switch(co_order[i] - 1, [upd1, upd2, upd3], None)

        def do_eval(_):
            return F(x_new, tm_arr[i], sig_arr[i + 1], alp_arr[i + 1])

        m_new = jax.lax.cond(i < steps - 1, do_eval, lambda _: m0, None)
        buf = jnp.stack([buf[1], buf[2], m_new])
        return (x_new, buf), None

    co_order = jnp.asarray(co.order)
    co_ratio = jnp.asarray(co.ratio)
    co_c1 = jnp.asarray(co.c1)
    co_c2 = jnp.asarray(co.c2)
    co_c31 = jnp.asarray(co.c3_1)
    co_c32 = jnp.asarray(co.c3_2)
    co_r0 = jnp.asarray(co.r0)
    co_r1 = jnp.asarray(co.r1)

    (x, _), _ = jax.lax.scan(body, (x, buf), jnp.arange(steps))

    if denoise_to_zero:
        # final x0 projection at t_0 (denoise_to_zero_fn, :549-554)
        eps = model_fn(x, jnp.full((n,), float(model_input_time(ns, t_0)),
                                   jnp.float32))
        s = np.float32(ns.marginal_std(t_0))
        a = np.float32(ns.marginal_alpha(t_0))
        x = (x - s * eps) / a
    return x
