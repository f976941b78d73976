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


# --------------------------------------------------------------------------
# singlestep method (dpm_solver_pytorch.py:491-803,915-951,1184-1201)
# --------------------------------------------------------------------------

def _singlestep_orders(steps: int, order: int):
    """Block order sequence (get_orders_and_timesteps_for_singlestep,
    dpm_solver_pytorch.py:915-951)."""
    if order == 3:
        k = steps // 3 + 1
        if steps % 3 == 0:
            orders = [3] * (k - 2) + [2, 1]
        elif steps % 3 == 1:
            orders = [3] * (k - 1) + [1]
        else:
            orders = [3] * (k - 1) + [2]
    elif order == 2:
        if steps % 2 == 0:
            orders = [2] * (steps // 2)
        else:
            orders = [2] * (steps // 2) + [1]
    elif order == 1:
        orders = [1] * steps
    else:
        raise ValueError(order)
    return orders


def dpm_solver_sample_singlestep(x: jnp.ndarray, model_fn: Callable,
                                 ns: NoiseScheduleVP, steps: int = 20,
                                 order: int = 3,
                                 skip_type: str = "time_uniform",
                                 algorithm_type: str = "dpmsolver++",
                                 solver_type: str = "dpmsolver",
                                 t_start: Optional[float] = None,
                                 t_end: Optional[float] = None) -> jnp.ndarray:
    """Singlestep DPM-Solver: the trajectory splits into blocks of up to
    ``order`` model evaluations; each block is one order-k singlestep update
    with intermediate points at r1 (=1/2 or 1/3) and r2 (=2/3) of the
    logSNR span (singlestep updates at dpm_solver_pytorch.py:491-803;
    driver :1184-1201).

    Every block's coefficients are host-precomputed scalars, so the traced
    graph is a flat chain of model evals + affine combinations (the block
    structure is static — no switch needed).
    """
    t_0 = (1.0 / ns.total_N) if t_end is None else t_end
    t_T = ns.T if t_start is None else t_start
    orders = _singlestep_orders(steps, order)
    K = len(orders)
    if skip_type == "logSNR":
        ts_outer = dpm_time_steps(ns, skip_type, t_T, t_0, K)
    else:
        ts_full = dpm_time_steps(ns, skip_type, t_T, t_0, steps)
        ts_outer = ts_full[np.cumsum([0] + orders)]

    n = x.shape[0]

    def eval_model(xv, t_cont):
        t_m = float(model_input_time(ns, np.float64(t_cont)))
        eps = model_fn(xv, jnp.full((n,), t_m, jnp.float32))
        if algorithm_type == "dpmsolver++":
            sig = np.float32(ns.marginal_std(t_cont))
            alp = np.float32(ns.marginal_alpha(t_cont))
            return (xv - sig * eps) / alp
        return eps

    lam = lambda t: float(ns.marginal_lambda(t))
    sig = lambda t: np.float32(ns.marginal_std(t))
    alp = lambda t: np.float32(ns.marginal_alpha(t))
    loga = lambda t: float(ns.marginal_log_mean_coeff(t))
    inv = lambda l: float(ns.inverse_lambda(l))
    pp = algorithm_type == "dpmsolver++"

    for i, o in enumerate(orders):
        s, t = float(ts_outer[i]), float(ts_outer[i + 1])
        h = lam(t) - lam(s)
        m_s = eval_model(x, s)
        if o == 1:
            # first_update (:491-521)
            if pp:
                x = (sig(t) / sig(s)) * x - alp(t) * np.expm1(-h) * m_s
            else:
                x = np.exp(loga(t) - loga(s)) * x \
                    - sig(t) * np.expm1(h) * m_s
        elif o == 2:
            # singlestep_second_update, r1=0.5 (:523-601)
            r1 = 0.5
            s1 = inv(lam(s) + r1 * h)
            if pp:
                x_s1 = (sig(s1) / sig(s)) * x \
                    - alp(s1) * np.expm1(-r1 * h) * m_s
                m_s1 = eval_model(x_s1, s1)
                phi1 = np.expm1(-h)
                base = (sig(t) / sig(s)) * x - alp(t) * phi1 * m_s
                if solver_type == "dpmsolver":
                    x = base - (0.5 / r1) * alp(t) * phi1 * (m_s1 - m_s)
                else:                          # taylor
                    phi2 = phi1 / h + 1.0
                    x = base + (1.0 / r1) * alp(t) * phi2 * (m_s1 - m_s)
            else:
                x_s1 = np.exp(loga(s1) - loga(s)) * x \
                    - sig(s1) * np.expm1(r1 * h) * m_s
                m_s1 = eval_model(x_s1, s1)
                phi1 = np.expm1(h)
                base = np.exp(loga(t) - loga(s)) * x - sig(t) * phi1 * m_s
                if solver_type == "dpmsolver":
                    x = base - (0.5 / r1) * sig(t) * phi1 * (m_s1 - m_s)
                else:
                    phi2 = phi1 / h - 1.0
                    x = base - (1.0 / r1) * sig(t) * phi2 * (m_s1 - m_s)
        else:
            # singlestep_third_update, r1=1/3, r2=2/3 (:603-711)
            r1, r2 = 1.0 / 3.0, 2.0 / 3.0
            s1 = inv(lam(s) + r1 * h)
            s2 = inv(lam(s) + r2 * h)
            if pp:
                phi11 = np.expm1(-r1 * h)
                phi12 = np.expm1(-r2 * h)
                phi1 = np.expm1(-h)
                phi22 = np.expm1(-r2 * h) / (r2 * h) + 1.0
                phi2 = phi1 / h + 1.0
                phi3 = phi2 / h - 0.5
                x_s1 = (sig(s1) / sig(s)) * x - alp(s1) * phi11 * m_s
                m_s1 = eval_model(x_s1, s1)
                x_s2 = (sig(s2) / sig(s)) * x - alp(s2) * phi12 * m_s \
                    + r2 / r1 * alp(s2) * phi22 * (m_s1 - m_s)
                m_s2 = eval_model(x_s2, s2)
                base = (sig(t) / sig(s)) * x - alp(t) * phi1 * m_s
                if solver_type == "dpmsolver":
                    x = base + (1.0 / r2) * alp(t) * phi2 * (m_s2 - m_s)
                else:
                    D1_0 = (1.0 / r1) * (m_s1 - m_s)
                    D1_1 = (1.0 / r2) * (m_s2 - m_s)
                    D1 = (r2 * D1_0 - r1 * D1_1) / (r2 - r1)
                    D2 = 2.0 * (D1_1 - D1_0) / (r2 - r1)
                    x = base + alp(t) * phi2 * D1 - alp(t) * phi3 * D2
            else:
                phi11 = np.expm1(r1 * h)
                phi12 = np.expm1(r2 * h)
                phi1 = np.expm1(h)
                phi22 = np.expm1(r2 * h) / (r2 * h) - 1.0
                phi2 = phi1 / h - 1.0
                phi3 = phi2 / h - 0.5
                x_s1 = np.exp(loga(s1) - loga(s)) * x - sig(s1) * phi11 * m_s
                m_s1 = eval_model(x_s1, s1)
                x_s2 = np.exp(loga(s2) - loga(s)) * x - sig(s2) * phi12 * m_s \
                    - r2 / r1 * sig(s2) * phi22 * (m_s1 - m_s)
                m_s2 = eval_model(x_s2, s2)
                base = np.exp(loga(t) - loga(s)) * x - sig(t) * phi1 * m_s
                if solver_type == "dpmsolver":
                    x = base - (1.0 / r2) * sig(t) * phi2 * (m_s2 - m_s)
                else:
                    D1_0 = (1.0 / r1) * (m_s1 - m_s)
                    D1_1 = (1.0 / r2) * (m_s2 - m_s)
                    D1 = (r2 * D1_0 - r1 * D1_1) / (r2 - r1)
                    D2 = 2.0 * (D1_1 - D1_0) / (r2 - r1)
                    x = base - sig(t) * phi2 * D1 - sig(t) * phi3 * D2
    return x


# --------------------------------------------------------------------------
# adaptive method (dpm_solver_pytorch.py:953-1053)
# --------------------------------------------------------------------------

def _jnp_schedule(ns: NoiseScheduleVP):
    """Device-side (jnp) schedule functions for the adaptive controller —
    the while-loop needs marginal/inverse-lambda on device."""
    if ns.schedule == "discrete":
        t_arr = jnp.asarray(ns.t_array, jnp.float32)
        la_arr = jnp.asarray(ns.log_alpha_array, jnp.float32)

        def log_mean(t):
            return jnp.interp(t, t_arr, la_arr)

        def inv_lambda(l):
            log_alpha = -0.5 * jnp.logaddexp(0.0, -2.0 * l)
            return jnp.interp(log_alpha, la_arr[::-1], t_arr[::-1])
    elif ns.schedule == "linear":
        b0, b1 = ns.beta_0, ns.beta_1

        def log_mean(t):
            return -0.25 * t ** 2 * (b1 - b0) - 0.5 * t * b0

        def inv_lambda(l):
            tmp = 2.0 * (b1 - b0) * jnp.logaddexp(-2.0 * l, 0.0)
            delta = b0 ** 2 + tmp
            return tmp / (jnp.sqrt(delta) + b0) / (b1 - b0)
    else:
        raise NotImplementedError("adaptive: cosine schedule")

    def alpha(t):
        return jnp.exp(log_mean(t))

    def std(t):
        return jnp.sqrt(1.0 - jnp.exp(2.0 * log_mean(t)))

    def lam(t):
        la = log_mean(t)
        return la - 0.5 * jnp.log(1.0 - jnp.exp(2.0 * la))

    return log_mean, alpha, std, lam, inv_lambda


def dpm_solver_sample_adaptive(x: jnp.ndarray, model_fn: Callable,
                               ns: NoiseScheduleVP, order: int = 2,
                               h_init: float = 0.05, atol: float = 0.0078,
                               rtol: float = 0.05, theta: float = 0.9,
                               max_steps: int = 200,
                               t_start: Optional[float] = None,
                               t_end: Optional[float] = None) -> jnp.ndarray:
    """Adaptive step-size DPM-Solver (dpm_solver_adaptive,
    dpm_solver_pytorch.py:953-1053), dpmsolver++ data-prediction mode.

    order=2 pairs the 1st/2nd-order singlestep updates (lower/higher);
    order=3 pairs 2nd/3rd.  The controller is a ``lax.while_loop`` whose
    carry holds (x, lambda_s, h, step); schedule lookups run on device
    (jnp.interp over the discrete grid).
    """
    if order not in (2, 3):
        raise ValueError(order)
    t_0 = (1.0 / ns.total_N) if t_end is None else t_end
    t_T = ns.T if t_start is None else t_start
    log_mean, alpha, std, lam_fn, inv_lambda = _jnp_schedule(ns)
    n = x.shape[0]
    total_N = ns.total_N

    def eval_x0(xv, t_cont):
        """data-prediction model value at continuous time t (device)."""
        if ns.schedule == "discrete":
            t_m = (t_cont - 1.0 / total_N) * 1000.0
        else:
            t_m = t_cont
        eps = model_fn(xv, jnp.full((n,), 1.0, jnp.float32) * t_m)
        return (xv - std(t_cont) * eps) / alpha(t_cont)

    def update1(xv, s, t, m_s):
        h = lam_fn(t) - lam_fn(s)
        return (std(t) / std(s)) * xv - alpha(t) * jnp.expm1(-h) * m_s

    def update2(xv, s, t, m_s, return_mid=False):
        r1 = 0.5
        h = lam_fn(t) - lam_fn(s)
        s1 = inv_lambda(lam_fn(s) + r1 * h)
        x_s1 = (std(s1) / std(s)) * xv - alpha(s1) * jnp.expm1(-r1 * h) * m_s
        m_s1 = eval_x0(x_s1, s1)
        phi1 = jnp.expm1(-h)
        out = (std(t) / std(s)) * xv - alpha(t) * phi1 * m_s \
            - (0.5 / r1) * alpha(t) * phi1 * (m_s1 - m_s)
        return (out, m_s1, s1) if return_mid else out

    def update3(xv, s, t, m_s, m_s1, s1_prev):
        # reuses the order-2 midpoint value like the reference's
        # lower_update-kwargs hand-off (:983-994)
        r1, r2 = 1.0 / 3.0, 2.0 / 3.0
        h = lam_fn(t) - lam_fn(s)
        s2 = inv_lambda(lam_fn(s) + r2 * h)
        phi12 = jnp.expm1(-r2 * h)
        phi22 = jnp.expm1(-r2 * h) / (r2 * h) + 1.0
        phi1 = jnp.expm1(-h)
        phi2 = phi1 / h + 1.0
        x_s2 = (std(s2) / std(s)) * xv - alpha(s2) * phi12 * m_s \
            + r2 / r1 * alpha(s2) * phi22 * (m_s1 - m_s)
        m_s2 = eval_x0(x_s2, s2)
        return (std(t) / std(s)) * xv - alpha(t) * phi1 * m_s \
            + (1.0 / r2) * alpha(t) * phi2 * (m_s2 - m_s)

    lam_0 = lam_fn(jnp.float32(t_0))

    def cond(carry):
        xv, lam_s, h, k, _ = carry
        return jnp.logical_and(lam_s < lam_0 - 1e-5, k < max_steps)

    def body(carry):
        xv, lam_s, h, k, x_prev = carry
        s = inv_lambda(lam_s)
        t = inv_lambda(jnp.minimum(lam_s + h, lam_0))
        m_s = eval_x0(xv, s)
        if order == 2:
            x_lower = update1(xv, s, t, m_s)
            x_higher = update2(xv, s, t, m_s)
        else:
            x_lower, m_s1, s1 = update2(xv, s, t, m_s, return_mid=True)
            # order-3 midpoint ratios differ; the reference re-derives the
            # r1=1/3 midpoint inside the higher update — do the same
            r1 = 1.0 / 3.0
            hh = lam_fn(t) - lam_fn(s)
            s1b = inv_lambda(lam_fn(s) + r1 * hh)
            x_s1b = (std(s1b) / std(s)) * xv \
                - alpha(s1b) * jnp.expm1(-r1 * hh) * m_s
            m_s1b = eval_x0(x_s1b, s1b)
            x_higher = update3(xv, s, t, m_s, m_s1b, s1b)
        delta = jnp.maximum(atol, rtol * jnp.maximum(jnp.abs(x_lower),
                                                     jnp.abs(x_prev)))
        E = jnp.sqrt(jnp.mean(((x_higher - x_lower) / delta) ** 2))
        accept = E <= 1.0
        xv = jnp.where(accept, x_higher, xv)
        x_prev = jnp.where(accept, x_lower, x_prev)
        lam_s = jnp.where(accept, lam_fn(t), lam_s)
        h = jnp.minimum(theta * h * E ** (-1.0 / order), lam_0 - lam_s)
        return (xv, lam_s, h, k + 1, x_prev)

    lam_T = lam_fn(jnp.float32(t_T))
    out = jax.lax.while_loop(
        cond, body, (x, lam_T, jnp.float32(h_init), jnp.int32(0), x))
    return out[0]
