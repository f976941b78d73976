"""Latent-diffusion samplers: LDM DDIM and PLMS as ``lax.scan``.

Rebuild of /root/reference/ldm/models/diffusion/ddim.py (schedule build
:25-54, ddim_sampling :129-183, p_sample_ddim :186-242) and plms.py
(pseudo-linear-multistep orders 1-4, :208-280), plus the CFG double-batch
(ddim.py:194-210) and the DDIM_control variant's cond/uncond recording
(ddim_control.py:160-194).  The per-step python loop with host-side
intermediates becomes one scan whose stacked outputs replace the
``intermediates`` dict and the mid-block feature hook.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def make_beta_schedule(schedule: str, n_timestep: int,
                       linear_start: float = 1e-4, linear_end: float = 2e-2,
                       cosine_s: float = 8e-3) -> np.ndarray:
    """ldm/modules/diffusionmodules/util.py:20-43 (float64 → float32)."""
    if schedule == "linear":
        betas = np.linspace(linear_start ** 0.5, linear_end ** 0.5,
                            n_timestep, dtype=np.float64) ** 2
    elif schedule == "cosine":
        ts = np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s
        al = np.cos(ts / (1 + cosine_s) * np.pi / 2) ** 2
        al = al / al[0]
        betas = np.clip(1 - al[1:] / al[:-1], 0, 0.999)
    elif schedule == "sqrt_linear":
        betas = np.linspace(linear_start, linear_end, n_timestep,
                            dtype=np.float64)
    elif schedule == "sqrt":
        betas = np.linspace(linear_start, linear_end, n_timestep,
                            dtype=np.float64) ** 0.5
    else:
        raise ValueError(schedule)
    return betas.astype(np.float32)


@dataclasses.dataclass
class LDMSchedule:
    """DDIM sub-schedule buffers (ddim.py:25-54)."""
    betas: np.ndarray
    alphas_cumprod: np.ndarray
    ddim_timesteps: np.ndarray         # ascending, +1 offset applied
    ddim_alphas: np.ndarray
    ddim_alphas_prev: np.ndarray
    ddim_sigmas: np.ndarray
    ddim_sqrt_one_minus_alphas: np.ndarray

    @property
    def num_steps(self) -> int:
        return len(self.ddim_timesteps)


def make_ldm_schedule(num_timesteps: int = 1000, linear_start: float = 0.0015,
                      linear_end: float = 0.0195, ddim_steps: int = 200,
                      eta: float = 0.0, discretize: str = "uniform",
                      schedule: str = "linear") -> LDMSchedule:
    """make_ddim_timesteps + make_ddim_sampling_parameters
    (ldm/modules/diffusionmodules/util.py:46-75)."""
    betas = make_beta_schedule(schedule, num_timesteps,
                               linear_start=linear_start,
                               linear_end=linear_end)
    alphas_cumprod = np.cumprod(1.0 - betas.astype(np.float64)).astype(
        np.float32)
    if discretize == "uniform":
        c = num_timesteps // ddim_steps
        dt = np.arange(0, num_timesteps, c)
    elif discretize == "quad":
        dt = (np.linspace(0, np.sqrt(num_timesteps * 0.8),
                          ddim_steps) ** 2).astype(int)
    else:
        raise NotImplementedError(discretize)
    dt = dt + 1                                      # util.py:57-58
    al = alphas_cumprod[dt]
    al_prev = np.concatenate([[alphas_cumprod[0]], alphas_cumprod[dt[:-1]]])
    sigmas = eta * np.sqrt((1 - al_prev) / (1 - al) * (1 - al / al_prev))
    return LDMSchedule(
        betas=betas, alphas_cumprod=alphas_cumprod,
        ddim_timesteps=dt.astype(np.int32),
        ddim_alphas=al.astype(np.float32),
        ddim_alphas_prev=al_prev.astype(np.float32),
        ddim_sigmas=sigmas.astype(np.float32),
        ddim_sqrt_one_minus_alphas=np.sqrt(1.0 - al).astype(np.float32))


def cfg_model_fn(apply_fn: Callable, cond, uncond, scale: float) -> Callable:
    """Classifier-free-guidance wrapper: one doubled-batch model call
    (ddim.py:194-210); eps = e_uncond + scale * (e_cond - e_uncond)."""
    if uncond is None or scale == 1.0:
        return lambda x, t: apply_fn(x, t, cond)

    def fn(x, t):
        x_in = jnp.concatenate([x, x])
        t_in = jnp.concatenate([t, t])
        c_in = jax.tree.map(lambda u, c: jnp.concatenate([u, c]), uncond, cond)
        e = apply_fn(x_in, t_in, c_in)
        e_uncond, e_cond = jnp.split(e, 2)
        return e_uncond + scale * (e_cond - e_uncond)
    return fn


def ddim_update(x, e_t, a_t, a_prev, sigma_t, sqrt_one_minus_at, noise):
    """One p_sample_ddim update (ddim.py:228-242)."""
    pred_x0 = (x - sqrt_one_minus_at * e_t) / jnp.sqrt(a_t)
    dir_xt = jnp.sqrt(1.0 - a_prev - sigma_t ** 2) * e_t
    return jnp.sqrt(a_prev) * pred_x0 + dir_xt + sigma_t * noise, pred_x0


def ldm_ddim_sample(x_T: jnp.ndarray, sched: LDMSchedule, model_fn: Callable,
                    key: Optional[jax.Array] = None,
                    record_xt: bool = False,
                    model_returns_aux: bool = False):
    """Full reverse DDIM over the sub-schedule (ddim_sampling, ddim.py:129-183).

    model_fn(x, t) -> eps (CFG already folded in via cfg_model_fn); with
    ``model_returns_aux`` it returns (eps, aux) recorded per step.  Stacked
    per-step outputs carry x_t (the ``x_inter``/calibration trajectory), the
    integer timestep ts and the DDIM index (needed by quantized replay,
    ddim.py:101-106 / calibration.py:175-176).
    """
    S = sched.num_steps
    steps = jnp.asarray(sched.ddim_timesteps[::-1].copy())       # descending
    n = x_T.shape[0]
    if key is None:
        key = jax.random.PRNGKey(0)
    al = jnp.asarray(sched.ddim_alphas)
    al_prev = jnp.asarray(sched.ddim_alphas_prev)
    sig = jnp.asarray(sched.ddim_sigmas)
    som = jnp.asarray(sched.ddim_sqrt_one_minus_alphas)

    def body(carry, i):
        x, key = carry
        step = steps[i]
        index = S - 1 - i
        t = jnp.full((n,), step, jnp.float32)
        if model_returns_aux:
            e_t, aux = model_fn(x, t)
        else:
            e_t, aux = model_fn(x, t), None
        ys = {}
        if record_xt:
            ys.update(x=x, t=step, index=index)
        if model_returns_aux:
            ys["aux"] = aux
        key, sub = jax.random.split(key)
        noise = jax.random.normal(sub, x.shape, x.dtype)
        x, _ = ddim_update(x, e_t, al[index], al_prev[index], sig[index],
                           som[index], noise)
        return (x, key), (ys if ys else None)

    (x0, _), aux = jax.lax.scan(body, (x_T, key), jnp.arange(S))
    return x0, aux


def ldm_plms_sample(x_T: jnp.ndarray, sched: LDMSchedule, model_fn: Callable,
                    key: Optional[jax.Array] = None,
                    record_xt: bool = False,
                    model_returns_aux: bool = False):
    """PLMS sampling (plms.py:155-280): Adams-Bashforth multistep over eps
    with a pseudo-improved-Euler first step.

    The old-eps window is a fixed (3, ...) carry; the order switch is a
    ``lax.switch`` on the step counter.  Stacked outputs additionally record
    ts_next (needed by the COCO calib set, calibration.py:638).
    """
    S = sched.num_steps
    steps = jnp.asarray(sched.ddim_timesteps[::-1].copy())
    n = x_T.shape[0]
    if key is None:
        key = jax.random.PRNGKey(0)
    al = jnp.asarray(sched.ddim_alphas)
    al_prev = jnp.asarray(sched.ddim_alphas_prev)
    sig = jnp.asarray(sched.ddim_sigmas)
    som = jnp.asarray(sched.ddim_sqrt_one_minus_alphas)

    def model(x, t):
        if model_returns_aux:
            return model_fn(x, t)
        return model_fn(x, t), None

    def update(x, e, index, noise):
        return ddim_update(x, e, al[index], al_prev[index], sig[index],
                           som[index], noise)

    def body(carry, i):
        x, old_eps, key = carry               # old_eps: (3, ...) newest last
        step = steps[i]
        step_next = steps[jnp.minimum(i + 1, S - 1)]
        index = S - 1 - i
        t = jnp.full((n,), step, jnp.float32)
        t_next = jnp.full((n,), step_next, jnp.float32)
        e_t, aux = model(x, t)
        key, k1, k2 = jax.random.split(key, 3)
        noise = jax.random.normal(k1, x.shape, x.dtype)

        def order1(_):
            # pseudo improved Euler: eval the model once more at x_prev
            x_prev, _ = update(x, e_t, index, noise)
            e_next, _ = model(x_prev, t_next)
            return (e_t + e_next) / 2.0

        def order2(_):
            return (3.0 * e_t - old_eps[2]) / 2.0

        def order3(_):
            return (23.0 * e_t - 16.0 * old_eps[2] + 5.0 * old_eps[1]) / 12.0

        def order4(_):
            return (55.0 * e_t - 59.0 * old_eps[2] + 37.0 * old_eps[1]
                    - 9.0 * old_eps[0]) / 24.0

        e_prime = jax.lax.switch(jnp.minimum(i, 3),
                                 [order1, order2, order3, order4], None)
        x_new, _ = update(x, e_prime, index, noise)
        old_eps = jnp.concatenate([old_eps[1:], e_t[None]], axis=0)
        ys = {}
        if record_xt:
            ys.update(x=x, t=step, index=index, t_next=step_next)
        if model_returns_aux:
            ys["aux"] = aux
        return (x_new, old_eps, key), (ys if ys else None)

    old0 = jnp.zeros((3,) + x_T.shape, x_T.dtype)
    (x0, _, _), aux = jax.lax.scan(body, (x_T, old0, key), jnp.arange(S))
    return x0, aux
