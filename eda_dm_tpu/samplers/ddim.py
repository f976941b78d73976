"""Pixel-space DDIM / DDPM sampling loops as ``lax.scan``.

TPU-native rewrite of /root/reference/ddim/functions/denoising.py: the Python
step loop that bounces tensors between CPU and GPU (denoising.py:37-59)
becomes a single jitted scan; the calibration variant that ``yield``s every
intermediate (denoising.py:10-35) becomes the same scan with stacked per-step
outputs (x_t and an optional feature tap) — no generators, no host traffic.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .schedules import alphas_cumprod_padded


def _seq_pairs(seq: np.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(t_i, t_next_i) pairs in sampling order (descending t).

    denoising.py:13-17: seq_next = [-1] + seq[:-1], iterated reversed.
    """
    seq = np.asarray(seq)
    seq_next = np.concatenate([[-1], seq[:-1]])
    return (jnp.asarray(seq[::-1].copy(), jnp.int32),
            jnp.asarray(seq_next[::-1].copy(), jnp.int32))


def ddim_denoise_step(x, et, at, at_next, eta, noise):
    """One generalized DDIM update (denoising.py:22-30)."""
    x0 = (x - et * jnp.sqrt(1.0 - at)) / jnp.sqrt(at)
    c1 = eta * jnp.sqrt((1.0 - at / at_next) * (1.0 - at_next) / (1.0 - at))
    c2 = jnp.sqrt((1.0 - at_next) - c1 ** 2)
    return jnp.sqrt(at_next) * x0 + c1 * noise + c2 * et, x0


def generalized_steps(x: jnp.ndarray, seq, model_fn: Callable, betas,
                      eta: float = 0.0, key: Optional[jax.Array] = None,
                      capture_fn: Optional[Callable] = None,
                      record_xt: bool = False,
                      model_returns_aux: bool = False):
    """Run the full reverse DDIM trajectory.

    model_fn(x, t) -> eps prediction (t float32, shape (N,)); with
    ``model_returns_aux`` it returns (eps, aux) and aux is stacked per step —
    one fused forward replaces the reference's separate feature hook
    (scripts/calibration.py:28-42).  ``record_xt`` stacks every step *input*
    x_t (the reference's ``all_sample = xs[:-1]``) and the integer timestep.
    ``capture_fn(x, t) -> pytree`` records arbitrary extras.
    Returns (x_0, per-step dict or None).
    """
    alphas = alphas_cumprod_padded(betas)
    ts, ts_next = _seq_pairs(seq)
    n = x.shape[0]
    if key is None:
        key = jax.random.PRNGKey(0)

    def body(carry, step):
        x, key = carry
        i, j = step
        t = jnp.full((n,), i, jnp.float32)
        at = alphas[i + 1]
        at_next = alphas[j + 1]
        if model_returns_aux:
            et, aux = model_fn(x, t)
        else:
            et, aux = model_fn(x, t), None
        ys = {}
        if record_xt:
            ys["x"] = x
            ys["t"] = i
        if model_returns_aux:
            ys["aux"] = aux
        if capture_fn is not None:
            ys["extra"] = capture_fn(x, t)
        key, sub = jax.random.split(key)
        noise = jax.random.normal(sub, x.shape, x.dtype)
        x_next, _ = ddim_denoise_step(x, et, at, at_next, eta, noise)
        return (x_next, key), (ys if ys else None)

    (x_final, _), aux = jax.lax.scan(body, (x, key), (ts, ts_next))
    return x_final, aux


def ddpm_steps(x: jnp.ndarray, seq, model_fn: Callable, betas,
               key: Optional[jax.Array] = None):
    """Ancestral DDPM sampling over a timestep subset (denoising.py:61-93)."""
    alphas = alphas_cumprod_padded(betas)
    ts, ts_next = _seq_pairs(seq)
    n = x.shape[0]
    if key is None:
        key = jax.random.PRNGKey(0)

    def body(carry, step):
        x, key = carry
        i, j = step
        t = jnp.full((n,), i, jnp.float32)
        at = alphas[i + 1]
        atm1 = alphas[j + 1]
        beta_t = 1.0 - at / atm1
        e = model_fn(x, t)
        x0 = jnp.clip(jnp.sqrt(1.0 / at) * x - jnp.sqrt(1.0 / at - 1.0) * e,
                      -1.0, 1.0)
        mean = (jnp.sqrt(atm1) * beta_t * x0 +
                jnp.sqrt(1.0 - beta_t) * (1.0 - atm1) * x) / (1.0 - at)
        key, sub = jax.random.split(key)
        noise = jax.random.normal(sub, x.shape, x.dtype)
        mask = (i != 0).astype(x.dtype)
        sample = mean + mask * jnp.exp(0.5 * jnp.log(beta_t)) * noise
        return (sample, key), None

    (x_final, _), _ = jax.lax.scan(body, (x, key), (ts, ts_next))
    return x_final
