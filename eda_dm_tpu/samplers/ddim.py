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
                      capture_fn: Optional[Callable] = None):
    """Run the full reverse DDIM trajectory.

    model_fn(x, t) -> eps prediction (t float32, shape (N,)).
    Returns (x_0, aux) where aux stacks per-step values when ``capture_fn``
    is given: capture_fn(x, t) -> pytree to record at every step *input*
    (matching the reference's xs[:-1] / per-step hook captures,
    scripts/calibration.py:29-42).
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
        aux = capture_fn(x, t) if capture_fn is not None else None
        et = model_fn(x, t)
        key, sub = jax.random.split(key)
        noise = jax.random.normal(sub, x.shape, x.dtype)
        x_next, _ = ddim_denoise_step(x, et, at, at_next, eta, noise)
        return (x_next, key), aux

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
