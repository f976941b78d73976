"""AdaRound adaptive rounding in functional form.

Reference: ``AdaRoundQuantizer`` (/root/reference/qdiff/adaptive_rounding.py:9-78).
Instead of swapping a module in place, the rounding variable ``alpha`` is a
weight-shaped array carried in the 'quant' collection; soft vs hard rounding
is selected statically (``QuantMode.soft_targets``).  ``alpha`` is initialized
so hard rounding coincides with round-to-nearest, which makes the un-swapped
"plain quantizer" of the reference unnecessary: every weight quantizer is an
AdaRound quantizer from scale-init onward.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

GAMMA, ZETA = -0.1, 1.1


def soft_targets(alpha: jnp.ndarray) -> jnp.ndarray:
    """Rectified-sigmoid h(alpha) in [0, 1] (adaptive_rounding.py:63-64)."""
    return jnp.clip(jax.nn.sigmoid(alpha) * (ZETA - GAMMA) + GAMMA, 0.0, 1.0)


_soft = soft_targets


def init_alpha(w: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """Invert the rectified sigmoid so h(alpha) equals the rounding residue.

    Reference: ``init_alpha`` (adaptive_rounding.py:66-74).
    """
    rest = w / delta - jnp.floor(w / delta)            # [0, 1)
    # with gamma=-0.1, zeta=1.1 the argument stays in (0.0909, 11] — no clipping
    return -jnp.log((ZETA - GAMMA) / (rest - GAMMA) - 1.0)


def adaround_fake_quant(w: jnp.ndarray, delta: jnp.ndarray,
                        zero_point: jnp.ndarray, alpha: jnp.ndarray,
                        n_levels: int, soft: bool) -> jnp.ndarray:
    """Weight fake-quant with learned rounding (adaptive_rounding.py:49-61).

    soft=True  → floor + h(alpha)   (differentiable w.r.t. alpha)
    soft=False → floor + (alpha>=0) (deployment rounding)
    """
    w_floor = jnp.floor(w / delta)
    if soft:
        w_int = w_floor + _soft(alpha)
    else:
        w_int = w_floor + (alpha >= 0).astype(w.dtype)
    w_quant = jnp.clip(w_int + zero_point, 0.0, n_levels - 1)
    return (w_quant - zero_point) * delta


def adaround_int(w: jnp.ndarray, delta: jnp.ndarray,
                 zero_point: jnp.ndarray, alpha: jnp.ndarray,
                 n_levels: int) -> jnp.ndarray:
    """Centered integer codes of the hard-rounded weights.

    Returns ``clip(floor(w/Δ) + (α≥0) + zp, 0, L-1) − zp`` — the exact
    integers whose per-channel dequantization ``q·Δ`` equals
    :func:`adaround_fake_quant` with ``soft=False``.  Serving-side int8
    kernels consume these directly (|q| ≤ L−1 ≤ 255, int8-safe for the
    W4/W8 configs because the centered range spans at most L values).
    """
    w_int = jnp.floor(w / delta) + (alpha >= 0).astype(w.dtype)
    return jnp.clip(w_int + zero_point, 0.0, n_levels - 1) - zero_point


def round_regularization(alpha: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """f_reg = sum(1 - |2h-1|^b), the rounding relaxation penalty.

    Reference: block_recon.py:288-291 (disabled by default, loss_mode='none',
    but part of the public surface).
    """
    h = _soft(alpha)
    return jnp.sum(1.0 - jnp.abs((h - 0.5) * 2.0) ** b)
