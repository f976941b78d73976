"""Uniform affine fake-quantization primitives.

Pure jnp functions implementing the arithmetic of the reference's
``UniformAffineQuantizer`` (/root/reference/qdiff/quant_layer.py:36-357):
straight-through-estimator rounding, (scale, zero_point) computation from a
range, and the quantize→dequantize simulation.  All functions are shape
polymorphic and jit/vmap-safe; there is no hidden state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-8


def round_ste(x: jnp.ndarray) -> jnp.ndarray:
    """Round with a straight-through gradient.

    Reference: ``round_ste`` (/root/reference/qdiff/quant_layer.py:19-23).
    jnp.round matches torch.round (round-half-to-even).
    """
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def lp_loss(pred: jnp.ndarray, tgt: jnp.ndarray, p: float = 2.0,
            channel_axis: int | None = None) -> jnp.ndarray:
    """L_p reconstruction loss.

    Matches ``lp_loss`` (/root/reference/qdiff/quant_layer.py:26-33):
    with ``channel_axis`` given → sum over that axis, mean over the rest
    (the reference's reduction='none' sums torch dim 1 = channels);
    otherwise a plain mean over all elements (reduction='all').
    """
    err = jnp.abs(pred - tgt) ** p
    if channel_axis is None:
        return jnp.mean(err)
    return jnp.mean(jnp.sum(err, axis=channel_axis))


def calculate_qparams(x_min: jnp.ndarray, x_max: jnp.ndarray, n_levels: int,
                      always_zero: bool = False):
    """(scale, zero_point) from a clipping range.

    Reference: ``calculate_qparams`` (/root/reference/qdiff/quant_layer.py:95-105).
    The range is first widened to include zero; zero_point is an integer-valued
    float clipped to [0, n_levels-1].
    """
    min_neg = jnp.minimum(x_min, 0.0)
    max_pos = jnp.maximum(x_max, 0.0)
    scale = jnp.maximum((max_pos - min_neg) / float(n_levels - 1), EPS)
    if always_zero:
        zero_point = jnp.zeros_like(scale)
    else:
        zero_point = jnp.clip(jnp.round(-min_neg / scale), 0.0, n_levels - 1)
        # exactly symmetric ranges land on zp = (n_levels-1)/2 = x.5, where the
        # last float bit of the division decides 7-vs-8 style flips; pin the
        # canonical half-to-even result so search and deployment agree
        zero_point = jnp.where(min_neg == -max_pos,
                               jnp.full_like(zero_point, n_levels // 2),
                               zero_point)
    return scale, zero_point


def fake_quant(x: jnp.ndarray, delta: jnp.ndarray, zero_point: jnp.ndarray,
               n_levels: int) -> jnp.ndarray:
    """Quantize→dequantize with an STE gradient w.r.t. ``x`` (and ``delta``).

    Reference forward: /root/reference/qdiff/quant_layer.py:267-269.
    ``delta`` / ``zero_point`` broadcast against ``x`` (per-tensor scalars or
    per-channel shapes).

    Dtype-preserving: level boundaries are always computed in float32 (so a
    bf16 serving pass picks the same levels as the f32 calibration pass), but
    the result is returned in ``x.dtype`` — on a bf16 deployment path the
    materialized buffer stays half-width while the intermediate ops fuse in
    VPU registers.
    """
    xf = x.astype(jnp.float32)
    # algebraically identical to clip(round(x/Δ)+zp, 0, n-1)-zp (zp is an
    # integer-valued float, so folding it into the clip bounds is exact);
    # two fewer VPU ops on the serving path
    x_q = jnp.clip(round_ste(xf / delta), -zero_point,
                   n_levels - 1 - zero_point)
    return (x_q * delta).astype(x.dtype)


def fake_quant_nograd(x: jnp.ndarray, delta: jnp.ndarray, zero_point: jnp.ndarray,
                      n_levels: int) -> jnp.ndarray:
    """Same simulation with plain rounding (used inside scale searches)."""
    x_int = jnp.round(x / delta) + zero_point
    x_quant = jnp.clip(x_int, 0.0, n_levels - 1)
    return (x_quant - zero_point) * delta


def qdrop(x_fq: jnp.ndarray, x: jnp.ndarray, prob: float,
          rng: jax.Array) -> jnp.ndarray:
    """QDrop stochastic bypass: keep the quantized value with probability ``prob``.

    Reference: /root/reference/qdiff/quant_layer.py:271-274.
    """
    mask = jax.random.uniform(rng, x.shape) < prob
    return jnp.where(mask, x_fq, x)


def ema_update(running_min, running_max, x_min, x_max, momentum: float = 0.9):
    """EMA range update used by activation (leaf) quantizers.

    Reference: ``update_quantize_range`` (/root/reference/qdiff/quant_layer.py:79-85).
    Caller is responsible for seeding running_min/max with the first batch's
    values (the reference's None check).
    """
    new_min = (1.0 - momentum) * x_min + momentum * running_min
    new_max = (1.0 - momentum) * x_max + momentum * running_max
    return new_min, new_max
