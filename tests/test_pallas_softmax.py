"""Fused softmax→int8-codes kernel vs the reference chain.

Reference semantics: f32 softmax then the sm_abit quantizer
(/root/reference/qdiff/quant_block.py:145-165, quant_layer.py:267-276),
i.e. codes = clip(round(softmax(x)/Δ), −zp, L−1−zp) − (L/2 − zp).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eda_dm_tpu.ops.pallas_softmax import softmax_int8_codes
from eda_dm_tpu.ops.int8_einsum import quantize_act_int8


def _reference(logits, delta, zp, n_levels):
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return quantize_act_int8(w, delta, zp, n_levels)


@pytest.mark.parametrize("shape", [(4, 8, 128), (2, 3, 40, 256),
                                   (5, 77), (6, 64), (3, 200)])
@pytest.mark.parametrize("delta,zp", [(1.0 / 255.0, 0.0),   # always_zero
                                      (0.004, 7.0)])        # asymmetric
def test_matches_reference(shape, delta, zp):
    key = jax.random.PRNGKey(hash(shape) % (2 ** 31))
    logits = 8.0 * jax.random.normal(key, shape)
    codes, c = softmax_int8_codes(logits, delta, zp, 256, interpret=True)
    ref_codes, ref_c = _reference(logits, delta, zp, 256)
    assert codes.dtype == jnp.int8
    assert float(c) == float(ref_c)
    # identical f32 math; allow ≤1-code flips on exact rounding boundaries
    # from reduction-order differences
    diff = np.abs(codes.astype(np.int32) - np.asarray(ref_codes, np.int32))
    assert diff.max() <= 1
    assert (diff != 0).mean() < 1e-3


def test_rows_unaffected_by_padding():
    # a row whose values sit near code boundaries, S=77 (CLIP context)
    logits = jnp.linspace(-4.0, 4.0, 77)[None, :].repeat(33, axis=0)
    codes, _ = softmax_int8_codes(logits, 1.0 / 255.0, 0.0, 256,
                                  interpret=True)
    ref_codes, _ = _reference(logits, 1.0 / 255.0, 0.0, 256)
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(ref_codes))


def test_sm_6bit_levels():
    logits = 4.0 * jax.random.normal(jax.random.PRNGKey(3), (9, 130))
    codes, c = softmax_int8_codes(logits, 1.0 / 63.0, 0.0, 64,
                                  interpret=True)
    ref_codes, ref_c = _reference(logits, 1.0 / 63.0, 0.0, 64)
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(ref_codes))
    assert float(c) == float(ref_c)
