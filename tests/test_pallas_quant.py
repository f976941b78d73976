"""Correctness of the fused int8 serving matmul (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from eda_dm_tpu.ops.pallas_quant import (quantized_matmul,
                                         pack_dense_weights,
                                         quantize_weights_int8)
from eda_dm_tpu.quant import fake_quant_nograd, weight_qparams, \
    calculate_qparams


@pytest.mark.parametrize("m,k,n", [(16, 32, 64), (8, 128, 128)])
def test_quantized_matmul_matches_fakequant(m, k, n):
    rng = np.random.RandomState(0)
    x = rng.randn(m, k).astype(np.float32)
    w = rng.randn(k, n).astype(np.float32) * 0.1
    bias = rng.randn(n).astype(np.float32)

    # activation quantizer (per-tensor affine, 8 bit)
    s_x, z_x = calculate_qparams(jnp.float32(x.min()), jnp.float32(x.max()),
                                 256)
    # weight quantizer (per-out-channel symmetric, 8 bit)
    d_w, z_w = weight_qparams(jnp.asarray(w), 256, symmetric=True,
                              channel_axis=1)

    # reference: fake-quant both operands, fp32 matmul
    x_fq = fake_quant_nograd(jnp.asarray(x), s_x, z_x, 256)
    w_fq = fake_quant_nograd(jnp.asarray(w), d_w, z_w, 256)
    ref = np.asarray(x_fq @ w_fq + bias[None, :])

    packed = pack_dense_weights(jnp.asarray(w), d_w, z_w)
    out = quantized_matmul(jnp.asarray(x), packed["w_q"], s_x, z_x,
                           packed["s_w"], packed["w_colsum"],
                           packed["w_deq_off"], bias=jnp.asarray(bias),
                           block_m=8, block_n=64, block_k=32,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_int8_weight_pack_roundtrip():
    rng = np.random.RandomState(1)
    w = rng.randn(64, 32).astype(np.float32)
    d_w, z_w = weight_qparams(jnp.asarray(w), 256, symmetric=True,
                              channel_axis=1)
    w_q, off = quantize_weights_int8(jnp.asarray(w), d_w.reshape(1, -1),
                                     z_w.reshape(1, -1))
    assert w_q.dtype == jnp.int8
    deq = w_q.astype(jnp.float32) * d_w.reshape(1, -1) + off
    ref = fake_quant_nograd(jnp.asarray(w), d_w, z_w, 256)
    np.testing.assert_allclose(np.asarray(deq), np.asarray(ref), rtol=1e-5,
                               atol=1e-6)
