"""Fused int8 attention kernel vs the unfused serving chain
(int8_code_einsum -> softmax_int8_codes -> int8_code_einsum)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from eda_dm_tpu.ops.int8_einsum import quantize_act_int8, int8_code_einsum
from eda_dm_tpu.ops.pallas_softmax import softmax_int8_codes
from eda_dm_tpu.ops.pallas_attention import (int8_fused_attention,
                                             fused_attention_applicable)


def _unfused(Q, cq, dq, K, ck, dk, V, cv, dv, scale, dw, zw, n_lv):
    w = int8_code_einsum("nic,njc->nij", Q, cq, dq, K, ck, dk) * scale
    W, cw = softmax_int8_codes(w, dw, zw, n_lv, interpret=True)
    return int8_code_einsum("nij,njc->nic", W, cw, dw, V, cv, dv)


@pytest.mark.parametrize("s,c", [(64, 128), (256, 128), (32, 256)])
def test_fused_matches_unfused(s, c):
    assert fused_attention_applicable(s, c)
    rng = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(rng, 3)
    b = 3
    q = jax.random.normal(kq, (b, s, c))
    k = jax.random.normal(kk, (b, s, c)) * 0.8
    v = jax.random.normal(kv, (b, s, c)) * 1.2
    dq, zq = jnp.float32(0.021), jnp.float32(130.0)
    dk, zk = jnp.float32(0.017), jnp.float32(122.0)
    dv, zv = jnp.float32(0.025), jnp.float32(127.0)
    n_lv_act = 256
    Q, cq = quantize_act_int8(q, dq, zq, n_lv_act)
    K, ck = quantize_act_int8(k, dk, zk, n_lv_act)
    V, cv = quantize_act_int8(v, dv, zv, n_lv_act)
    scale = float(c) ** -0.5
    dw, zw, n_lv_w = jnp.float32(1.0 / 255.0), jnp.float32(0.0), 256

    ref = _unfused(Q, cq, dq, K, ck, dk, V, cv, dv, scale, dw, zw, n_lv_w)
    out = int8_fused_attention(Q, cq, dq, K, ck, dk, V, cv, dv, scale,
                               dw, zw, n_lv_w, interpret=True)
    assert out.shape == ref.shape and out.dtype == jnp.float32
    # identical code arithmetic; only f32 epilogue association differs
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_applicability_gate():
    assert fused_attention_applicable(1024, 128)
    assert not fused_attention_applicable(4096, 128)   # logits exceed VMEM
    assert not fused_attention_applicable(256, 64)     # sub-lane head dim
    assert not fused_attention_applicable(77, 128)     # ragged token count


def test_fused_attention_under_jit_and_vmap_batch():
    s, c = 64, 128
    rng = jax.random.PRNGKey(1)
    q = jax.random.normal(rng, (5, s, c))
    dq, zq = jnp.float32(0.02), jnp.float32(128.0)
    Q, cq = quantize_act_int8(q, dq, zq, 256)
    dw, zw = jnp.float32(1 / 255.0), jnp.float32(0.0)
    fn = jax.jit(lambda A: int8_fused_attention(
        A, cq, dq, A, cq, dq, A, cq, dq, float(c) ** -0.5,
        dw, zw, 256, interpret=True))
    out = fn(Q)
    assert np.isfinite(np.asarray(out)).all()
    # rows of the probability simplex: output within the value range
    assert np.abs(np.asarray(out)).max() < np.abs(
        (np.asarray(Q, np.float32) + float(cq)) * float(dq)).max() * 1.5


def test_heads_layout_matches_unfused_ldm_chain():
    """(B,T,H,C) layout vs the LDM legacy chain bthc,bshc->bhts → softmax
    codes → bhts,bshc->bthc, at a narrow (64-lane) head width."""
    from eda_dm_tpu.ops.pallas_attention import int8_fused_attention_heads
    b, s, h, c = 2, 64, 3, 64
    rng = jax.random.PRNGKey(3)
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (b, s, h, c))
    k = jax.random.normal(kk, (b, s, h, c)) * 0.7
    v = jax.random.normal(kv, (b, s, h, c)) * 1.1
    dq, zq = jnp.float32(0.02), jnp.float32(131.0)
    dk, zk = jnp.float32(0.018), jnp.float32(125.0)
    dv, zv = jnp.float32(0.024), jnp.float32(129.0)
    Q, cq = quantize_act_int8(q, dq, zq, 256)
    K, ck = quantize_act_int8(k, dk, zk, 256)
    V, cv = quantize_act_int8(v, dv, zv, 256)
    dw, zw, n_lv = jnp.float32(1 / 255.0), jnp.float32(0.0), 256

    w = int8_code_einsum("bthc,bshc->bhts", Q, cq, dq, K, ck, dk)
    W, cw = softmax_int8_codes(w, dw, zw, n_lv, interpret=True)
    ref = int8_code_einsum("bhts,bshc->bthc", W, cw, dw, V, cv, dv)

    out = int8_fused_attention_heads(Q, cq, dq, K, ck, dk, V, cv, dv, 1.0,
                                     dw, zw, n_lv, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
