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


# ---------------------------------------------------------------------------
# two-pass tiled ("flash") kernel
# ---------------------------------------------------------------------------

def _unfused_heads_chain(q, k, v, dq, zq, dk, zk, dv, zv, dw, zw, scale,
                         n_levels=256, n_levels_w=256):
    from eda_dm_tpu.ops.int8_einsum import int8_code_einsum, quantize_act_int8
    from eda_dm_tpu.ops.pallas_softmax import softmax_int8_codes
    Qc, cq = quantize_act_int8(q, dq, zq, n_levels)
    Kc, ck = quantize_act_int8(k, dk, zk, n_levels)
    w = int8_code_einsum("bthc,bshc->bhts", Qc, cq, dq, Kc, ck, dk) * scale
    W, cw = softmax_int8_codes(w, dw, zw, n_levels_w, interpret=True)
    V, cv = quantize_act_int8(v, dv, zv, n_levels)
    return int8_code_einsum("bhts,bshc->bthc", W, cw, dw, V, cv, dv)


@pytest.mark.parametrize("sq,skv,h,c", [(256, 256, 2, 128),
                                        (128, 256, 2, 32),
                                        (512, 512, 1, 64)])
def test_flash_attention_matches_unfused(sq, skv, h, c):
    from eda_dm_tpu.ops.pallas_attention import int8_flash_attention_heads
    from eda_dm_tpu.ops.int8_einsum import quantize_act_int8

    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (2, sq, h, c)) * 0.4
    k = jax.random.normal(jax.random.PRNGKey(1), (2, skv, h, c)) * 0.4
    v = jax.random.normal(jax.random.PRNGKey(2), (2, skv, h, c)) * 0.6
    dq, zq = jnp.asarray(0.01), jnp.asarray(120.0)
    dk, zk = jnp.asarray(0.012), jnp.asarray(130.0)
    dv, zv = jnp.asarray(0.02), jnp.asarray(128.0)
    dw, zw = jnp.asarray(1 / 255.0), jnp.asarray(0.0)
    scale = c ** -0.5

    ref = _unfused_heads_chain(q, k, v, dq, zq, dk, zk, dv, zv, dw, zw,
                               scale)
    Qc, cq = quantize_act_int8(q, dq, zq, 256)
    Kc, ck = quantize_act_int8(k, dk, zk, 256)
    V, cv = quantize_act_int8(v, dv, zv, 256)
    out = int8_flash_attention_heads(Qc, cq, dq, Kc, ck, dk, V, cv, dv,
                                     scale, dw, zw, 256, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_flash_attention_sub8bit_softmax_codes():
    """sm_abit < 8 (always-zero style small-level softmax quantizer)."""
    from eda_dm_tpu.ops.pallas_attention import int8_flash_attention_heads
    from eda_dm_tpu.ops.int8_einsum import quantize_act_int8

    q = jax.random.normal(jax.random.PRNGKey(3), (1, 128, 1, 128)) * 0.3
    k = jax.random.normal(jax.random.PRNGKey(4), (1, 128, 1, 128)) * 0.3
    v = jax.random.normal(jax.random.PRNGKey(5), (1, 128, 1, 128))
    dq = dk = jnp.asarray(0.008)
    zq = zk = jnp.asarray(128.0)
    dv, zv = jnp.asarray(0.02), jnp.asarray(128.0)
    dw, zw = jnp.asarray(1 / 15.0), jnp.asarray(0.0)   # 4-bit always_zero
    ref = _unfused_heads_chain(q, k, v, dq, zq, dk, zk, dv, zv, dw, zw,
                               1.0, n_levels_w=16)
    Qc, cq = quantize_act_int8(q, dq, zq, 256)
    Kc, ck = quantize_act_int8(k, dk, zk, 256)
    V, cv = quantize_act_int8(v, dv, zv, 256)
    out = int8_flash_attention_heads(Qc, cq, dq, Kc, ck, dk, V, cv, dv,
                                     1.0, dw, zw, 16, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_cross_attention_flash_path(monkeypatch):
    """CrossAttentionL self-attention routes through the flash kernel when
    EDM_FUSED_ATTN_NARROW admits the head width, matching the unfused
    serving output."""
    from eda_dm_tpu.models.ldm_unet import CrossAttentionL
    from eda_dm_tpu.quant import QuantConfig, QuantMode, FP
    from eda_dm_tpu.quant.export import export_serving_int8, DEPLOY_INT8

    qc = QuantConfig(weight_bit=4, act_bit=8)
    blk = CrossAttentionL(heads=2, dim_head=32, out_dim=64, wq=qc.wq,
                          aq=qc.aq, aq_w=qc.aq_softmax(always_zero=True))
    key = jax.random.PRNGKey(6)
    x = jax.random.normal(key, (2, 128, 64))
    variables = blk.init(key, x, None, FP)
    _, upd = blk.apply(variables, x, None,
                       QuantMode(w_quant=True, calib_w=True),
                       mutable=["quant"])
    variables = {**variables, "quant": upd["quant"]}
    _, upd = blk.apply(variables, x, None,
                       QuantMode(w_quant=True, a_quant=True, calib_a=True),
                       mutable=["quant"])
    variables = {**variables, "quant": upd["quant"]}
    serving = export_serving_int8(variables, qc)

    monkeypatch.setenv("EDM_FUSED_ATTN_NARROW", "0")
    ref = blk.apply(serving, x, None, DEPLOY_INT8)
    monkeypatch.setenv("EDM_FUSED_ATTN_NARROW", "1")
    out = blk.apply(serving, x, None, DEPLOY_INT8)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-4, atol=2e-4)
