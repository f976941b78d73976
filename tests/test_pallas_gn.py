"""Fused GroupNorm kernel (ops/pallas_gn.py) and GNorm module parity."""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import pytest

from eda_dm_tpu.ops.pallas_gn import (fused_gn_applicable, gn_norm,
                                      gn_swish_int8)
from eda_dm_tpu.nn.layers import GNorm, _quantize_act_int8, swish


def _ref_gn(x, scale, bias, num_groups=32, eps=1e-6):
    return nn.GroupNorm(num_groups=num_groups, epsilon=eps).apply(
        {"params": {"scale": scale, "bias": bias}}, x)


def _rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype=jnp.float32).astype(dtype) * 2.1


def test_gn_norm_matches_flax():
    k = jax.random.PRNGKey(0)
    x = _rand(k, (3, 8, 8, 128))
    scale = jax.random.uniform(jax.random.PRNGKey(1), (128,), minval=0.5,
                               maxval=1.5)
    bias = jax.random.normal(jax.random.PRNGKey(2), (128,)) * 0.1
    out = gn_norm(x, scale, bias, interpret=True)
    ref = _ref_gn(x, scale, bias)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_gn_norm_swish():
    k = jax.random.PRNGKey(3)
    x = _rand(k, (2, 8, 8, 256))
    scale = jnp.ones((256,))
    bias = jnp.zeros((256,))
    out = gn_norm(x, scale, bias, swish=True, interpret=True)
    ref = swish(_ref_gn(x, scale, bias))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("pads", [((0, 0), (0, 0)), ((1, 1), (1, 1)),
                                  ((0, 1), (0, 1))])
def test_gn_swish_int8_matches_unfused_chain(pads):
    k = jax.random.PRNGKey(4)
    x = _rand(k, (2, 8, 8, 128))
    scale = jax.random.uniform(jax.random.PRNGKey(5), (128,), minval=0.5,
                               maxval=1.5)
    bias = jax.random.normal(jax.random.PRNGKey(6), (128,)) * 0.1
    d = jnp.asarray(0.043)
    zp = jnp.asarray(57.0)
    codes, c = gn_swish_int8(x, scale, bias, d, zp, 256, pads,
                             interpret=True)

    y = swish(_ref_gn(x, scale, bias))
    y = jnp.pad(y, ((0, 0), pads[0], pads[1], (0, 0)))
    ref_codes, ref_c = _quantize_act_int8(y, d, zp, 256)
    assert float(c) == float(ref_c)
    diff = np.abs(codes.astype(np.int32) - np.asarray(ref_codes, np.int32))
    # f32 associativity can flip a code sitting exactly on a rounding
    # boundary; anything beyond ±1 on more than 0.1% of elements is a bug
    assert diff.max() <= 1
    assert (diff != 0).mean() < 1e-3


def test_gn_swish_int8_pad_rim_is_zero_code():
    x = _rand(jax.random.PRNGKey(7), (1, 8, 8, 128))
    d, zp = jnp.asarray(0.05), jnp.asarray(30.0)
    codes, c = gn_swish_int8(x, jnp.ones((128,)), jnp.zeros((128,)),
                             d, zp, 256, ((1, 1), (1, 1)), interpret=True)
    assert codes.shape == (1, 10, 10, 128)
    rim = np.asarray(codes[0, 0, :, :])
    assert (rim == int(-float(c))).all()


def test_fused_gn_applicable_gate():
    assert fused_gn_applicable(32, 32, 128)
    assert fused_gn_applicable(16, 16, 512)
    assert not fused_gn_applicable(32, 32, 224)      # lane-misaligned (LDM)
    assert not fused_gn_applicable(64, 64, 448)
    assert not fused_gn_applicable(3, 3, 128)        # hw % 8


def test_gnorm_module_matches_flax_groupnorm_f32():
    x = _rand(jax.random.PRNGKey(8), (2, 8, 8, 128))
    scale = jax.random.uniform(jax.random.PRNGKey(9), (128,), minval=0.5,
                               maxval=1.5)
    bias = jax.random.normal(jax.random.PRNGKey(10), (128,)) * 0.1
    out = GNorm().apply({"params": {"scale": scale, "bias": bias}}, x)
    ref = _ref_gn(x, scale, bias)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)
    assert out.dtype == jnp.float32


def test_gnorm_keeps_carrier_dtype():
    """nn.GroupNorm(dtype=None) promotes bf16→f32; GNorm must not (the
    serving carrier stays bf16 through every norm)."""
    x = _rand(jax.random.PRNGKey(11), (2, 4, 4, 64), jnp.bfloat16)
    out = GNorm().apply({"params": {"scale": jnp.ones((64,)),
                                    "bias": jnp.zeros((64,))}}, x)
    assert out.dtype == jnp.bfloat16
    ref = _ref_gn(x.astype(jnp.float32), jnp.ones((64,)), jnp.zeros((64,)))
    np.testing.assert_allclose(out.astype(jnp.float32), ref, rtol=2e-2,
                               atol=2e-2)


@pytest.mark.slow
def test_ddpm_int8_serving_fused_gn_matches_unfused(monkeypatch):
    """Whole-model gate: EDM_FUSED_GN on vs off on the int8 serving path."""
    import os
    from eda_dm_tpu.models.ddpm_unet import DDPMUNet, DDPMConfig
    from eda_dm_tpu.quant import QuantConfig, QuantMode, FP
    from eda_dm_tpu.quant.export import export_serving_int8, DEPLOY_INT8

    cfg = DDPMConfig(ch=128, ch_mult=(1,), num_res_blocks=1,
                     attn_resolutions=(16,), resolution=16)
    qc = QuantConfig(weight_bit=4, act_bit=8)
    model = DDPMUNet(cfg=cfg, qc=qc)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 16, 3))
    t = jnp.full((2,), 10.0)
    variables = model.init(key, x, t, FP)
    _, upd = model.apply(variables, x, t,
                         QuantMode(w_quant=True, calib_w=True),
                         mutable=["quant"])
    variables = {**variables, "quant": upd["quant"]}
    _, upd = model.apply(variables, x, t,
                         QuantMode(w_quant=True, a_quant=True, calib_a=True),
                         mutable=["quant"])
    variables = {**variables, "quant": upd["quant"]}
    serving = export_serving_int8(variables, qc)

    from eda_dm_tpu.quant.config import QuantMode as QM
    waq = model.apply(variables, x, t,
                      QuantMode(w_quant=True, a_quant=True))

    monkeypatch.setenv("EDM_FUSED_GN", "0")
    ref = model.apply(serving, x, t, DEPLOY_INT8)
    monkeypatch.setenv("EDM_FUSED_GN", "1")
    out = model.apply(serving, x, t, DEPLOY_INT8)

    # the two int8 paths may differ by single-code flips on exact rounding
    # ties (a 1e-6 GN reordering perturbation decides a .5 boundary; both
    # roundings are equally valid quantizations) which attention smears —
    # the contract is that the fused path serves the *same quantized
    # model*: no further from the fake-quant ground truth than the unfused
    # path, and elementwise within ~1 act LSB of it
    err_fused = np.abs(np.asarray(out, np.float32) - np.asarray(waq))
    err_unfused = np.abs(np.asarray(ref, np.float32) - np.asarray(waq))
    assert err_fused.mean() <= err_unfused.mean() * 1.2 + 1e-4
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=0.1)
    assert np.abs(np.asarray(out, np.float32)
                  - np.asarray(ref, np.float32)).mean() < 1e-2


def _calib_ldm_resblock(out_ch, in_shape, use_scale_shift=False):
    from eda_dm_tpu.models.ldm_unet import ResBlockL
    from eda_dm_tpu.quant import QuantConfig, QuantMode, FP
    from eda_dm_tpu.quant.export import export_serving_int8

    qc = QuantConfig(weight_bit=4, act_bit=8)
    blk = ResBlockL(out_ch, qc.wq, qc.aq, use_scale_shift_norm=use_scale_shift)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, in_shape) * 1.4 + 0.2
    emb = jax.random.normal(key, (in_shape[0], 4 * out_ch))
    variables = blk.init(key, x, emb, FP)
    _, upd = blk.apply(variables, x, emb,
                       QuantMode(w_quant=True, calib_w=True),
                       mutable=["quant"])
    variables = {**variables, "quant": upd["quant"]}
    _, upd = blk.apply(variables, x, emb,
                       QuantMode(w_quant=True, a_quant=True, calib_a=True),
                       mutable=["quant"])
    variables = {**variables, "quant": upd["quant"]}
    return blk, export_serving_int8(variables, qc), x, emb


@pytest.mark.parametrize("c", [128, 224])
def test_ldm_resblock_fused_gn_matches_unfused(monkeypatch, c):
    """LDM ResBlock int8 serving with fused GN == unfused (224 exercises
    the narrow-lane path behind EDM_FUSED_GN_NARROW)."""
    from eda_dm_tpu.quant.export import DEPLOY_INT8

    blk, serving, x, emb = _calib_ldm_resblock(c, (2, 8, 8, c))
    monkeypatch.setenv("EDM_FUSED_GN_NARROW", "1")
    monkeypatch.setenv("EDM_FUSED_GN", "0")
    ref = blk.apply(serving, x, emb, DEPLOY_INT8)
    monkeypatch.setenv("EDM_FUSED_GN", "1")
    out = blk.apply(serving, x, emb, DEPLOY_INT8)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=1e-5, atol=1e-5)


def test_ldm_attention_block_fused_gn(monkeypatch):
    from eda_dm_tpu.models.ldm_unet import AttentionBlockL
    from eda_dm_tpu.quant import QuantConfig, QuantMode, FP
    from eda_dm_tpu.quant.export import export_serving_int8, DEPLOY_INT8

    qc = QuantConfig(weight_bit=4, act_bit=8)
    blk = AttentionBlockL(num_heads=4, wq=qc.wq, aq=qc.aq,
                          aq_w=qc.aq_softmax(always_zero=True))
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (2, 8, 8, 128))
    variables = blk.init(key, x, FP)
    _, upd = blk.apply(variables, x, QuantMode(w_quant=True, calib_w=True),
                       mutable=["quant"])
    variables = {**variables, "quant": upd["quant"]}
    _, upd = blk.apply(variables, x,
                       QuantMode(w_quant=True, a_quant=True, calib_a=True),
                       mutable=["quant"])
    variables = {**variables, "quant": upd["quant"]}
    serving = export_serving_int8(variables, qc)
    monkeypatch.setenv("EDM_FUSED_GN", "0")
    ref = blk.apply(serving, x, DEPLOY_INT8)
    monkeypatch.setenv("EDM_FUSED_GN", "1")
    out = blk.apply(serving, x, DEPLOY_INT8)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=1e-4, atol=1e-4)
