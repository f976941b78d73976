"""Kill-switch gate tests for the int8 serving path.

The trace-time env gates (EDM_INT8_CONV, EDM_INT8_ATTN, EDM_INT8_ACC)
claim specific fallback semantics (nn/layers.py, ops/int8_einsum.py):
EDM_INT8_CONV=0 / EDM_INT8_ATTN=0 under ``DEPLOY_INT8`` must reproduce the
folded-bf16 ``DEPLOY`` numerics exactly (the int8 export tree carries the
folded kernels too), and EDM_INT8_ACC=f32 must stay within f32-accumulation
rounding of the exact int32 path.  These were previously unverified
(ADVICE round 3).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eda_dm_tpu.models.ddpm_unet import DDPMUNet, DDPMConfig
from eda_dm_tpu.quant import QuantConfig, QuantMode, FP
from eda_dm_tpu.quant.export import (DEPLOY, DEPLOY_INT8, export_serving_int8)


@pytest.fixture(scope="module")
def tiny_int8_setup():
    cfg = DDPMConfig(ch=64, ch_mult=(1,), num_res_blocks=1,
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
    serving8 = export_serving_int8(variables, qc)
    return model, serving8, x, t


def test_int8_conv_and_attn_killswitch_is_deploy_numerics(
        monkeypatch, tiny_int8_setup):
    """EDM_INT8_CONV=0 + EDM_INT8_ATTN=0 under DEPLOY_INT8 == DEPLOY
    bit-exactly on the same export tree (the documented fallback)."""
    model, serving8, x, t = tiny_int8_setup
    ref = model.apply(serving8, x, t, DEPLOY)

    monkeypatch.setenv("EDM_INT8_CONV", "0")
    monkeypatch.setenv("EDM_INT8_ATTN", "0")
    out = model.apply(serving8, x, t, DEPLOY_INT8)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_int8_conv_killswitch_only(monkeypatch, tiny_int8_setup):
    """EDM_INT8_CONV=0 alone keeps the attention einsums int8 but must stay
    within act-LSB noise of the folded path (the two paths serve the same
    quantized model)."""
    model, serving8, x, t = tiny_int8_setup
    ref = model.apply(serving8, x, t, DEPLOY)
    monkeypatch.setenv("EDM_INT8_CONV", "0")
    out = model.apply(serving8, x, t, DEPLOY_INT8)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=0.1)


def test_int8_acc_f32_closeness(monkeypatch, tiny_int8_setup):
    """EDM_INT8_ACC=f32 must match the exact-int32 accumulation up to f32
    partial-sum rounding (tiny contractions here: near-exact)."""
    model, serving8, x, t = tiny_int8_setup
    ref = model.apply(serving8, x, t, DEPLOY_INT8)
    monkeypatch.setenv("EDM_INT8_ACC", "f32")
    out = model.apply(serving8, x, t, DEPLOY_INT8)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=1e-3, atol=1e-2)


def test_int8_acc_invalid_value_raises(monkeypatch):
    from eda_dm_tpu.nn.layers import int8_acc_dtype
    monkeypatch.setenv("EDM_INT8_ACC", "fp32")
    with pytest.raises(ValueError):
        int8_acc_dtype()
    monkeypatch.setenv("EDM_INT8_ACC", "f32")
    assert int8_acc_dtype() == jnp.float32
    monkeypatch.delenv("EDM_INT8_ACC")
    assert int8_acc_dtype() == jnp.int32


def test_preferred_export_kind_family_policy(monkeypatch):
    """Measured round-5 policy: native int8 for conv/legacy-attention
    UNets, folded bf16 for spatial-transformer UNets (imagenet int8 row
    measured 3.1x slower than bf16-FP; PERF.md)."""
    from eda_dm_tpu.ops.serving_policy import preferred_export_kind
    monkeypatch.delenv("EDM_SERVE_KIND", raising=False)
    assert preferred_export_kind(False) == "int8"
    assert preferred_export_kind(True) == "bf16"
    from eda_dm_tpu.models.latent_diffusion import (
        bedroom_config, church_config, imagenet_config, sd_v1_config)
    assert preferred_export_kind(
        bedroom_config().unet.use_spatial_transformer) == "int8"
    assert preferred_export_kind(
        church_config().unet.use_spatial_transformer) == "int8"
    assert preferred_export_kind(
        imagenet_config().unet.use_spatial_transformer) == "bf16"
    assert preferred_export_kind(
        sd_v1_config().unet.use_spatial_transformer) == "bf16"
    monkeypatch.setenv("EDM_SERVE_KIND", "int8")
    assert preferred_export_kind(True) == "int8"
