"""Deployment export: folded weights + act-only mode ≡ full fake-quant."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from eda_dm_tpu.models.ddpm_unet import DDPMUNet, DDPMConfig
from eda_dm_tpu.quant import QuantConfig, QuantMode, FP, WAQ, CALIB_W, CALIB_A
from eda_dm_tpu.quant.export import fold_quantized_weights, DEPLOY


def test_folded_deploy_matches_fakequant():
    arch = DDPMConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                      attn_resolutions=(8,), resolution=16)
    qc = QuantConfig(weight_bit=4, act_bit=8)
    model = DDPMUNet(cfg=arch, qc=qc)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (4, 16, 16, 3))
    t = jnp.full((4,), 20.0)
    variables = model.init(key, x, t, FP)
    _, upd = model.apply(variables, x, t, CALIB_W, mutable=["quant"])
    variables = {**variables, "quant": upd["quant"]}
    _, upd = model.apply(variables, x, t, CALIB_A, mutable=["quant"])
    variables = {**variables, "quant": upd["quant"]}

    ref = model.apply(variables, x, t, WAQ)
    deployed = fold_quantized_weights(variables, qc)
    out = model.apply(deployed, x, t, DEPLOY)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6,
                               atol=1e-6)

    # the 8-bit first/last override must be honored: temb_dense_0's folded
    # kernel takes more distinct values than 4-bit would allow
    k = np.asarray(deployed["params"]["temb_dense_0"]["kernel"])
    d = np.asarray(variables["quant"]["temb_dense_0"]["w0_delta"])
    levels = len(np.unique(np.round(k[:, 0] / d[0, 0]).astype(int)))
    assert levels > 16


def test_bf16_serving_quality():
    """export_serving (bf16 carrier) must stay close to the f32 fake-quant
    path: the carrier error has to be small relative to the quantization
    error itself (the quantity the PTQ pipeline optimizes)."""
    from eda_dm_tpu.quant.export import export_serving

    arch = DDPMConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                      attn_resolutions=(8,), resolution=16)
    qc = QuantConfig(weight_bit=4, act_bit=8)
    model = DDPMUNet(cfg=arch, qc=qc)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (4, 16, 16, 3))
    t = jnp.full((4,), 20.0)
    variables = model.init(key, x, t, FP)
    _, upd = model.apply(variables, x, t, CALIB_W, mutable=["quant"])
    variables = {**variables, "quant": upd["quant"]}
    _, upd = model.apply(variables, x, t, CALIB_A, mutable=["quant"])
    variables = {**variables, "quant": upd["quant"]}

    fp = model.apply(variables, x, t, FP)
    fq = model.apply(variables, x, t, WAQ)
    serving = export_serving(variables, qc)
    out = model.apply(serving, x.astype(jnp.bfloat16), t, DEPLOY)
    assert out.dtype == jnp.bfloat16

    quant_err = float(jnp.mean(jnp.abs(fq - fp)))
    carrier_err = float(jnp.mean(jnp.abs(out.astype(jnp.float32) - fq)))
    assert carrier_err < 0.5 * quant_err, (carrier_err, quant_err)


@pytest.mark.slow
def test_fused_kernel_deploy_matches_unfused():
    """DEPLOY_FUSED (Pallas quantize+matmul on 1x1 convs/denses, interpret
    mode on CPU) must reproduce the plain DEPLOY numerics."""
    from eda_dm_tpu.quant.export import export_serving, DEPLOY_FUSED

    arch = DDPMConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                      attn_resolutions=(8,), resolution=16)
    qc = QuantConfig(weight_bit=4, act_bit=8)
    model = DDPMUNet(cfg=arch, qc=qc)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (4, 16, 16, 3))
    t = jnp.full((4,), 20.0)
    variables = model.init(key, x, t, FP)
    _, upd = model.apply(variables, x, t, CALIB_W, mutable=["quant"])
    variables = {**variables, "quant": upd["quant"]}
    _, upd = model.apply(variables, x, t, CALIB_A, mutable=["quant"])
    variables = {**variables, "quant": upd["quant"]}

    serving = export_serving(variables, qc)
    x16 = x.astype(jnp.bfloat16)
    ref = model.apply(serving, x16, t, DEPLOY)
    out = model.apply(serving, x16, t, DEPLOY_FUSED)
    # same quantization decisions; only MXU accumulation order may differ
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2)
