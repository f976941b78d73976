"""Deployment export: folded weights + act-only mode ≡ full fake-quant."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from eda_dm_tpu.models.ddpm_unet import DDPMUNet, DDPMConfig
from eda_dm_tpu.quant import QuantConfig, QuantMode, FP, WAQ, CALIB_W, CALIB_A
from eda_dm_tpu.quant.export import fold_quantized_weights, DEPLOY


@pytest.mark.slow
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


@pytest.mark.slow
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


def _calibrated_tiny():
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
    return model, qc, variables, x, t


@pytest.mark.slow
def test_int8_serving_matches_folded(monkeypatch):
    """DEPLOY_INT8 (integer weights, int8 convs, f32 dequant epilogue) must
    reproduce the folded-weight DEPLOY path.  The integer arithmetic is
    exact on identical act codes; between whole-model paths the inputs to
    each quantizer differ by f32 association (conv epilogue order), so a
    borderline activation may legitimately round to the adjacent code —
    the gate therefore requires near-total elementwise agreement with any
    disagreements bounded by single-code flips."""
    from eda_dm_tpu.quant.export import (export_serving, export_serving_int8,
                                         DEPLOY, DEPLOY_INT8)

    monkeypatch.setenv("EDM_FUSED_GN", "0")
    model, qc, variables, x, t = _calibrated_tiny()
    folded = export_serving(variables, qc, dtype=jnp.float32)
    int8ed = export_serving_int8(variables, qc, dtype=jnp.float32)

    ref = np.asarray(model.apply(folded, x, t, DEPLOY))
    out = np.asarray(model.apply(int8ed, x, t, DEPLOY_INT8))
    d = np.abs(out - ref)
    assert np.median(d) < 2e-4               # bulk: f32 association only
    assert d.max() < 0.15                    # outliers: ≤ ~2 act LSBs
    assert (d < 2e-4).mean() > 0.7           # flips smear but stay bounded

    # integer leaves exist for 4-bit layers, not for the 8-bit first layer
    q = int8ed["quant"]
    assert "w0_int" in q["conv_in"] and q["conv_in"]["w0_int"].dtype == \
        jnp.int8
    assert "w0_int" not in q["temb_dense_0"]       # 8-bit first layer
    # codes are 4-bit-ranged around zero
    assert int(jnp.max(jnp.abs(
        q["conv_in"]["w0_int"].astype(jnp.int32)))) <= 15


def test_int8_conv_exact_on_shared_codes():
    """The int8 conv algebra is *exact* when both paths see identical act
    codes: one QConv, identical input, folded vs int8 — agreement to f32
    association only (no whole-model drift in the way)."""
    from eda_dm_tpu.nn.layers import QConv
    from eda_dm_tpu.quant import QuantConfig, QuantMode, FP
    from eda_dm_tpu.quant.export import (export_serving, export_serving_int8,
                                         DEPLOY, DEPLOY_INT8)

    qc = QuantConfig(weight_bit=4, act_bit=8)
    conv = QConv(64, (3, 3), wq=qc.wq, aq=qc.aq)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 16, 32))
    variables = conv.init(key, x, FP)
    _, upd = conv.apply(variables, x, QuantMode(w_quant=True, calib_w=True),
                        mutable=["quant"])
    variables = {**variables, "quant": upd["quant"]}
    _, upd = conv.apply(variables, x,
                        QuantMode(w_quant=True, a_quant=True, calib_a=True),
                        mutable=["quant"])
    variables = {**variables, "quant": upd["quant"]}
    folded = export_serving(variables, qc, dtype=jnp.float32)
    int8ed = export_serving_int8(variables, qc, dtype=jnp.float32)
    ref = conv.apply(folded, x, DEPLOY)
    out = conv.apply(int8ed, x, DEPLOY_INT8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_int8_serving_quality_gate():
    """On fresh inputs the two serving paths may differ by isolated act-code
    flips (f32-association drift at rounding boundaries, amplified over 40
    layers), so full-model comparison is a quality gate: DEPLOY_INT8's
    deviation from FP must match DEPLOY's, and the paths must agree except
    at boundary flips."""
    from eda_dm_tpu.quant.export import (export_serving, export_serving_int8,
                                         DEPLOY, DEPLOY_INT8)

    model, qc, variables, x, t = _calibrated_tiny()
    folded = export_serving(variables, qc, dtype=jnp.float32)
    int8ed = export_serving_int8(variables, qc, dtype=jnp.float32)
    x2 = jax.random.normal(jax.random.PRNGKey(5), (2, 16, 16, 3))
    t2 = jnp.full((2,), 77.0)
    fp = model.apply(variables, x2, t2, FP)
    ref = np.asarray(model.apply(folded, x2, t2, DEPLOY))
    out = np.asarray(model.apply(int8ed, x2, t2, DEPLOY_INT8))

    err_ref = np.abs(ref - np.asarray(fp)).mean()
    err_int8 = np.abs(out - np.asarray(fp)).mean()
    assert err_int8 <= err_ref * 1.05 + 1e-6
    # path-to-path drift stays a small fraction of the quantization error
    assert np.median(np.abs(out - ref)) < err_ref * 0.25
    assert np.abs(out - ref).max() < 0.5


def _calibrated_tiny_ldm(num_heads=4):
    """Tiny LDM UNet with multi-head narrow attention (head dim < one lane
    tile) — the layout whose fused serving kernels route through
    _heads_to_batched (ops/pallas_attention.py)."""
    from eda_dm_tpu.models.ldm_unet import LDMUNet, LDMUNetConfig

    cfg = LDMUNetConfig(in_channels=3, out_channels=3, model_channels=32,
                        num_res_blocks=1, attention_resolutions=(1,),
                        channel_mult=(1, 2), num_heads=num_heads,
                        image_size=16)
    qc = QuantConfig(weight_bit=4, act_bit=8)
    model = LDMUNet(cfg=cfg, qc=qc)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 16, 3))
    t = jnp.full((2,), 10.0)
    variables = model.init(key, x, t, mode=FP)
    _, upd = model.apply(variables, x, t, mode=CALIB_W, mutable=["quant"])
    variables = {**variables, "quant": upd["quant"]}
    _, upd = model.apply(variables, x, t, mode=CALIB_A, mutable=["quant"])
    variables = {**variables, "quant": upd["quant"]}
    return model, qc, variables, x, t


@pytest.mark.slow
def test_ldm_folded_deploy_matches_fakequant():
    """Model-level fold gate for the LDM zoo (the DDPM twin above cannot see
    LDM-only layers: QKV attention, transformer denses, emb_layers).  Folded
    DEPLOY must be bit-identical to WAQ fake-quant."""
    from eda_dm_tpu.quant.export import fold_quantized_weights, DEPLOY

    model, qc, variables, x, t = _calibrated_tiny_ldm()
    waq = model.apply(variables, x, t, mode=WAQ)
    sv = fold_quantized_weights(variables, qc)
    out = model.apply(sv, x, t, mode=DEPLOY)
    np.testing.assert_allclose(np.asarray(out), np.asarray(waq),
                               rtol=0, atol=1e-6)


@pytest.mark.slow
def test_ldm_int8_serving_quality_gate(monkeypatch):
    """LDM whole-model int8 serving (narrow fused attention + fused GN
    enabled, as the production queue runs it) stays within the fake-quant
    path's deviation from FP — the model-level gate the DDPM-only suite
    was missing."""
    from eda_dm_tpu.api import export_for_serving

    monkeypatch.setenv("EDM_FUSED_ATTN_NARROW", "1")
    monkeypatch.setenv("EDM_FUSED_GN_NARROW", "1")
    model, qc, variables, x, t = _calibrated_tiny_ldm()
    fp = model.apply(variables, x, t, mode=FP)
    waq = model.apply(variables, x, t, mode=WAQ)
    sv, mode = export_for_serving(variables, qc, kind="int8")
    out = model.apply(sv, x.astype(jnp.bfloat16), t, mode=mode)
    out = np.asarray(out, np.float32)

    err_waq = np.abs(np.asarray(waq) - np.asarray(fp)).mean()
    err_int8 = np.abs(out - np.asarray(fp)).mean()
    # bf16 carrier adds noise on top of quantization, but int8 serving must
    # stay in the same error class as fake-quant, not a different regime
    assert err_int8 <= err_waq * 1.3 + 5e-3
    assert np.abs(out - np.asarray(waq)).max() < 0.5


def test_ldm_mode_positional_misuse_raises():
    """LDMUNet takes (x, t, context, y, mode); a QuantMode passed where
    DDPMUNet takes its mode (third positional) must fail loudly instead of
    silently running the whole net FP."""
    from eda_dm_tpu.models.ldm_unet import LDMUNet, LDMUNetConfig
    import pytest

    cfg = LDMUNetConfig(in_channels=3, out_channels=3, model_channels=32,
                        num_res_blocks=1, attention_resolutions=(1,),
                        channel_mult=(1, 2), num_heads=4, image_size=16)
    model = LDMUNet(cfg=cfg, qc=QuantConfig(weight_bit=4, act_bit=8))
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 16, 16, 3))
    t = jnp.full((1,), 10.0)
    with pytest.raises(TypeError, match="positional order"):
        model.init(key, x, t, WAQ)
