"""int8 attention einsums (ops/int8_einsum.py).

The serving branch replaces fake-quant einsum pairs with int8×int8→int32
einsums plus exact recentering corrections; per-op it must match
einsum(fake_quant(a), fake_quant(b)) to f32 association error.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from eda_dm_tpu.quant.affine import fake_quant_nograd, calculate_qparams
from eda_dm_tpu.ops.int8_einsum import (int8_act_einsum, quantize_act_int8,
                                        int8_attention_serving)
from eda_dm_tpu.quant.config import QuantConfig, QuantMode, FP, CALIB_W, \
    CALIB_A, WAQ

# the six attention einsum layouts used across the model zoos
EQUATIONS = [
    ("nic,njc->nij", (2, 9, 16), (2, 7, 16)),       # DDIM q·k
    ("nij,njc->nic", (2, 9, 7), (2, 7, 16)),        # DDIM w·v
    ("bthc,bshc->bhts", (2, 9, 3, 8), (2, 7, 3, 8)),  # LDM legacy q·k
    ("bhts,bshc->bthc", (2, 3, 9, 7), (2, 7, 3, 8)),  # LDM legacy w·v
    ("bihd,bjhd->bhij", (2, 9, 3, 8), (2, 7, 3, 8)),  # SD cross q·k
    ("bhij,bjhd->bihd", (2, 3, 9, 7), (2, 7, 3, 8)),  # SD cross w·v
]


def _qparams(x, n_levels, always_zero=False):
    d, zp = calculate_qparams(jnp.min(x), jnp.max(x), n_levels, always_zero)
    return d, zp


@pytest.mark.parametrize("eq,sa,sb", EQUATIONS)
def test_int8_einsum_matches_fakequant(eq, sa, sb):
    key = jax.random.PRNGKey(0)
    ka, kb = jax.random.split(key)
    a = jax.random.normal(ka, sa)
    b = jax.random.normal(kb, sb)
    la, lb = 256, 256
    da, zpa = _qparams(a, la)
    db, zpb = _qparams(b, lb)

    ref = jnp.einsum(eq, fake_quant_nograd(a, da, zpa, la),
                     fake_quant_nograd(b, db, zpb, lb),
                     preferred_element_type=jnp.float32)
    out = int8_act_einsum(eq, a, (da, zpa, la), b, (db, zpb, lb))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_int8_einsum_always_zero_softmax_codes():
    """sm_abit quantizers use always_zero (zp=0, codes 0..255): recentering
    by 128 must still fit int8 and reproduce the fake-quant product."""
    key = jax.random.PRNGKey(1)
    w = jax.nn.softmax(jax.random.normal(key, (2, 9, 7)) * 3.0, axis=-1)
    v = jax.random.normal(jax.random.PRNGKey(2), (2, 7, 16))
    dw, zpw = _qparams(w, 256, always_zero=True)
    assert float(zpw) == 0.0
    dv, zpv = _qparams(v, 256)
    codes, c = quantize_act_int8(w, dw, zpw, 256)
    assert codes.dtype == jnp.int8
    assert float(c) == 128.0
    ref = jnp.einsum("nij,njc->nic", fake_quant_nograd(w, dw, zpw, 256),
                     fake_quant_nograd(v, dv, zpv, 256),
                     preferred_element_type=jnp.float32)
    out = int8_act_einsum("nij,njc->nic", w, (dw, zpw, 256),
                          v, (dv, zpv, 256))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_sub8bit_codes():
    """act_bit < 8 codes also ride the int8 path (smaller grids)."""
    a = jax.random.normal(jax.random.PRNGKey(3), (4, 6, 8))
    b = jax.random.normal(jax.random.PRNGKey(4), (4, 5, 8))
    la = lb = 2 ** 6
    da, zpa = _qparams(a, la)
    db, zpb = _qparams(b, lb)
    ref = jnp.einsum("nic,njc->nij", fake_quant_nograd(a, da, zpa, la),
                     fake_quant_nograd(b, db, zpb, lb),
                     preferred_element_type=jnp.float32)
    out = int8_act_einsum("nic,njc->nij", a, (da, zpa, la), b, (db, zpb, lb))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_serving_gate():
    assert int8_attention_serving(QuantMode(a_quant=True, int8=True))
    # never during calibration / recon / capture
    assert not int8_attention_serving(CALIB_A.replace(int8=True))
    assert not int8_attention_serving(
        QuantMode(a_quant=True, int8=True, training=True))
    assert not int8_attention_serving(
        QuantMode(a_quant=True, int8=True, capture=True))
    assert not int8_attention_serving(
        QuantMode(a_quant=True, int8=True, soft_targets=True))
    assert not int8_attention_serving(WAQ)


def _ldm_attention_int8_check(block_ctor, apply_args):
    """Shared: calibrate a block, export is a no-op for pure-attention
    quantizers (no weights inside the einsums) — DEPLOY_INT8 forward must
    track the fake-quant WAQ forward closely."""
    model, args = block_ctor, apply_args
    key = jax.random.PRNGKey(0)
    variables = model.init(key, *args, FP)
    _, upd = model.apply(variables, *args, CALIB_W, mutable=["quant"])
    variables = {**variables, "quant": upd["quant"]}
    _, upd = model.apply(variables, *args, CALIB_A, mutable=["quant"])
    variables = {**variables, "quant": upd["quant"]}
    from eda_dm_tpu.quant.export import (export_serving_int8, DEPLOY,
                                         export_serving)
    from eda_dm_tpu.quant.export import DEPLOY_INT8
    qc = QuantConfig()
    folded = export_serving(variables, qc, dtype=jnp.float32)
    int8ed = export_serving_int8(variables, qc, dtype=jnp.float32)
    ref = model.apply(folded, *args, DEPLOY)
    out = model.apply(int8ed, *args, DEPLOY_INT8)
    ref, out = np.asarray(ref), np.asarray(out)
    # int8 einsums change f32 association at code boundaries; the drift
    # must stay tiny relative to signal
    assert np.abs(out - ref).mean() < 2e-3 * max(np.abs(ref).mean(), 1e-6) \
        + 2e-4


def test_ldm_legacy_attention_block_int8():
    from eda_dm_tpu.models.ldm_unet import AttentionBlockL
    qc = QuantConfig(weight_bit=4, act_bit=8)
    blk = AttentionBlockL(num_heads=2, wq=qc.wq, aq=qc.aq,
                          aq_w=qc.aq_softmax(always_zero=True,
                                             symmetric=False))
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 8, 8, 64))
    _ldm_attention_int8_check(blk, (x,))


def test_sd_cross_attention_int8():
    from eda_dm_tpu.models.ldm_unet import CrossAttentionL
    qc = QuantConfig(weight_bit=4, act_bit=8)
    blk = CrossAttentionL(heads=2, dim_head=8, out_dim=16, wq=qc.wq,
                          aq=qc.aq, aq_w=qc.aq_softmax(always_zero=True))
    x = jax.random.normal(jax.random.PRNGKey(8), (2, 9, 16))
    ctx = jax.random.normal(jax.random.PRNGKey(9), (2, 5, 16))
    _ldm_attention_int8_check(blk, (x, ctx))


def test_ddpm_attn_block_fused_kernel_int8():
    """AttnBlockD at a 128-multiple width takes the fused Pallas attention
    path (ops/pallas_attention.py) — DEPLOY_INT8 must still track the
    folded DEPLOY forward."""
    from eda_dm_tpu.models.ddpm_unet import AttnBlockD
    from eda_dm_tpu.ops.pallas_attention import fused_attention_applicable
    assert fused_attention_applicable(64, 128)   # the shape below
    qc = QuantConfig(weight_bit=4, act_bit=8)
    blk = AttnBlockD(wq=qc.wq, aq=qc.aq, aq_w=qc.aq_softmax())
    x = jax.random.normal(jax.random.PRNGKey(11), (2, 8, 8, 128))
    _ldm_attention_int8_check(blk, (x,))
