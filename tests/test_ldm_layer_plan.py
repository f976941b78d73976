"""LDM layer-mode reconstruction plan (qdiff/recon_layer_Qmodel.py:13-120
equivalent for the openai UNet) — VERDICT round-1 missing item #6."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from eda_dm_tpu.models.ldm_unet import (LDMUNet, LDMUNetConfig,
                                        ldm_layer_plan, ldm_recon_plan,
                                        AttentionBlockL, ResBlockL)
from eda_dm_tpu.quant import QuantConfig, QuantMode, FP
from eda_dm_tpu.calib.recon import ReconArgs, reconstruct


def tiny_cfg():
    return LDMUNetConfig(image_size=8, in_channels=3, model_channels=32,
                         out_channels=3, num_res_blocks=1,
                         attention_resolutions=(2,), channel_mult=(1, 2),
                         num_head_channels=16)


def test_layer_plan_decomposition():
    cfg = tiny_cfg()
    qc = QuantConfig(weight_bit=4, act_bit=8)
    block_plan = ldm_recon_plan(cfg, qc)
    layer_plan = ldm_layer_plan(cfg, qc)
    # every block decomposes into >= its inner-tap count of layer targets
    n_blocks = sum(1 for t in block_plan if t.kind == "block")
    assert n_blocks > 0
    # only act-only attention block targets remain 'block'
    assert all(t.act_only for t in layer_plan if t.kind == "block")
    # attention decomposition present: qkv + acts + proj_out
    names = [t.name for t in layer_plan]
    assert any(n.endswith(".qkv") for n in names)
    assert any(n.endswith(".acts") for n in names)
    assert any(n.endswith(".proj_out") for n in names)
    assert len(layer_plan) > len(block_plan)


def test_layer_plan_reconstructs():
    cfg = tiny_cfg()
    qc = QuantConfig(weight_bit=4, act_bit=8)
    model = LDMUNet(cfg=cfg, qc=qc)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (6, 8, 8, 3))
    t = jax.random.uniform(key, (6,), minval=0, maxval=999)
    variables = model.init(key, x, t, mode=FP)
    _, upd = model.apply(variables, x, t,
                         mode=QuantMode(w_quant=True, calib_w=True),
                         mutable=["quant"])
    variables = {**variables, "quant": upd["quant"]}
    _, upd = model.apply(variables, x, t,
                         mode=QuantMode(w_quant=True, a_quant=True,
                                        calib_a=True), mutable=["quant"])
    variables = {**variables, "quant": upd["quant"]}

    plan = ldm_layer_plan(cfg, qc)
    # run a representative subset: a res-block layer, an attention qkv
    # layer, and the act-only attention target
    sub = ([t for t in plan if t.name.endswith("in_layers_2")][:1]
           + [t for t in plan if t.name.endswith(".qkv")][:1]
           + [t for t in plan if t.name.endswith(".acts")][:1])
    assert len(sub) == 3
    new_vars = reconstruct(model, variables, (x, t), sub,
                           ReconArgs(iters=2, batch_size=4),
                           jax.random.PRNGKey(1))
    out = model.apply(new_vars, x, t,
                      mode=QuantMode(w_quant=True, a_quant=True))
    assert np.isfinite(np.asarray(out)).all()
