"""Tensor-/spatial-parallel serving on the virtual 8-device mesh:
tp-sharded parameters and sp-sharded activations must reproduce the
single-device quantized forward (GSPMD inserts the collectives)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from eda_dm_tpu.models.ddpm_unet import DDPMUNet, DDPMConfig
from eda_dm_tpu.quant import QuantConfig, QuantMode, FP, WAQ
from eda_dm_tpu.parallel.tp import (make_mesh2d, shard_params_tp,
                                    shard_spatial, tp_spec, tp_sample)

import pytest

pytestmark = pytest.mark.slow

ARCH = DDPMConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                  attn_resolutions=(8,), resolution=16)


def _setup():
    model = DDPMUNet(cfg=ARCH, qc=QuantConfig(weight_bit=4, act_bit=8))
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (8, 16, 16, 3))
    t = jnp.linspace(0.0, 90.0, 8)
    variables = model.init(key, x[:1], t[:1], FP)
    _, upd = model.apply(variables, x, t,
                         QuantMode(w_quant=True, calib_w=True),
                         mutable=["quant"])
    variables = {**variables, "quant": upd["quant"]}
    _, upd = model.apply(variables, x, t,
                         QuantMode(w_quant=True, a_quant=True, calib_a=True),
                         mutable=["quant"])
    variables = {**variables, "quant": upd["quant"]}
    return model, variables, x, t


def test_tp_spec_rules():
    mk = lambda *s: jnp.zeros(s)
    assert tp_spec(mk(3, 3, 32, 64), 4) == P(None, None, None, "tp")
    assert tp_spec(mk(32, 64), 4) == P(None, "tp")
    assert tp_spec(mk(64), 4) == P("tp")
    assert tp_spec(mk(1, 1, 1, 64), 4) == P(None, None, None, "tp")
    assert tp_spec(mk(), 4) == P()            # scalar (per-tensor delta)
    assert tp_spec(mk(6), 4) == P()           # indivisible
    assert tp_spec(mk(4), 4) == P()           # 1 per shard: not worth it
    assert tp_spec(mk(3, 3, 32, 64), 3) == P()


def test_tp_forward_matches_single_device():
    """FP forward is layout-independent to reduction noise; the fake-quant
    forward additionally flips activation codes whose pre-quant values sit
    on a bin boundary under the sharded f32 rounding (measured: FP max
    2.4e-6, WAQ max ~0.08 = one act step amplified), so WAQ asserts a
    bounded drift instead of exactness."""
    model, variables, x, t = _setup()
    mesh = make_mesh2d(2, 4)
    vs = shard_params_tp(mesh, variables)
    # the big conv kernels must actually be sharded, not all replicated
    n_sharded = sum(
        1 for leaf in jax.tree.leaves(vs)
        if getattr(leaf, "sharding", None) is not None
        and leaf.sharding.spec != P())
    assert n_sharded >= 20, f"only {n_sharded} leaves tp-sharded"

    xb = jax.device_put(x, NamedSharding(mesh, P("dp", None, None, None)))
    ref_fp = model.apply(variables, x, t, FP)
    out_fp = jax.jit(lambda v, a, b: model.apply(v, a, b, FP))(vs, xb, t)
    np.testing.assert_allclose(np.asarray(out_fp), np.asarray(ref_fp),
                               rtol=1e-5, atol=1e-5)

    ref_q = np.asarray(model.apply(variables, x, t, WAQ))
    out_q = np.asarray(
        jax.jit(lambda v, a, b: model.apply(v, a, b, WAQ))(vs, xb, t))
    d = np.abs(out_q - ref_q)
    assert d.max() < 0.15 and d.mean() < 0.01, (d.max(), d.mean())


def test_sp_spatial_forward_matches():
    model, variables, x, t = _setup()
    ref = model.apply(variables, x, t, FP)
    mesh = make_mesh2d(1, 8)
    xs = shard_spatial(mesh, x, dim=1)       # H axis over 8 shards
    out = jax.jit(lambda v, a, b: model.apply(v, a, b, FP))(
        variables, xs, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # quantized path: bounded bin-flip drift (see tp test docstring)
    ref_q = np.asarray(model.apply(variables, x, t, WAQ))
    out_q = np.asarray(jax.jit(
        lambda v, a, b: model.apply(v, a, b, WAQ))(variables, xs, t))
    d = np.abs(out_q - ref_q)
    assert d.max() < 0.15 and d.mean() < 0.01, (d.max(), d.mean())


def test_tp_native_int8_serving():
    """The DEPLOY_INT8 export composes with tp sharding: integer weight
    codes and per-channel epilogue state shard by the same last-axis rule
    as the kernels they dequantize."""
    from eda_dm_tpu.quant.export import (export_serving_int8, DEPLOY_INT8)
    model, variables, x, t = _setup()
    serving = export_serving_int8(variables, model.qc)
    ref = np.asarray(model.apply(serving, x, t, DEPLOY_INT8))

    mesh = make_mesh2d(2, 4)
    vs = shard_params_tp(mesh, serving)
    n_int8 = sum(
        1 for leaf in jax.tree.leaves(vs)
        if leaf.dtype == jnp.int8 and leaf.sharding.spec != P())
    assert n_int8 >= 5, f"only {n_int8} int8 code tensors tp-sharded"
    xb = jax.device_put(x, NamedSharding(mesh, P("dp", None, None, None)))
    out = np.asarray(jax.jit(
        lambda v, a, b: model.apply(v, a, b, DEPLOY_INT8))(vs, xb, t))
    d = np.abs(out - ref)
    # int8 codes are layout-invariant; only the f32 epilogues and the
    # activation-quant boundaries can drift (see tp forward test)
    assert d.max() < 0.15 and d.mean() < 0.01, (d.max(), d.mean())


def test_tp_sample_trajectory():
    from eda_dm_tpu.samplers.schedules import get_beta_schedule, skip_sequence
    from eda_dm_tpu.samplers.ddim import generalized_steps
    model, variables, x, t = _setup()
    betas = get_beta_schedule("linear", beta_start=1e-4, beta_end=0.02,
                              num_diffusion_timesteps=100)
    seq = skip_sequence("uniform", 3, 100)
    mesh = make_mesh2d(4, 2)

    def make_sampler(mode):
        def sampler(vs, x_T, key):
            out, _ = generalized_steps(
                x_T, seq, lambda a, b: model.apply(vs, a, b, mode), betas)
            return out
        return sampler

    ref = make_sampler(FP)(variables, x, None)
    out = tp_sample(make_sampler(FP), variables, x, None, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # quantized trajectory stays finite and close in distribution
    out_q = np.asarray(tp_sample(make_sampler(WAQ), variables, x, None,
                                 mesh))
    ref_q = np.asarray(make_sampler(WAQ)(variables, x, None))
    assert np.isfinite(out_q).all()
    assert abs(out_q.mean() - ref_q.mean()) < 0.02
    assert abs(out_q.std() - ref_q.std()) < 0.05
