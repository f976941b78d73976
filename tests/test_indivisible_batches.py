"""No silently dropped calibration rows for n % batch_size != 0.

Round-2 verdict item: capture_target, set_act_quantize_params and
dp_calibrate_acts all truncated the tail batch.  Capture now pads the tail
by cyclic repetition (same compiled program) and slices back to n; scale
init runs the tail ragged (exact stats); the dp path cyclic-pads the tail
to the next mesh multiple (round-4 verdict weak #6).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from eda_dm_tpu.models.ddpm_unet import DDPMUNet, DDPMConfig, ddpm_recon_plan
from eda_dm_tpu.quant.config import QuantConfig, FP, CALIB_W
from eda_dm_tpu.calib.recon import (ReconArgs, capture_target, FP_CAPTURE,
                                    _pad_rows)
from eda_dm_tpu.calib.scale_init import (set_weight_quantize_params,
                                         set_act_quantize_params)

ARCH = DDPMConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                  attn_resolutions=(8,), resolution=16)


@pytest.fixture(scope="module")
def setup():
    qc = QuantConfig(weight_bit=4, act_bit=8)
    model = DDPMUNet(cfg=ARCH, qc=qc)
    key = jax.random.PRNGKey(0)
    n = 11                                 # deliberately indivisible
    x = jax.random.normal(key, (n, 16, 16, 3))
    t = jnp.linspace(0.0, 90.0, n)
    variables = model.init(key, x[:1], t[:1], FP)
    return model, variables, (x, t)


def test_pad_rows():
    a = jnp.arange(10).reshape(5, 2)
    out = _pad_rows(a, 8)
    assert out.shape == (8, 2)
    np.testing.assert_array_equal(out[5:], a[:3])
    np.testing.assert_array_equal(_pad_rows(a, 3), a[:3])
    # target beyond 2x input wraps around
    out = _pad_rows(a[:2], 7)
    np.testing.assert_array_equal(out[6], a[0])


def test_capture_keeps_all_rows(setup):
    model, variables, cali = setup
    plan = ddpm_recon_plan(ARCH, model.qc)
    target = next(t for t in plan if t.kind == "block")
    keep = (target.path + ("block_in",), target.path + ("block_out",))
    full, _ = capture_target(model, variables, cali, (), FP_CAPTURE, keep,
                             batch_size=None)
    batched, _ = capture_target(model, variables, cali, (), FP_CAPTURE, keep,
                                batch_size=4)   # 11 = 2*4 + 3 tail
    for kp in keep:
        assert batched[kp].shape[0] == 11
        np.testing.assert_allclose(np.asarray(batched[kp]),
                                   np.asarray(full[kp]), rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_capture_oom_retry(setup, monkeypatch):
    """capture_target recovers from RESOURCE_EXHAUSTED: first retry clears
    executable caches, later retries halve the capture batch (round-4
    bedroom recon died on a late-plan capture OOM after 80 min)."""
    import eda_dm_tpu.calib.recon as recon_mod
    model, variables, cali = setup
    plan = ddpm_recon_plan(ARCH, model.qc)
    target = next(t for t in plan if t.kind == "block")
    keep = (target.path + ("block_in",), target.path + ("block_out",))
    full, _ = capture_target(model, variables, cali, (), FP_CAPTURE, keep,
                             batch_size=None)

    real = recon_mod._capture_batch
    fails = {"n": 2}
    seen_bs = []

    def flaky(model, variables, batch, path, keep_, mode, cast=None):
        seen_bs.append(batch[0].shape[0])
        if fails["n"]:
            fails["n"] -= 1
            raise RuntimeError("RESOURCE_EXHAUSTED: TPU backend error")
        return real(model, variables, batch, path, keep_, mode, cast)

    monkeypatch.setattr(recon_mod, "_capture_batch", flaky)
    out, _ = capture_target(model, variables, cali, (), FP_CAPTURE, keep,
                            batch_size=8)
    # attempt 1: bs=8 (fails), attempt 2: bs=8 after cache clear (fails),
    # attempt 3: bs=4
    assert seen_bs[:3] == [8, 8, 4]
    for kp in keep:
        assert out[kp].shape[0] == 11
        np.testing.assert_allclose(np.asarray(out[kp]),
                                   np.asarray(full[kp]), rtol=1e-5, atol=1e-5)

    # a non-OOM error propagates immediately
    def broken(*a, **k):
        raise RuntimeError("INVALID_ARGUMENT: something else")
    monkeypatch.setattr(recon_mod, "_capture_batch", broken)
    with pytest.raises(RuntimeError, match="INVALID_ARGUMENT"):
        capture_target(model, variables, cali, (), FP_CAPTURE, keep,
                       batch_size=8)


@pytest.mark.slow
def test_act_scale_init_sees_tail_rows(setup):
    model, variables, (x, t) = setup
    variables = set_weight_quantize_params(model, variables, (x, t),
                                           batch_size=4)
    # run with a tail (11 = 2*4 + 3) vs explicitly feeding all rows in the
    # same batch split; the EMA chain must visit the same 3 batches
    v_tail = set_act_quantize_params(model, variables, (x, t), batch_size=4)

    v_manual = variables
    from eda_dm_tpu.calib.scale_init import _calib_step
    from eda_dm_tpu.quant.config import QuantMode
    mode = QuantMode(w_quant=True, a_quant=True, calib_a=True)
    for sl in (slice(0, 4), slice(4, 8), slice(8, 11)):
        quant = _calib_step(model, v_manual, (x[sl], t[sl]), mode)
        v_manual = {**v_manual, "quant": quant}

    ltail = jax.tree.leaves(v_tail["quant"])
    lman = jax.tree.leaves(v_manual["quant"])
    for a, b in zip(ltail, lman):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_dp_calibrate_pads_unshardable():
    """Indivisible calib sizes shard by cyclic-padding the tail to the
    next mesh multiple (round-4 verdict weak #6 — the dp path used to
    hard-error where the single-chip path pads/ragged-runs).  The padded
    run must be bit-identical to calling dp with the same explicitly
    pre-tiled batch, since that is exactly the batch the impl builds."""
    from eda_dm_tpu.parallel.mesh import make_mesh
    from eda_dm_tpu.parallel.dp import dp_calibrate_acts
    qc = QuantConfig()
    model = DDPMUNet(cfg=ARCH, qc=qc)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (11, 16, 16, 3))   # 11 % 8 != 0
    t = jnp.linspace(0.0, 90.0, 11)
    variables = model.init(key, x[:1], t[:1], FP)
    mesh = make_mesh()
    out = dp_calibrate_acts(model, variables, (x, t), mesh)
    # manual equivalent of the impl's batching: full batch rows 0-7, then
    # the 3-row tail cyclically tiled to the next mesh multiple (8)
    idx = jnp.asarray(list(range(8)) + [8, 9, 10, 8, 9, 10, 8, 9])
    ref = dp_calibrate_acts(model, variables, (x[idx], t[idx]), mesh,
                            batch_size=8)
    for (pa, a), (pb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(out["quant"]),
                   key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_leaves_with_path(ref["quant"]),
                   key=lambda kv: str(kv[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(pa))
