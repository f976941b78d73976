"""Grouped (vmapped) reconstruction: plan grouping, exact equivalence to the
sequential path on independent targets, and an asym smoke through the
orchestrator.

The grouped path exists because round-1 profiling showed per-target capture
compiles and latency-bound scan steps dominating recon wall-clock; grouping G
same-shape targets shares both (calib/recon.py::reconstruct_group).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from eda_dm_tpu.models.ddpm_unet import DDPMUNet, DDPMConfig, ddpm_recon_plan
from eda_dm_tpu.pipelines.cifar import CifarPipeline, CifarConfig
from eda_dm_tpu.calib.recon import (ReconArgs, group_plan, reconstruct,
                                    reconstruct_group, reconstruct_target,
                                    build_group_data, _signature)
from eda_dm_tpu.utils.tree import get_subtree

# two res blocks per level so down_0.block_0 / down_0.block_1 are adjacent
# same-signature, same-shape targets
ARCH = DDPMConfig(ch=32, ch_mult=(1, 2), num_res_blocks=2,
                  attn_resolutions=(8,), resolution=16)


@pytest.fixture(scope="module")
def pipeline():
    cfg = CifarConfig(
        arch=ARCH, image_size=16, timesteps=4, skip_type="uniform",
        num_diffusion_timesteps=100, calib_num_samples=8, batch_samples=8,
        iters=4, recon_batch_size=4, max_images=4, sample_batch_size=4)
    return CifarPipeline(cfg)


@pytest.fixture(scope="module")
def calibrated(pipeline):
    variables = pipeline.init_variables()
    calib_x, calib_t, _ = pipeline.tdac_calibration(
        variables, jax.random.PRNGKey(0))
    cali_data = (calib_x, calib_t)
    variables = pipeline.calibrate(variables, cali_data)
    return variables, cali_data


def test_group_plan_groups_adjacent_same_signature(pipeline):
    plan = ddpm_recon_plan(ARCH, pipeline.qc)
    groups = group_plan(plan, group_size=4)
    by_name = {tuple(t.name for t in g) for g in groups}
    # the two down_0 res blocks share (module, taps) signature and are
    # adjacent -> one group
    assert ("down_0.block_0", "down_0.block_1") in by_name
    # grouping preserves the overall order and covers the plan exactly
    flat = [t.name for g in groups for t in g]
    assert flat == [t.name for t in plan]
    # members of every group share the signature
    for g in groups:
        assert all(_signature(t) == _signature(g[0]) for t in g)


@pytest.mark.slow
def test_grouped_equals_sequential_when_captures_fixed(pipeline, calibrated):
    """With asym=False every capture is FP (order-independent), so the
    grouped scan must reproduce the sequential result given the same member
    keys — up to f32 reduction-order noise: the grouped path vmaps the
    block forward, and GNorm's group statistics lower with a different
    reduction tree under vmap (~1e-7 relative).  Anything beyond that
    indicates a real semantic difference in the grouping."""
    variables, cali_data = calibrated
    plan = ddpm_recon_plan(ARCH, pipeline.qc)
    targets = [t for t in plan if t.name in ("down_0.block_0",
                                             "down_0.block_1")]
    args = ReconArgs(iters=5, batch_size=4, asym=False, input_prob=1.0)
    datas = build_group_data(pipeline.model, variables, cali_data, targets,
                             args)

    key = jax.random.PRNGKey(7)
    grouped_vars, grouped_losses = reconstruct_group(
        targets, variables, datas, args, key)

    keys = jax.random.split(key, len(targets))
    seq_vars = variables
    seq_losses = []
    for t, d, k in zip(targets, datas, keys):
        seq_vars, losses = reconstruct_target(t, seq_vars, d, args, k)
        seq_losses.append(losses)

    for t in targets:
        g = get_subtree(grouped_vars["quant"], t.path)
        s = get_subtree(seq_vars["quant"], t.path)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                    np.asarray(b),
                                                    rtol=2e-5, atol=1e-6),
            g, s)
    for gl, sl in zip(grouped_losses, seq_losses):
        np.testing.assert_allclose(np.asarray(gl), np.asarray(sl),
                                   rtol=5e-5, atol=5e-6)


@pytest.mark.slow
def test_reconstruct_grouped_orchestration(pipeline, calibrated):
    """group_size>1 through the orchestrator: runs, reports every target,
    moves the alphas, and the result still samples."""
    variables, cali_data = calibrated
    plan = ddpm_recon_plan(ARCH, pipeline.qc)
    prefix = plan[:6]          # temb denses, conv_in, two res blocks, ...
    args = ReconArgs(iters=3, batch_size=4)
    seen = []
    new_vars = reconstruct(pipeline.model, variables, cali_data, prefix,
                           args, jax.random.PRNGKey(2),
                           progress=lambda n, l: seen.append((n, l)),
                           group_size=4)
    assert [n for n, _ in seen] == [t.name for t in prefix]
    assert all(np.isfinite(l) for _, l in seen)
    t = next(t for t in prefix if t.name == "down_0.block_0")
    a0 = get_subtree(variables["quant"], t.path)["conv1"]["w0_alpha"]
    a1 = get_subtree(new_vars["quant"], t.path)["conv1"]["w0_alpha"]
    assert float(jnp.abs(a1 - a0).max()) > 0


@pytest.mark.slow
def test_resumable_reconstruct_grouped(pipeline, calibrated, tmp_path):
    """Per-group checkpointing: an interrupted run resumes past completed
    groups, keys match the uninterrupted stream, and the final state equals
    a straight-through run."""
    from eda_dm_tpu.utils.checkpointing import resumable_reconstruct
    variables, cali_data = calibrated
    plan = ddpm_recon_plan(ARCH, pipeline.qc)[:5]
    args = ReconArgs(iters=3, batch_size=4)
    key = jax.random.PRNGKey(9)

    full = resumable_reconstruct(pipeline.model, variables, cali_data, plan,
                                 args, key, str(tmp_path / "a"),
                                 group_size=4)

    # interrupt after the first group, then resume with a fresh call
    seen = []

    class Stop(Exception):
        pass

    def bomb(name, loss):
        seen.append(name)
        if len(seen) >= 3:
            raise Stop()

    with pytest.raises(Stop):
        resumable_reconstruct(pipeline.model, variables, cali_data, plan,
                              args, key, str(tmp_path / "b"),
                              progress=bomb, group_size=4)
    resumed = resumable_reconstruct(pipeline.model, variables, cali_data,
                                    plan, args, key, str(tmp_path / "b"),
                                    group_size=4)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-6, atol=1e-7),
        full["quant"], resumed["quant"])


def test_group_plan_window_bridges_interleaving(pipeline):
    """window=1 groups the alternating block/attn pattern of attention
    levels into one block-group and one attn-group, in first-member order."""
    plan = ddpm_recon_plan(ARCH, pipeline.qc)
    names = [t.name for t in plan]
    # down_0 level (res 16 with attn at 8? -> use the level with attn)
    groups0 = group_plan(plan, group_size=4, window=0)
    groups1 = group_plan(plan, group_size=4, window=1)
    flat1 = [t.name for g in groups1 for t in g]
    assert sorted(flat1) == sorted(names)          # covers the plan exactly
    by_name1 = {tuple(t.name for t in g) for g in groups1}
    # the attn level alternates block/attn; window=1 merges across it
    # (down_1.block_0 carries a shortcut so only the attns + later same-shape
    # blocks merge)
    assert ("down_1.attn_0", "down_1.attn_1", "mid_attn_1") in by_name1
    assert ("up_1.block_0", "up_1.block_1", "up_1.block_2") in by_name1
    assert len(groups1) < len(groups0)
    # every group homogeneous
    for g in groups1:
        assert all(_signature(t) == _signature(g[0]) for t in g)


@pytest.mark.slow
def test_bf16_cache_recon_close_to_f32(pipeline, calibrated):
    """bfloat16 activation caches (the memory lever that fits 64x64-latent /
    32x32-pixel captures on one chip) must leave reconstruction results close
    to the f32-cache path."""
    variables, cali_data = calibrated
    plan = ddpm_recon_plan(ARCH, pipeline.qc)
    target = next(t for t in plan if t.name == "down_0.block_0")
    key = jax.random.PRNGKey(3)

    results = {}
    for dt in (None, "bfloat16"):
        args = ReconArgs(iters=30, batch_size=4, cache_dtype=dt)
        datas = build_group_data(pipeline.model, variables, cali_data,
                                 [target], args)
        if dt:
            assert datas[0]["inp_s"].dtype == jnp.bfloat16
        new_vars, losses = reconstruct_target(target, variables, datas[0],
                                              args, key)
        results[dt] = (get_subtree(new_vars["quant"], target.path),
                       np.asarray(losses))

    f32_alpha = results[None][0]["conv1"]["w0_alpha"]
    b16_alpha = results["bfloat16"][0]["conv1"]["w0_alpha"]
    # the optimized rounding masks should agree nearly everywhere
    agree = np.mean(np.sign(np.asarray(f32_alpha)) ==
                    np.sign(np.asarray(b16_alpha)))
    assert agree > 0.98
    # loss trajectories track each other
    np.testing.assert_allclose(results["bfloat16"][1], results[None][1],
                               rtol=0.1, atol=1e-3)


@pytest.mark.slow
def test_shared_capture_universe_equals_per_group(pipeline, calibrated):
    """shared_capture=True (one capture executable per mode for the whole
    plan, round-3) must produce exactly the same reconstruction as the
    per-group DCE'd capture path — the universe program returns a superset
    of taps, the selected subset is identical."""
    variables, cali_data = calibrated
    plan = ddpm_recon_plan(ARCH, pipeline.qc)[:4]
    key = jax.random.PRNGKey(11)
    base = dict(iters=3, batch_size=4)
    v_a = reconstruct(pipeline.model, variables, cali_data, plan,
                         ReconArgs(shared_capture=False, **base), key,
                         group_size=2)
    v_b = reconstruct(pipeline.model, variables, cali_data, plan,
                         ReconArgs(shared_capture=True, **base), key,
                         group_size=2)
    la, lb = jax.tree.leaves(v_a["quant"]), jax.tree.leaves(v_b["quant"])
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0,
                                   rtol=0)
