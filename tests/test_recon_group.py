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


def test_grouped_equals_sequential_when_captures_fixed(pipeline, calibrated):
    """With asym=False every capture is FP (order-independent), so the
    grouped scan must reproduce the sequential result bit-for-bit given the
    same member keys."""
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
                                                    rtol=1e-6, atol=1e-7),
            g, s)
    for gl, sl in zip(grouped_losses, seq_losses):
        np.testing.assert_allclose(np.asarray(gl), np.asarray(sl),
                                   rtol=1e-5, atol=1e-6)


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
