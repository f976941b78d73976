"""Tests for the metrics, run utilities, checkpoint/resume, and layer-mode
reconstruction plan."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from eda_dm_tpu.eval.metrics import (FeatureStats, frechet_distance,
                                     fid_from_features, inception_score,
                                     clip_score)


def test_fid_identical_is_zero():
    rng = np.random.RandomState(0)
    f = rng.randn(512, 16)
    assert abs(fid_from_features(f, f)) < 1e-6


def test_fid_analytic_mean_shift():
    """For equal covariances, FID = ||mu1 - mu2||^2."""
    rng = np.random.RandomState(1)
    f = rng.randn(20000, 8)
    shift = np.zeros(8)
    shift[0] = 2.0
    fid = fid_from_features(f, f + shift)
    assert abs(fid - 4.0) < 0.05


def test_standardized_fid_resolves_collapsed_features():
    """Random-init extractor regime: tiny absolute scale, small relative
    spread.  Raw FID rounds to ~0 for shifted populations; standardized_fid
    discriminates them, is ~0 for identical ones, and is scale-invariant
    (the gate verdicts are ratios)."""
    from eda_dm_tpu.eval.metrics import standardized_fid

    rng = np.random.RandomState(0)
    base = rng.randn(1, 16) * 2e-4              # collapsed mean activations
    mk = lambda shift: base + rng.randn(512, 16) * 5e-6 + shift
    f_a, f_b = mk(0.0), mk(4e-5)
    assert abs(fid_from_features(f_a, f_b)) < 1e-4     # raw: vacuous
    d_shift = standardized_fid(f_a, f_b)
    d_same = standardized_fid(f_a, mk(0.0))
    assert d_shift > 10.0 * max(d_same, 1e-9)
    # shared-pool standardization preserves pairwise ratios under scaling
    pool = np.concatenate([f_a, f_b])
    r1 = (standardized_fid(f_a, f_b, pool) /
          standardized_fid(f_a[:256], f_a[256:], pool))
    r2 = (standardized_fid(f_a * 7.0, f_b * 7.0, pool * 7.0) /
          standardized_fid(f_a[:256] * 7.0, f_a[256:] * 7.0, pool * 7.0))
    np.testing.assert_allclose(r1, r2, rtol=1e-6)


def test_inception_score_bounds():
    # uniform predictions → IS = 1; one-hot diverse → IS = n_classes
    uniform = np.full((1000, 10), 0.1)
    m, _ = inception_score(uniform)
    assert abs(m - 1.0) < 1e-3
    onehot = np.eye(10)[np.tile(np.arange(10), 100)] * 0.999 + 1e-4
    m, _ = inception_score(onehot)
    assert m > 8.0


def test_clip_score_perfect_alignment():
    rng = np.random.RandomState(2)
    f = rng.randn(32, 64)
    assert abs(clip_score(f, f) - 100.0) < 1e-4
    assert clip_score(f, -f) < -99.0


def test_seed_and_run_dir(tmp_path):
    from eda_dm_tpu.utils.run import seed_everything, setup_run_dir, \
        dump_config
    key = seed_everything(7)
    assert key.shape == (2,)
    run_dir = setup_run_dir(str(tmp_path / "log"))
    assert os.path.exists(os.path.join(run_dir, "img"))
    dump_config({"weight_bit": 4}, run_dir)
    assert any(f.startswith("sampling_config") for f in os.listdir(run_dir))


def test_quant_state_checkpoint_roundtrip(tmp_path):
    from eda_dm_tpu.utils.checkpointing import save_quant_state, \
        load_quant_state, load_meta
    variables = {"params": {"a": jnp.ones((2,))},
                 "quant": {"layer": {"delta": jnp.asarray(0.5),
                                     "alpha": jnp.ones((3, 3))}}}
    path = str(tmp_path / "ck")
    save_quant_state(path, variables, meta={"completed": 3, "plan_len": 10})
    restored = load_quant_state(path, {"params": variables["params"],
                                       "quant": None})
    np.testing.assert_allclose(restored["quant"]["layer"]["alpha"],
                               np.ones((3, 3)))
    assert load_meta(path)["completed"] == 3


def test_layer_plan_structure():
    from eda_dm_tpu.models.ddpm_unet import (DDPMConfig, ddpm_layer_plan,
                                             ddpm_recon_plan)
    from eda_dm_tpu.quant import QuantConfig
    cfg = DDPMConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                     attn_resolutions=(8,), resolution=16)
    qc = QuantConfig()
    lp = ddpm_layer_plan(cfg, qc)
    bp = ddpm_recon_plan(cfg, qc)
    # layer mode has no ordinary block targets; attn blocks become
    # q/k/v + act-only + proj_out (recon_layer_Qmodel.py:110-115)
    assert all(t.kind == "layer" or t.act_only for t in lp)
    acts = [t for t in lp if t.act_only]
    n_attn = sum(1 for t in bp if t.name.endswith(("attn_0", "attn_1"))
                 or "attn" in t.name and t.kind == "block")
    assert len(acts) == n_attn and n_attn > 0
    names = [t.name for t in lp]
    i_q = names.index([n for n in names if n.endswith(".q")][0])
    i_acts = names.index(acts[0].name)
    i_proj = names.index([n for n in names if n.endswith(".proj_out")][0])
    assert i_q < i_acts < i_proj


@pytest.mark.slow
def test_act_only_recon_trains_only_attn_deltas():
    """The act-only attention target updates q/k/v/w deltas and nothing
    else (attn_layer_recon.py:13-133)."""
    from eda_dm_tpu.models.ddpm_unet import DDPMConfig, ddpm_layer_plan
    from eda_dm_tpu.pipelines.cifar import CifarPipeline, CifarConfig
    from eda_dm_tpu.calib.recon import ReconArgs, build_target_data, \
        reconstruct_target
    from eda_dm_tpu.utils.tree import get_subtree

    arch = DDPMConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                      attn_resolutions=(8,), resolution=16)
    cfg = CifarConfig(arch=arch, image_size=16, timesteps=3,
                      skip_type="uniform", num_diffusion_timesteps=60,
                      calib_num_samples=4, batch_samples=4)
    pipe = CifarPipeline(cfg)
    variables = pipe.init_variables()
    x, t, _ = pipe.tdac_calibration(variables, jax.random.PRNGKey(0))
    variables = pipe.calibrate(variables, (x, t))

    plan = ddpm_layer_plan(arch, pipe.qc)
    target = next(tt for tt in plan if tt.act_only)
    args = ReconArgs(iters=5, batch_size=4)
    data = build_target_data(pipe.model, variables, (x, t), target, args)
    before = get_subtree(variables["quant"], target.path)
    new_vars, losses = reconstruct_target(target, variables, data, args,
                                          jax.random.PRNGKey(1))
    after = get_subtree(new_vars["quant"], target.path)
    # attn deltas moved
    assert float(jnp.abs(after["act_quantizer_q"]["delta"]
                         - before["act_quantizer_q"]["delta"])) > 0
    # inner conv alphas untouched
    np.testing.assert_array_equal(np.asarray(after["q"]["w0_alpha"]),
                                  np.asarray(before["q"]["w0_alpha"]))
    assert np.isfinite(np.asarray(losses)).all()


def test_grid_watermark_prompt_io(tmp_path):
    """Task-layer niceties: make_grid geometry, invisible-watermark
    roundtrip, per-image prompt dump (sample_diffusion_ldm_imagenet.py:
    206-265, sample_txt2img.py:143-152)."""
    from eda_dm_tpu.eval.io import (make_grid, put_watermark, read_watermark,
                                    save_grid, save_prompts)
    rng = np.random.RandomState(0)
    imgs = rng.rand(10, 8, 8, 3).astype(np.float32)
    grid = make_grid(imgs, nrow=4, padding=2)
    assert grid.shape == (3 * 10 + 2, 4 * 10 + 2, 3)

    u8 = rng.randint(0, 256, (64, 64, 3), np.uint8)
    wm = put_watermark(u8, "StableDiffusionV1")
    assert np.abs(wm.astype(int) - u8.astype(int)).max() <= 1
    assert read_watermark(wm) == "StableDiffusionV1"

    out = tmp_path / "grid.png"
    save_grid(imgs, str(out), nrow=4, watermark="StableDiffusionV1")
    from PIL import Image
    assert read_watermark(np.asarray(Image.open(out))) == "StableDiffusionV1"

    save_prompts(["a cat", "a dog"], str(tmp_path / "pr"))
    assert open(tmp_path / "pr" / "00001.txt").read() == "a dog"
