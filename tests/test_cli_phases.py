"""CLI-level production knobs: phase-split orchestration, serve modes,
and the text-encoder choices of the COCO task (round-2 verdict items 3/8).

Runs the real scripts/sample_diffusion_ldm.py main() against a tiny model
config (monkeypatched MODEL_CONFIGS) so the argparse surface, the
calib→recon→sample state handoff, and the int8 serving export are all
exercised exactly as a user would hit them.
"""

import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax

from eda_dm_tpu.pipelines import latent as latent_mod

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))
import sample_diffusion_ldm as cli


def tiny_model_cfg(cond: str = "none", transformer: bool = False,
                   context_dim: int = 16):
    from eda_dm_tpu.models.latent_diffusion import LatentDiffusionConfig
    from eda_dm_tpu.models.ldm_unet import LDMUNetConfig
    from eda_dm_tpu.models.vae import VAEConfig
    return LatentDiffusionConfig(
        unet=LDMUNetConfig(
            image_size=8, in_channels=3, model_channels=32, out_channels=3,
            num_res_blocks=1, attention_resolutions=(2,),
            channel_mult=(1, 2), num_head_channels=16,
            use_spatial_transformer=transformer,
            context_dim=context_dim if transformer else None),
        vae=VAEConfig(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                      attn_resolutions=(), in_channels=3, resolution=16,
                      z_channels=3, double_z=False, embed_dim=3,
                      n_embed=64),
        timesteps=50, cond=cond, n_classes=11, class_embed_dim=16)


def _run_cli(argv, monkeypatch, model_cfg):
    monkeypatch.setitem(latent_mod.MODEL_CONFIGS, "bedroom",
                        lambda: model_cfg)
    monkeypatch.setitem(latent_mod.MODEL_CONFIGS, "coco",
                        lambda: model_cfg)
    monkeypatch.setattr(sys, "argv", ["sample_diffusion_ldm.py"] + argv)
    cli.main()


COMMON = ["--custom_steps", "4", "--calib_num_samples", "6",
          "--batch_samples", "6", "--iters", "2", "--n_samples", "2",
          "--batch_size", "2", "--recon_group_size", "2",
          "--cache_dtype", "bfloat16"]


def _find_images(root):
    """PNG files anywhere under a logdir (run dirs nest samples/<ts>/img)."""
    hits = []
    for dirpath, _, files in os.walk(root):
        hits += [os.path.join(dirpath, f) for f in files
                 if f.endswith(".png")]
    return hits


def test_phase_split_bedroom_with_int8_serving(tmp_path, monkeypatch):
    mc = tiny_model_cfg()
    log = str(tmp_path / "run")
    state = str(tmp_path / "state")
    for phase in ("calib", "recon", "sample"):
        _run_cli(["--task", "bedroom", "--phase", phase, "--logdir", log,
                  "--state_dir", state, "--serve", "int8"] + COMMON,
                 monkeypatch, mc)
    assert os.path.exists(os.path.join(state, "cali.npz"))
    imgs = _find_images(log)
    samples = [p for p in imgs if not os.path.basename(p).startswith("grid")]
    grids = [p for p in imgs if os.path.basename(p).startswith("grid")]
    assert len(samples) == 2
    assert len(grids) == 1  # grid-0000.png preview (opt out: --skip_grid)
    from PIL import Image
    arr = np.asarray(Image.open(samples[0]))
    assert arr.shape[:2] == (16, 16)


@pytest.mark.parametrize("encoder", ["tiny", "bert"])
def test_coco_cli_runs_weightless(tmp_path, monkeypatch, encoder):
    """The COCO task is runnable without CLIP weights via --text_encoder."""
    mc = tiny_model_cfg(cond="text", transformer=True)
    log = str(tmp_path / f"coco_{encoder}")
    prompts = tmp_path / "prompts.txt"
    prompts.write_text("a red cube\na blue sphere\n")
    _run_cli(["--task", "coco", "--logdir", log, "--text_encoder", encoder,
              "--prompts_file", str(prompts)] + COMMON, monkeypatch, mc)
    assert _find_images(log)


def test_bundle_export_and_serve_roundtrip(tmp_path, monkeypatch):
    """--export_bundle writes the packed-int4 artifact; a fresh process
    serving --bundle (no quant state) reproduces the same images."""
    mc = tiny_model_cfg()
    log = str(tmp_path / "run")
    state = str(tmp_path / "state")
    bundle = str(tmp_path / "bundle")
    for phase in ("calib", "recon"):
        _run_cli(["--task", "bedroom", "--phase", phase, "--logdir", log,
                  "--state_dir", state] + COMMON, monkeypatch, mc)
    _run_cli(["--task", "bedroom", "--phase", "sample", "--logdir", log,
              "--state_dir", state, "--serve", "int8", "--skip_grid",
              "--export_bundle", bundle] + COMMON, monkeypatch, mc)
    import json
    assert os.path.isdir(bundle)
    with open(bundle + ".meta.json") as f:
        stats = json.load(f)
    assert stats["bundle_bytes"] < stats["fp32_bytes"]

    log2 = str(tmp_path / "run2")
    _run_cli(["--task", "bedroom", "--phase", "sample", "--logdir", log2,
              "--state_dir", state, "--bundle", bundle, "--skip_grid"]
             + COMMON, monkeypatch, mc)
    from PIL import Image
    a = sorted(_find_images(log))
    b = sorted(_find_images(log2))
    assert len(b) == 2
    for pa, pb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(Image.open(pa)),
                                      np.asarray(Image.open(pb)))
