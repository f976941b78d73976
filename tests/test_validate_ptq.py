"""Turnkey validation harness smoke (scripts/validate_ptq.py).

Runs the full command path — PTQ → paired FP/quant sampling → in-framework
Inception features → FID delta — on tiny random-weight models, i.e. exactly
what a user runs with real checkpoints (reference eval loop:
scripts/sample_diffusion_ddim.py:265-328 + scripts/test.py)."""

import json
import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))


def _run(tmp_path, argv):
    from validate_ptq import main
    out = str(tmp_path / "run")
    res = main(argv + ["--out", out])
    saved = json.load(open(os.path.join(out, "result.json")))
    assert saved == res
    feats = np.load(os.path.join(out, "features.npz"))
    assert feats["fp"].shape == feats["quant"].shape
    assert np.isfinite(feats["fp"]).all() and np.isfinite(feats["quant"]).all()
    assert np.isfinite(res["fid_quant_vs_fp"])
    # the quant arm must actually be quantized (not the FP graph again)
    assert not np.allclose(feats["fp"], feats["quant"])
    return res


def test_validate_cifar_tiny_end_to_end(tmp_path):
    res = _run(tmp_path, ["--task", "cifar", "--tiny", "--n", "8",
                          "--batch_size", "4", "--calib_num_samples", "8",
                          "--iters", "2", "--timesteps", "4"])
    assert res["task"] == "cifar" and res["n"] == 8
    assert not res["real_weights"] and not res["real_inception"]


def test_validate_coco_tiny_int8_serving(tmp_path):
    res = _run(tmp_path, ["--task", "coco", "--tiny", "--n", "4",
                          "--batch_size", "2", "--calib_num_samples", "4",
                          "--batch_samples", "4", "--iters", "2",
                          "--custom_steps", "3", "--serve", "int8",
                          "--text_encoder", "tiny", "--no_recon"])
    assert res["serve"] == "int8"
