"""EMA shadow-weight extraction parity vs the reference's LitEma.

Every latent task in the reference swaps EMA weights into the model before
quantization (sample_diffusion_ldm_bedroom.py:256-257, sample_txt2img.py:234
via ema_scope; ldm/modules/ema.py:5).  These tests verify that
``apply_ema_weights`` reproduces exactly what ``LitEma.copy_to`` would have
put into the UNet, from the checkpoint alone.
"""

import numpy as np
import pytest

from eda_dm_tpu.models.convert import (apply_ema_weights,
                                       split_latent_diffusion_state_dict)


def _tiny_torch_unet():
    import torch.nn as nn

    class Inner(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = nn.Conv2d(3, 4, 3)
            self.blocks = nn.ModuleList([nn.Linear(4, 4) for _ in range(2)])
            self.norm = nn.GroupNorm(2, 4)

    class Wrapper(nn.Module):
        """Stands in for DiffusionWrapper: params named diffusion_model.*"""
        def __init__(self):
            super().__init__()
            self.diffusion_model = Inner()

    return Wrapper()


def test_apply_ema_weights_squash_mapping():
    """Pure mapping test: dots are squashed, non-model keys untouched."""
    sd = {
        "model.diffusion_model.conv.weight": np.ones((4, 3, 3, 3)),
        "model.diffusion_model.blocks.0.bias": np.zeros((4,)),
        "first_stage_model.conv.weight": np.full((2,), 7.0),
        "model_ema.diffusion_modelconvweight": np.full((4, 3, 3, 3), 2.0),
        "model_ema.diffusion_modelblocks0bias": np.full((4,), 3.0),
        "model_ema.decay": np.asarray(0.9999),
        "model_ema.num_updates": np.asarray(100),
    }
    out, n = apply_ema_weights(sd)
    assert n == 2
    assert (out["model.diffusion_model.conv.weight"] == 2.0).all()
    assert (out["model.diffusion_model.blocks.0.bias"] == 3.0).all()
    assert (out["first_stage_model.conv.weight"] == 7.0).all()
    # split after the swap keeps the EMA values
    unet, first, cond = split_latent_diffusion_state_dict(out)
    assert (unet["conv.weight"] == 2.0).all()


def test_apply_ema_weights_no_shadows_passthrough():
    sd = {"model.diffusion_model.conv.weight": np.ones((2,))}
    out, n = apply_ema_weights(sd)
    assert n == 0 and (out["model.diffusion_model.conv.weight"] == 1.0).all()


@pytest.mark.slow
def test_ema_parity_vs_reference_litema(reference_path):
    """Build a LitEma-carrying checkpoint on random weights; our extraction
    must equal torch's post-copy_to parameters (VERDICT round-1 item #2)."""
    import torch
    from ldm.modules.ema import LitEma

    torch.manual_seed(0)
    model = _tiny_torch_unet()
    ema = LitEma(model)
    # drift the live weights, then EMA-update a few times so shadows differ
    # from both the init and the final live values
    for _ in range(3):
        with torch.no_grad():
            for p in model.parameters():
                p.add_(torch.randn_like(p))
        ema(model)

    # assemble a lightning-style checkpoint: live weights + EMA buffers
    sd = {f"model.{k}": v.clone() for k, v in model.state_dict().items()}
    sd.update({f"model_ema.{k}": v.clone() for k, v in ema.state_dict().items()})

    # what the reference would serve: copy_to mutates the live params
    ema.copy_to(model)
    expected = {f"model.{k}": v for k, v in model.state_dict().items()}

    swapped, n = apply_ema_weights(sd)
    n_params = sum(1 for _ in model.parameters())
    assert n == n_params
    for k, v in expected.items():
        np.testing.assert_array_equal(np.asarray(swapped[k]), np.asarray(v),
                                      err_msg=k)
