"""PyTorch checkpoint → flax parameter conversion.

Covers the DDPM (pixel-space) checkpoint family used by the reference
(/root/reference/ddim/functions/ckpt_util.py:5-72 auto-downloads the
Heidelberg ``ema_cifar10`` / ``ema_lsun_*`` pickles;
/root/reference/scripts/sample_diffusion_ddim.py:146-148 loads them with a
plain ``load_state_dict``).  Layout conventions:

* conv weight  (O, I, H, W) → kernel (H, W, I, O)
* linear weight (O, I)      → kernel (I, O)
* GroupNorm weight/bias     → scale/bias
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import numpy as np


# The reference's pretrained-checkpoint registry (ckpt_util.py:5-35); kept for
# API parity — in an offline environment `load_ddpm_checkpoint` simply reads a
# local path.
DDPM_CKPT_NAMES = {
    "ema_cifar10": "ema_diffusion_cifar10_model/model-790000.ckpt",
    "ema_lsun_bedroom": "ema_diffusion_lsun_bedroom_model/model-2388000.ckpt",
    "ema_lsun_church": "ema_diffusion_lsun_church_model/model-4432000.ckpt",
    "ema_lsun_cat": "ema_diffusion_lsun_cat_model/model-1761000.ckpt",
}


def _convert_leaf(key: str, value: np.ndarray) -> tuple[str, np.ndarray]:
    leaf = key.split(".")[-1]
    if leaf == "weight":
        if value.ndim == 4:                       # conv OIHW → HWIO
            return "kernel", np.transpose(value, (2, 3, 1, 0))
        if value.ndim == 2:                       # linear OI → IO
            return "kernel", np.transpose(value, (1, 0))
        return "scale", value                     # norm weight → scale
    return leaf, value                            # bias


_DDPM_RULES = [
    (re.compile(r"^temb\.dense\.(\d+)\."), lambda m: f"temb_dense_{m.group(1)}."),
    (re.compile(r"^mid\."), lambda m: "mid_"),
    (re.compile(r"\.block\.(\d+)\."), lambda m: f".block_{m.group(1)}."),
    (re.compile(r"\.attn\.(\d+)\."), lambda m: f".attn_{m.group(1)}."),
    (re.compile(r"^down\.(\d+)\."), lambda m: f"down_{m.group(1)}."),
    (re.compile(r"^up\.(\d+)\."), lambda m: f"up_{m.group(1)}."),
    # norms inside ResnetBlock/AttnBlock are anonymous GroupNorms in flax
    (re.compile(r"\.norm1\."), lambda m: ".GroupNorm_0."),
    (re.compile(r"\.norm2\."), lambda m: ".GroupNorm_1."),
    (re.compile(r"\.norm\."), lambda m: ".GroupNorm_0."),
]


def _translate_ddpm_key(key: str) -> str:
    for pat, repl in _DDPM_RULES:
        key = pat.sub(repl, key)
    return key


def _insert(tree: Dict[str, Any], path: list[str], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def ddpm_state_dict_to_params(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Convert a reference DDPM ``Model`` state_dict to DDPMUNet params.

    Accepts torch tensors or numpy arrays; returns a nested numpy pytree for
    the 'params' collection.
    """
    params: Dict[str, Any] = {}
    for key, val in state_dict.items():
        if key == "logvar":                       # bayesian variant only
            continue
        arr = np.asarray(getattr(val, "numpy", lambda: val)()
                         if hasattr(val, "numpy") else val, dtype=np.float32)
        tkey = _translate_ddpm_key(key)
        parts = tkey.split(".")
        leaf, arr = _convert_leaf(tkey, arr)
        _insert(params, parts[:-1] + [leaf], arr)
    return params


def load_ddpm_checkpoint(path: str) -> Dict[str, Any]:
    """torch.load a DDPM checkpoint file and convert it."""
    import torch
    state = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    return ddpm_state_dict_to_params(state)
