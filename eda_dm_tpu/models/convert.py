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

import os
import re
from typing import Any, Dict, Mapping

import numpy as np


# The reference's pretrained-checkpoint registry (ckpt_util.py:5-35); kept for
# API parity — in an offline environment `load_ddpm_checkpoint` simply reads a
# local path.
DDPM_CKPT_NAMES = {
    "cifar10": "diffusion_cifar10_model/model-790000.ckpt",
    "ema_cifar10": "ema_diffusion_cifar10_model/model-790000.ckpt",
    "lsun_bedroom": "diffusion_lsun_bedroom_model/model-2388000.ckpt",
    "ema_lsun_bedroom": "ema_diffusion_lsun_bedroom_model/model-2388000.ckpt",
    "lsun_cat": "diffusion_lsun_cat_model/model-1761000.ckpt",
    "ema_lsun_cat": "ema_diffusion_lsun_cat_model/model-1761000.ckpt",
    "lsun_church": "diffusion_lsun_church_model/model-4432000.ckpt",
    "ema_lsun_church": "ema_diffusion_lsun_church_model/model-4432000.ckpt",
}

# published md5 digests of the Heidelberg checkpoints (ckpt_util.py:26-35)
DDPM_CKPT_MD5 = {
    "cifar10": "82ed3067fd1002f5cf4c339fb80c4669",
    "ema_cifar10": "1fa350b952534ae442b1d5235cce5cd3",
    "lsun_bedroom": "f70280ac0e08b8e696f42cb8e948ff1c",
    "ema_lsun_bedroom": "1921fa46b66a3665e450e42f36c2720f",
    "lsun_cat": "bbee0e7c3d7abfb6e2539eaf2fb9987b",
    "ema_lsun_cat": "646f23f4821f2459b8bafc57fd824558",
    "lsun_church": "eb619b8a5ab95ef80f94ce8a5488dae3",
    "ema_lsun_church": "fdc68a23938c2397caba4a260bc2445f",
}


def md5_hash(path: str, chunk: int = 1 << 20) -> str:
    import hashlib
    h = hashlib.md5()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def get_ckpt_path(name: str, root: str, check: bool = True) -> str:
    """Resolve + MD5-validate a pretrained DDPM checkpoint under ``root``.

    Offline analogue of the reference's ``get_ckpt_path``
    (ckpt_util.py:38-72): same name registry and digests, but instead of
    downloading it validates a locally provided file and raises with the
    source URL when the file is absent or corrupt.
    """
    if "church_outdoor" in name:
        name = name.replace("church_outdoor", "church")
    if name not in DDPM_CKPT_NAMES:
        raise KeyError(f"unknown checkpoint '{name}'; "
                       f"known: {sorted(DDPM_CKPT_NAMES)}")
    path = os.path.join(root, DDPM_CKPT_NAMES[name])
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"checkpoint '{name}' not found at {path}; this environment has "
            "no network egress — place the file there manually "
            "(Heidelberg heibox mirror, see reference ckpt_util.py URL_MAP)")
    if check:
        got = md5_hash(path)
        if got != DDPM_CKPT_MD5[name]:
            raise ValueError(f"md5 mismatch for {path}: got {got}, "
                             f"expected {DDPM_CKPT_MD5[name]}")
    return path


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


# --------------------------------------------------------------------------
# LDM / Stable Diffusion UNet (openaimodel) and LatentDiffusion checkpoints
# --------------------------------------------------------------------------

_LDM_MERGE = [
    (re.compile(r"^time_embed\.(\d+)\."), lambda m: f"time_embed_{m.group(1)}."),
    (re.compile(r"^(input_blocks|output_blocks)\.(\d+)\.(\d+)\."),
     lambda m: f"{m.group(1)}_{m.group(2)}_{m.group(3)}."),
    (re.compile(r"^middle_block\.(\d+)\."), lambda m: f"middle_block_{m.group(1)}."),
    (re.compile(r"^out\.(\d+)\."), lambda m: f"out_{m.group(1)}."),
    (re.compile(r"\.(in_layers|out_layers|emb_layers)\.(\d+)\."),
     lambda m: f".{m.group(1)}_{m.group(2)}."),
    (re.compile(r"\.transformer_blocks\.(\d+)\."),
     lambda m: f".transformer_blocks_{m.group(1)}."),
    (re.compile(r"\.net\.0\.proj\."), lambda m: ".net_0_proj."),
    (re.compile(r"\.net\.2\."), lambda m: ".net_2."),
    (re.compile(r"\.to_out\.0\."), lambda m: ".to_out_0."),
]


def _translate_ldm_key(key: str) -> str:
    for pat, repl in _LDM_MERGE:
        key = pat.sub(repl, key)
    return key


def ldm_unet_state_dict_to_params(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Convert a reference ``UNetModel`` state dict
    (ldm/modules/diffusionmodules/openaimodel.py:447) to LDMUNet params.

    Conv1d qkv/proj_out weights (O, I, 1) become dense kernels (I, O) — the
    flax attention block computes them as matmuls over the channels-last
    sequence layout.
    """
    params: Dict[str, Any] = {}
    for key, val in state_dict.items():
        arr = np.asarray(getattr(val, "numpy", lambda: val)()
                         if hasattr(val, "numpy") else val, dtype=np.float32)
        tkey = _translate_ldm_key(key)
        parts = tkey.split(".")
        leaf = parts[-1]
        if key.startswith("label_emb."):
            leaf, arr = "embedding", arr
        elif leaf == "weight":
            if arr.ndim == 4:
                leaf, arr = "kernel", np.transpose(arr, (2, 3, 1, 0))
            elif arr.ndim == 3:                       # conv1d → dense
                leaf, arr = "kernel", np.transpose(arr[..., 0], (1, 0))
            elif arr.ndim == 2:
                leaf, arr = "kernel", np.transpose(arr, (1, 0))
            else:
                leaf = "scale"                        # GroupNorm / LayerNorm
        _insert(params, parts[:-1] + [leaf], arr)
    return params


def apply_ema_weights(state_dict: Mapping[str, Any],
                      prefix: str = "model.",
                      ema_prefix: str = "model_ema."):
    """Swap EMA shadow weights into the ``model.*`` entries of a checkpoint.

    Mirrors ``LitEma.copy_to`` (/root/reference/ldm/modules/ema.py:5,46-58)
    as invoked by every latent task before quantization
    (scripts/sample_diffusion_ldm_bedroom.py:256-257,
    sample_diffusion_ldm_church.py:252-253,
    sample_diffusion_ldm_imagenet.py:216, sample_txt2img.py:234 via
    ``model.ema_scope()``).  CompVis lightning checkpoints store *both* the
    raw trainable weights (``model.diffusion_model.*``) and the EMA shadows:
    ``LitEma`` registers one buffer per trainable parameter, named by
    stripping every ``.`` from the parameter name, so the checkpoint keys are
    ``model_ema.<name-without-dots>``.  The squashing is inverted here by
    mapping *forward* from each ``model.*`` key.  ``copy_to`` additionally
    looks names containing ``.model.`` up under the contracted name
    (ema.py:52); that fallback is reproduced.

    Returns ``(new_state_dict, n_swapped)``.  ``n_swapped == 0`` means the
    checkpoint carries no EMA shadows (e.g. the Heidelberg DDPM pickles,
    whose weights are already EMA) and the input is returned unchanged.
    """
    ema = {k[len(ema_prefix):]: v for k, v in state_dict.items()
           if k.startswith(ema_prefix)}
    if not ema:
        return dict(state_dict), 0
    out: Dict[str, Any] = {}
    n = 0
    for k, v in state_dict.items():
        if k.startswith(prefix) and not k.startswith(ema_prefix):
            pname = k[len(prefix):]
            squashed = pname.replace(".", "")
            contracted = pname.replace(".model.", ".").replace(".", "")
            if squashed in ema:
                v, n = ema[squashed], n + 1
            elif contracted in ema:
                v, n = ema[contracted], n + 1
        out[k] = v
    return out, n


def split_latent_diffusion_state_dict(state_dict: Mapping[str, Any]):
    """Split a LatentDiffusion checkpoint into its three component dicts.

    Reference checkpoints prefix the UNet with ``model.diffusion_model.``,
    the VAE with ``first_stage_model.`` and the conditioner with
    ``cond_stage_model.`` (e.g. loads at
    scripts/sample_diffusion_ldm_bedroom.py:169-186).
    """
    unet, first_stage, cond_stage = {}, {}, {}
    for k, v in state_dict.items():
        if k.startswith("model.diffusion_model."):
            unet[k[len("model.diffusion_model."):]] = v
        elif k.startswith("first_stage_model."):
            first_stage[k[len("first_stage_model."):]] = v
        elif k.startswith("cond_stage_model."):
            cond_stage[k[len("cond_stage_model."):]] = v
    return unet, first_stage, cond_stage


def load_ldm_checkpoint(path: str, use_ema: bool = True):
    """torch.load a LatentDiffusion checkpoint and convert the UNet part.

    ``use_ema=True`` (the reference's default behaviour — every latent task
    swaps EMA weights in before quantization, see :func:`apply_ema_weights`)
    replaces the raw UNet weights with their ``model_ema.*`` shadows when the
    checkpoint carries them.
    """
    import torch
    state = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    if use_ema:
        state, _ = apply_ema_weights(state)
    unet_sd, first_sd, cond_sd = split_latent_diffusion_state_dict(state)
    return ldm_unet_state_dict_to_params(unet_sd), first_sd, cond_sd


def load_ddpm_checkpoint(path: str) -> Dict[str, Any]:
    """torch.load a DDPM checkpoint file and convert it."""
    import torch
    state = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    return ddpm_state_dict_to_params(state)
