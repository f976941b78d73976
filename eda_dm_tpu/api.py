"""Top-level convenience API.

The four-verb surface SURVEY §7 specifies, mirroring the reference's
``QuantModel`` / ``set_*_quantize_params`` / ``recon_*_Qmodel`` /
``sample_fid`` entry points:

    quantize_model(...)   → (model, variables)
    calibrate(...)        → variables with initialized scales
    reconstruct(...)      → variables with optimized rounding/scales
    sample(...)           → images

Task pipelines (`pipelines.cifar.CifarPipeline`, `pipelines.latent.
LDMPipeline`) remain the full-featured drivers; this facade is the
minimal-ceremony path.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax

from .quant.config import QuantConfig, QuantMode, FP, WAQ
from .quant.export import (fold_quantized_weights, export_serving,
                           export_serving_int8, DEPLOY, DEPLOY_INT8)
from .calib.scale_init import set_weight_quantize_params, \
    set_act_quantize_params
from .calib.recon import ReconArgs, reconstruct as _reconstruct


def quantize_model(model_family: str, arch=None,
                   qc: Optional[QuantConfig] = None,
                   key: Optional[jax.Array] = None,
                   ckpt_path: Optional[str] = None):
    """Build a quantization-aware model + variables.

    model_family: 'ddpm' (pixel UNet) or 'ldm' (openai UNet).
    """
    import jax.numpy as jnp
    qc = qc or QuantConfig()
    key = key if key is not None else jax.random.PRNGKey(0)
    if model_family == "ddpm":
        from .models.ddpm_unet import DDPMUNet, DDPMConfig
        from .models.convert import load_ddpm_checkpoint
        arch = arch or DDPMConfig()
        model = DDPMUNet(cfg=arch, qc=qc)
        x = jnp.zeros((1, arch.resolution, arch.resolution,
                       arch.in_channels))
        variables = model.init(key, x, jnp.zeros((1,)), FP)
        if ckpt_path:
            variables = {**variables, "params": jax.tree.map(
                jnp.asarray, load_ddpm_checkpoint(ckpt_path))}
        return model, variables
    if model_family == "ldm":
        from .models.ldm_unet import LDMUNet, LDMUNetConfig
        from .models.convert import load_ldm_checkpoint
        arch = arch or LDMUNetConfig()
        model = LDMUNet(cfg=arch, qc=qc)
        x = jnp.zeros((1, arch.image_size, arch.image_size,
                       arch.in_channels))
        ctx = (jnp.zeros((1, 1, arch.context_dim))
               if arch.context_dim else None)
        variables = model.init(key, x, jnp.zeros((1,)), context=ctx, mode=FP)
        if ckpt_path:
            unet_params, _, _ = load_ldm_checkpoint(ckpt_path)
            variables = {**variables,
                         "params": jax.tree.map(jnp.asarray, unet_params)}
        return model, variables
    raise ValueError(model_family)


def calibrate(model, variables: Dict[str, Any], cali_data: Sequence,
              act_batch_size: int = 256) -> Dict[str, Any]:
    """Weight + activation scale initialization over a calibration set."""
    variables = set_weight_quantize_params(model, variables, cali_data)
    return set_act_quantize_params(model, variables, cali_data,
                                   batch_size=act_batch_size)


def reconstruct(model, variables: Dict[str, Any], cali_data: Sequence,
                plan=None, args: Optional[ReconArgs] = None,
                key: Optional[jax.Array] = None, mode: str = "block",
                progress=None) -> Dict[str, Any]:
    """AdaRound + FBR reconstruction over a plan (auto-derived if omitted)."""
    if plan is None:
        from .models.ddpm_unet import DDPMUNet, ddpm_recon_plan, \
            ddpm_layer_plan
        from .models.ldm_unet import LDMUNet, ldm_recon_plan
        if isinstance(model, DDPMUNet):
            plan = (ddpm_recon_plan if mode == "block"
                    else ddpm_layer_plan)(model.cfg, model.qc)
        elif isinstance(model, LDMUNet):
            plan = ldm_recon_plan(model.cfg, model.qc)
        else:
            raise ValueError("pass an explicit plan for custom models")
    return _reconstruct(model, variables, cali_data, plan,
                        args or ReconArgs(),
                        key if key is not None else jax.random.PRNGKey(0),
                        progress=progress)


def export_for_serving(variables: Dict[str, Any], qc: QuantConfig,
                       kind: str = "int8", lean: bool = True
                       ) -> Tuple[Dict[str, Any], QuantMode]:
    """Deployment export.  Returns ``(variables, serve_mode)`` — always
    forward with the returned mode; each export kind is only correct under
    its paired mode (int8 trees carry integer leaves the DEPLOY graph never
    reads, and folded bf16 trees lack them).

    kind='int8'  → integer weights + int8 MXU convs/matmuls, served under
                   ``DEPLOY_INT8`` (fastest measured path, PERF.md).
    kind='bf16'  → folded weights cast to a bf16 carrier, served under
                   ``DEPLOY``.
    kind='fold'  → folded weights at original dtype (exact ≡ fake-quant),
                   served under ``DEPLOY``.

    ``lean`` (int8/bf16 kinds) strips the AdaRound alphas to placeholders —
    kernel-sized f32 leaves the DEPLOY graphs never read (~1.1 GB HBM on
    the bedroom UNet); pass ``lean=False`` to keep a tree that can be
    re-folded or re-calibrated.
    """
    from .quant.export import strip_alphas
    if kind == "int8":
        out = export_serving_int8(variables, qc)
        return (strip_alphas(out) if lean else out), DEPLOY_INT8
    if kind == "bf16":
        out = export_serving(variables, qc)
        return (strip_alphas(out) if lean else out), DEPLOY
    if kind == "fold":
        return fold_quantized_weights(variables, qc), DEPLOY
    raise ValueError(f"unknown export kind: {kind!r}")


def save_bundle(variables: Dict[str, Any], qc: QuantConfig,
                path: str) -> Dict[str, Any]:
    """Build and persist the packed-int4 deployment artifact (the hand-off
    the reference ships as its Google-Drive W4A8 weights, README.md:70-73):
    4-bit codes two-per-byte + per-channel scales, folded kernels / code
    sums / AdaRound alphas dropped and rebuilt exactly at load.  Returns
    the size stats (bundle bytes, fp32 bytes, compression ratio)."""
    from .quant.export import serving_bundle
    from .utils.checkpointing import save_serving_bundle
    bundle, stats = serving_bundle(variables, qc)
    save_serving_bundle(path, bundle, stats)
    return stats


def load_bundle(path: str) -> Tuple[Dict[str, Any], QuantMode]:
    """Load a :func:`save_bundle` artifact into a serve-ready tree.
    Returns ``(variables, DEPLOY_INT8)`` — bit-identical serving to the
    in-memory ``export_for_serving(kind='int8')`` output."""
    from .utils.checkpointing import load_serving_bundle
    return load_serving_bundle(path), DEPLOY_INT8
