"""Deployment export: fold quantized weights into the parameter tree.

Weight fake-quantization is input-independent, so at serving time the
dequantized weights can be baked into 'params' once; the forward then runs
with ``QuantMode(a_quant=True)`` only and is numerically identical to the
full W+A fake-quant path while paying no per-step weight-quantization work.
This is the TPU analogue of the reference's deployment hand-off
(README.md:83-85 exports to external INT kernels); the int8-storage variant
(``ops/pallas_quant.py``) additionally halves/quarters weight HBM traffic.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from .adaround import adaround_fake_quant
from .config import QuantConfig, QuantMode

# serving mode after folding: activations quantize, weights are pre-baked
DEPLOY = QuantMode(a_quant=True)
# + Pallas fused quantize+matmul on 1x1 convs / denses
DEPLOY_FUSED = QuantMode(a_quant=True, fused=True)


def fold_quantized_weights(variables: Dict[str, Any],
                           qc: QuantConfig) -> Dict[str, Any]:
    """Replace every quantized layer's kernel with its (hard-rounded)
    dequantized value.

    Walks params/quant in parallel; a layer is quantized iff its quant
    subtree carries ``w0_delta``.  Split layers fold their two channel
    groups with their own (delta, zp, alpha) sets
    (quant_layer.py:424-427 semantics).

    Per-layer bit-width overrides (first/last 8-bit) are honored via the
    ``w*_bits`` leaves the layers record in the quant state.
    """
    del qc  # widths come from the per-layer state

    def fold(params: Dict[str, Any], quant: Dict[str, Any]):
        out = dict(params)
        for k, v in params.items():
            q = quant.get(k) if isinstance(quant, dict) else None
            if isinstance(v, dict):
                out[k] = fold(v, q or {})
        if "kernel" in params and isinstance(quant, dict) \
                and "w0_delta" in quant:
            kernel = params["kernel"]
            axis = kernel.ndim - 2          # input-channel axis (HWIO / IO)
            levels = 2 ** int(quant["w0_bits"])
            if "w1_delta" in quant:
                split = quant["w0_alpha"].shape[axis]
                k0 = jax.lax.slice_in_dim(kernel, 0, split, axis=axis)
                k1 = jax.lax.slice_in_dim(kernel, split, kernel.shape[axis],
                                          axis=axis)
                k0 = adaround_fake_quant(k0, quant["w0_delta"],
                                         quant["w0_zp"], quant["w0_alpha"],
                                         levels, soft=False)
                k1 = adaround_fake_quant(k1, quant["w1_delta"],
                                         quant["w1_zp"], quant["w1_alpha"],
                                         levels, soft=False)
                out["kernel"] = jnp.concatenate([k0, k1], axis=axis)
            else:
                out["kernel"] = adaround_fake_quant(
                    kernel, quant["w0_delta"], quant["w0_zp"],
                    quant["w0_alpha"], levels, soft=False)
        return out

    new_params = fold(variables["params"], variables["quant"])
    return {**variables, "params": new_params}


def export_serving(variables: Dict[str, Any], qc: QuantConfig,
                   dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Full deployment export: fold quantized weights, then cast the params
    to the serving carrier dtype (bf16 by default).

    The numerics stay W4A8: weights carry their hard-rounded 4/8-bit values
    (folding is exact; the bf16 cast of an int4 grid point times a scale is
    the only difference) and activations still pass through their 8-bit
    quantizers, whose level boundaries are computed in f32
    (quant/affine.py::fake_quant) so bf16 and f32 serving pick the same
    levels.  bf16 is the TPU carrier for the quantized numbers exactly as
    int8 CUTLASS kernels are the reference's carrier (README.md:83-85); on
    TPU it halves all VPU/HBM activation traffic vs the FP32 baseline.

    Quantizer state ('quant') is kept in f32.
    """
    folded = fold_quantized_weights(variables, qc)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(dtype)
        if jnp.issubdtype(a.dtype, jnp.floating) else a,
        folded["params"])
    return {**folded, "params": params}
