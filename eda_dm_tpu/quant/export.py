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
# native int8 path: integer weights + int8-quantized activations feed int8
# MXU convs/matmuls (requires export_serving_int8)
DEPLOY_INT8 = QuantMode(a_quant=True, int8=True)


def carrier_dtype(variables: Dict[str, Any]):
    """The serving carrier dtype: the floating dtype of the (folded) params
    (bf16 for ``export_serving``/``export_serving_int8`` defaults, f32 for
    ``fold_quantized_weights`` or un-exported trees).

    Samplers cast the *model input* to this dtype at serving time — with an
    f32 input every layer promotes back to f32 (lax dtype promotion) and the
    bf16 carrier silently never materializes; the denoising update math
    itself stays f32.
    """
    leaves = [l for l in jax.tree_util.tree_leaves(variables.get("params", {}))
              if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)]
    return leaves[0].dtype if leaves else jnp.float32


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


def export_serving_int8(variables: Dict[str, Any], qc: QuantConfig,
                        dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Deployment export for the native-int8 path (``DEPLOY_INT8``).

    On top of :func:`export_serving` (folded weights for the layers that
    stay on the bf16 path — 8-bit first/last, output layer), every W≤7-bit
    quantized layer gains integer-weight leaves in its quant subtree:

    ``w{i}_int``  : the hard-AdaRound centered integer codes (int8), exactly
                    the integers whose ``q·Δ`` is the folded kernel;
    ``w{i}_isum`` : per-output-channel sums of those integers (f32), used to
                    fold the activation zero-point correction into the conv
                    epilogue (the −128 recentering that makes 8-bit act codes
                    int8-representable contributes ``c·Σw`` per channel).

    The layer forwards then run ``int8 conv/matmul → int32`` on the MXU's
    int8 mode (measured ~1.3× the bf16 rate on this chip) with an exact f32
    dequantization epilogue — numerics identical to the fake-quant path up
    to the f32 epilogue algebra.
    """
    from .adaround import adaround_int

    out = export_serving(variables, qc, dtype)

    def walk(params: Dict[str, Any], quant: Dict[str, Any]):
        new_q = dict(quant)
        for k, v in params.items():
            q = quant.get(k) if isinstance(quant, dict) else None
            if isinstance(v, dict) and isinstance(q, dict):
                new_q[k] = walk(v, q)
        if "kernel" in params and isinstance(quant, dict) \
                and "w0_delta" in quant:
            kernel = params["kernel"]
            axis = kernel.ndim - 2
            levels = 2 ** int(quant["w0_bits"])
            if levels <= 128:            # centered codes fit int8 exactly
                if "w1_delta" in quant:
                    split = quant["w0_alpha"].shape[axis]
                    parts = [(0, split, "w0"), (split, kernel.shape[axis],
                                                "w1")]
                else:
                    parts = [(0, kernel.shape[axis], "w0")]
                for s, e, name in parts:
                    kp = jax.lax.slice_in_dim(kernel, s, e, axis=axis)
                    q_int = adaround_int(kp, quant[f"{name}_delta"],
                                         quant[f"{name}_zp"],
                                         quant[f"{name}_alpha"], levels)
                    red = tuple(range(kernel.ndim - 1))
                    new_q[f"{name}_int"] = q_int.astype(jnp.int8)
                    new_q[f"{name}_isum"] = jnp.sum(q_int, axis=red) \
                        .astype(jnp.float32)
        return new_q

    new_quant = walk(variables["params"], out["quant"])
    return {**out, "quant": new_quant}


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
