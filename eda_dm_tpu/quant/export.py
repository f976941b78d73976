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


# ---------------------------------------------------------------------------
# Compact serving bundle: packed-int4 weight codes, reconstructible leaves
# dropped.  The TPU analogue of the reference's shipped quantized-weight
# artifacts (README.md:70-73 Google-Drive W4A8 weights; deployment hand-off
# README.md:83-85): what leaves the calibration machine is the 4-bit codes
# plus per-channel scales, not a dequantized float model.


def pack_int4_codes(codes, zp):
    """Pack centered ≤4-bit integer codes two-per-byte.

    ``codes`` are :func:`~eda_dm_tpu.quant.adaround.adaround_int`'s centered
    integers (int8); adding back the integer-valued zero-point gives the
    unsigned grid position ``q ∈ [0, 15]``, which fits a nibble.  Returns
    ``(packed, shape)`` — a 1-D uint8 array of ``ceil(n/2)`` bytes (low
    nibble first) and the original code shape.
    """
    import numpy as np

    zp_i = np.asarray(zp)
    zp_int = np.rint(zp_i).astype(np.int32)
    assert np.all(zp_i == zp_int), "zero-point must be integer-valued"
    uns = np.asarray(codes, np.int32) + zp_int        # broadcasts over zp
    assert uns.min() >= 0 and uns.max() <= 15, \
        f"codes+zp out of nibble range: [{uns.min()}, {uns.max()}]"
    flat = uns.reshape(-1).astype(np.uint8)
    if flat.size % 2:
        flat = np.concatenate([flat, np.zeros((1,), np.uint8)])
    packed = flat[0::2] | (flat[1::2] << 4)
    return packed, uns.shape


def unpack_int4_codes(packed, shape, zp):
    """Inverse of :func:`pack_int4_codes`: centered int8 codes of ``shape``."""
    import numpy as np

    packed = np.asarray(packed, np.uint8)
    n = int(np.prod(shape))
    flat = np.empty((packed.size * 2,), np.int32)
    flat[0::2] = packed & 0xF
    flat[1::2] = packed >> 4
    zp_int = np.rint(np.asarray(zp)).astype(np.int32)
    return (flat[:n].reshape(shape) - zp_int).astype(np.int8)


def tree_nbytes(tree) -> int:
    """Total leaf bytes of a pytree of arrays."""
    return sum(int(l.nbytes) for l in jax.tree_util.tree_leaves(tree)
               if hasattr(l, "nbytes"))


def serving_bundle(variables: Dict[str, Any], qc: QuantConfig,
                   dtype=jnp.bfloat16):
    """Build the compact deployment artifact from calibrated variables.

    Starting from :func:`export_serving_int8`, every leaf that is exactly
    reconstructible at load time is dropped, and the W≤4-bit integer codes
    are packed two-per-byte:

    * ``w{i}_int`` → ``w{i}_pack`` (uint8 nibbles) + ``w{i}_packshape``
      when the layer's weight width ≤ 4 bits;
    * int8-layer folded kernels are dropped (``= codes·Δ`` cast to the
      carrier dtype — bit-identical to the fold, which computes the same
      ``q·Δ`` product in f32 before casting);
    * ``w{i}_isum`` is dropped (``= Σ codes``, exact in f32 for any
      realistic kernel size);
    * AdaRound alphas of code-carrying layers are dropped (consumed by
      folding; kernel-sized f32 — the bulk of the post-export quant tree);
      folded-only 8-bit layers keep theirs, whose shape carries the split
      geometry.

    Returns ``(bundle, stats)`` where ``stats`` records bundle bytes, the
    fp32 model's bytes, and the compression ratio.  The bundle is
    **serve-only**: :func:`restore_serving_bundle` yields a tree whose
    DEPLOY / DEPLOY_INT8 forwards are bit-identical to the in-memory
    export, but calibration modes (``w_quant``) must not be run on it —
    the kernels are already folded and the restored alphas are placeholder
    zeros.

    This is a disk/transport format (reference ships its W4A8 artifacts the
    same way, README.md:70-73); serve-time HBM is unchanged because the
    restore rebuilds the full one-treedef variable structure.
    """
    import numpy as np

    serving = export_serving_int8(variables, qc, dtype)

    def walk(params: Dict[str, Any], quant: Dict[str, Any]):
        p_out, q_out = dict(params), dict(quant)
        for k, v in params.items():
            q = quant.get(k)
            if isinstance(v, dict) and isinstance(q, dict):
                p_out[k], q_out[k] = walk(v, q)
        if "w0_int" in quant:
            del p_out["kernel"]
            for name in ("w0", "w1"):
                if f"{name}_int" not in quant:
                    continue
                # alpha shape == codes shape, so it's recoverable; folded-
                # only (8-bit first/last) layers keep their alphas — small,
                # and their shape carries the split geometry
                del q_out[f"{name}_alpha"], q_out[f"{name}_isum"]
                if int(quant["w0_bits"]) <= 4:
                    packed, shape = pack_int4_codes(quant[f"{name}_int"],
                                                    quant[f"{name}_zp"])
                    del q_out[f"{name}_int"]
                    q_out[f"{name}_pack"] = packed
                    q_out[f"{name}_packshape"] = np.asarray(shape, np.int32)
        return p_out, q_out

    new_params, new_quant = walk(serving["params"], serving["quant"])
    bundle = {**serving, "params": new_params, "quant": new_quant}
    fp32_bytes = 4 * sum(int(np.prod(l.shape)) for l in
                         jax.tree_util.tree_leaves(variables["params"]))
    stats = {"bundle_bytes": tree_nbytes(bundle),
             "fp32_bytes": fp32_bytes,
             "compression": fp32_bytes / max(tree_nbytes(bundle), 1)}
    return bundle, stats


def restore_serving_bundle(bundle: Dict[str, Any], dtype=None):
    """Rebuild the full serving tree from a :func:`serving_bundle` artifact.

    Unpacks nibble codes, recomputes ``w{i}_isum`` and the folded kernels
    (``codes·Δ`` in f32 → carrier cast, the fold's exact algebra), and
    fills placeholder zero alphas so the one-treedef variable structure the
    layers declare in every mode is complete.  DEPLOY / DEPLOY_INT8
    forwards on the result are bit-identical to the pre-bundle export.
    """
    import numpy as np

    dtype = dtype or carrier_dtype(bundle)

    def walk(params: Dict[str, Any], quant: Dict[str, Any]):
        p_out, q_out = dict(params), dict(quant)
        for k in list(params):
            v, q = params[k], quant.get(k)
            if isinstance(v, dict) and isinstance(q, dict):
                p_out[k], q_out[k] = walk(v, q)
        has_codes = "w0_int" in quant or "w0_pack" in quant
        if has_codes and "kernel" not in params:
            parts = []
            for name in ("w0", "w1"):
                if f"{name}_pack" in quant:
                    shape = tuple(int(s)
                                  for s in np.asarray(quant[f"{name}_packshape"]))
                    codes = unpack_int4_codes(quant[f"{name}_pack"], shape,
                                              quant[f"{name}_zp"])
                    del q_out[f"{name}_pack"], q_out[f"{name}_packshape"]
                elif f"{name}_int" in quant:
                    codes = np.asarray(quant[f"{name}_int"])
                else:
                    continue
                q_out[f"{name}_int"] = jnp.asarray(codes)
                cf = jnp.asarray(codes, jnp.float32)
                red = tuple(range(codes.ndim - 1))
                q_out[f"{name}_isum"] = jnp.sum(cf, axis=red)
                # placeholder: never read in DEPLOY modes (see strip_alphas)
                q_out[f"{name}_alpha"] = jnp.zeros((1,), jnp.float32)
                parts.append(cf * jnp.asarray(quant[f"{name}_delta"],
                                              jnp.float32))
            kernel = (parts[0] if len(parts) == 1 else
                      jnp.concatenate(parts, axis=parts[0].ndim - 2))
            p_out["kernel"] = kernel.astype(dtype)
        return p_out, q_out

    new_params, new_quant = walk(bundle["params"], bundle["quant"])
    return {**bundle, "params": new_params, "quant": new_quant}


def strip_alphas(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Serve-time HBM strip: replace AdaRound alphas with ``zeros((1,))``.

    Alphas are consumed by folding/export; on the DEPLOY / DEPLOY_INT8
    paths the weight-quant state is still *declared* (the one-treedef
    invariant means ``_WeightQuant.make`` reads the variables in every
    mode) but its values are only used under ``mode.w_quant`` —
    nn/layers.py gates every consumer on it.  A broadcast placeholder
    keeps the declaration satisfied while freeing the f32 kernel-sized
    leaves (2× the bf16 kernel bytes; ~1.1 GB on the bedroom UNet), HBM
    that matters at production sampling batches.  Serve-only: running a
    calibration mode on a stripped tree re-initializes the alphas.
    """
    def walk(quant: Dict[str, Any]):
        out = dict(quant)
        for k, v in quant.items():
            if isinstance(v, dict):
                out[k] = walk(v)
            elif k.endswith("_alpha"):
                out[k] = jnp.zeros((1,), jnp.float32)
        return out
    if "quant" not in variables:
        return variables
    return {**variables, "quant": walk(variables["quant"])}
