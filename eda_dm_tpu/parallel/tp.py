"""Tensor- and spatial-parallel serving shardings.

The reference deployment is strictly single-GPU (its acceleration story is
per-chip INT8 CUDA kernels, README.md:83-124); scale-out here is the TPU
recipe instead: pick a mesh, annotate shardings, let GSPMD insert the
collectives.

* **tp (tensor parallel)** — parameters shard their *output* axis over the
  ``tp`` mesh axis (conv output channels, dense output features — attention
  heads fold into those channels in this codebase), the Megatron layout
  expressed as `NamedSharding` annotations rather than explicit collectives;
  XLA places the all-gathers/reduce-scatters on ICI.  Per-output-channel
  quantizer state (weight deltas/zero-points shaped ``(..., C_out)``) shards
  with its kernel so the dequant epilogue stays local to the shard.
* **sp (spatial parallel)** — activations shard their height axis for
  memory-bound high-resolution stages (the 256²/512² VAE decode);
  XLA handles the 3×3-conv halo exchanges automatically.  Attention over
  the full spatial extent all-gathers, so sp pays off where convs dominate.

Combined with the 1-D dp utilities (parallel/dp.py) this gives dp×tp
serving meshes; all of it is GSPMD — no torch.distributed/NCCL analogue of
the reference exists to translate.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh2d(n_dp: int, n_tp: int,
                axes: Tuple[str, str] = ("dp", "tp")) -> Mesh:
    """A 2-D (dp, tp) mesh over the first ``n_dp * n_tp`` devices."""
    devices = np.asarray(jax.devices()[:n_dp * n_tp]).reshape(n_dp, n_tp)
    return Mesh(devices, axes)


def tp_spec(leaf, tp_size: int, axis: str = "tp",
            min_shard: int = 2) -> P:
    """PartitionSpec sharding a parameter's output axis over ``axis``.

    The output axis is the last dimension for every parameter family in
    this codebase: conv kernels (H, W, C_in, C_out), dense kernels
    (C_in, C_out), biases/norm scales (C,), and per-output-channel
    quantizer state broadcast-shaped ``(1, 1, 1, C_out)`` / ``(C_out,)``.
    Indivisible or tiny trailing axes (scalars, per-tensor deltas,
    time-embedding widths not divisible by the mesh) replicate — GSPMD
    is correct either way, this only chooses what is worth sharding.
    """
    if getattr(leaf, "ndim", 0) == 0:
        return P()
    last = leaf.shape[-1]
    if last % tp_size or last // tp_size < min_shard:
        return P()
    return P(*([None] * (leaf.ndim - 1)), axis)


def shard_params_tp(mesh: Mesh, variables: Any, axis: str = "tp") -> Any:
    """device_put every collection leaf with its tp sharding.

    Works on a full variables dict (params + quant + any other
    collections): quantizer state rides the same last-axis rule, so a
    per-channel weight delta lands on the shard that owns its channels.
    """
    tp_size = mesh.shape[axis]

    def put(x):
        return jax.device_put(
            x, NamedSharding(mesh, tp_spec(x, tp_size, axis)))
    return jax.tree.map(put, variables)


def shard_spatial(mesh: Mesh, x: jax.Array, axis: str = "tp",
                  dim: int = 1) -> jax.Array:
    """Shard an activation's spatial ``dim`` (default H of NHWC) over the
    mesh axis.  Conv halo exchange is inserted by XLA."""
    spec = [None] * x.ndim
    spec[dim] = axis
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def tp_sample(sample_fn, variables, x_T, key, mesh: Mesh,
              dp_axis: str = "dp", tp_axis: str = "tp"):
    """Jitted sampling with batch over dp and parameters over tp.

    ``sample_fn(variables, x_T, key)`` is any jittable sampler step or
    whole trajectory (samplers/ddim.py, samplers/latent.py); the input
    shardings propagate through the scan and GSPMD partitions every
    matmul/conv over the tp axis.
    """
    variables = shard_params_tp(mesh, variables, tp_axis)
    x_T = jax.device_put(
        x_T, NamedSharding(mesh, P(dp_axis, *([None] * (x_T.ndim - 1)))))
    return jax.jit(sample_fn)(variables, x_T, key)
