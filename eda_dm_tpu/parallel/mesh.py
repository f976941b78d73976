"""Device-mesh utilities for data-parallel calibration and sampling.

The reference is strictly single-GPU (scripts/for_*.sh pin
CUDA_VISIBLE_DEVICES; SURVEY §2).  Here scale-out is first-class: a 1-D
``dp`` mesh shards the batch axis of trajectory generation, activation-scale
calibration, reconstruction minibatches and FID sampling.  Everything rides
GSPMD — inputs carry NamedShardings, parameters are replicated, and XLA
inserts the cross-chip collectives (the all-reduce of activation min/max/MSE
statistics falls out of the global reductions inside the calibration
graphs).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(mesh: Mesh, tree: Any, axis: str = "dp") -> Any:
    """Put every array with its leading (batch) dim sharded over the mesh."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, tree)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    return NamedSharding(mesh, P(axis))
