"""Device mesh / sharding layer -- TPU-native, no reference equivalent
(SURVEY.md section 2f: the reference is strictly single-GPU; this layer is
the rebuild's first-class parallelism substrate).

Design: a 2-axis `jax.sharding.Mesh` ("data", "model").

  * "data": batch data-parallelism over ICI within a slice (gradients are
    reduced by XLA-inserted psums when the batch is sharded).
  * "model": tensor-parallel axis for the channel dimension of wide layers;
    at Deep Xi scale (2-5M params) it stays size 1, but shardings are
    threaded through so larger variants scale without code changes.

Multi-host: `jax.distributed.initialize` + the same mesh spanning all
processes; DCN only ever carries the "data" axis.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a ("data", "model") mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model > len(devices):
        raise ValueError(f"mesh {n_data}x{n_model} exceeds {len(devices)} devices")
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch arrays: leading axis over "data"."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding(mesh: Mesh, path_leaf) -> NamedSharding:
    """Parameter shardings. Conv/dense kernels shard their output-channel
    axis over "model" when it divides evenly; everything else replicates.
    With n_model == 1 this degenerates to full replication."""
    n_model = mesh.shape[MODEL_AXIS]
    arr = path_leaf
    if n_model > 1 and hasattr(arr, "shape") and arr.ndim >= 2 \
            and arr.shape[-1] % n_model == 0:
        spec = [None] * (arr.ndim - 1) + [MODEL_AXIS]
        return NamedSharding(mesh, P(*spec))
    return NamedSharding(mesh, P())


def shard_params(mesh: Mesh, params):
    """Apply param_sharding across a pytree of parameters."""
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, param_sharding(mesh, a)), params)


def shard_batch(mesh: Mesh, batch):
    """Place a host batch onto the mesh, leading axis over "data"."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), batch)
