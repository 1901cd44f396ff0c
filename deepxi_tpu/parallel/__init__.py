"""Mesh/sharding layer (TPU-native; no reference equivalent)."""

from deepxi_tpu.parallel.distributed import (init_distributed, is_primary,
                                              local_batch_slice)
from deepxi_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    param_sharding,
    replicated,
    shard_batch,
    shard_params,
)

__all__ = ["DATA_AXIS", "MODEL_AXIS", "batch_sharding", "init_distributed",
           "is_primary", "local_batch_slice", "make_mesh", "param_sharding",
           "replicated", "shard_batch", "shard_params"]
