"""Data-parallel substrate: one mesh, sharded batches, replicated params."""
from .distributed import initialize, is_primary
from .mesh import (DATA_AXIS, batch_sharded, make_mesh, make_mesh_for_batch,
                   pad_to_multiple, replicate, replicated, shard_batch,
                   shard_local_batch)

__all__ = ["DATA_AXIS", "batch_sharded", "initialize", "is_primary",
           "make_mesh", "make_mesh_for_batch", "pad_to_multiple",
           "replicate", "replicated", "shard_batch", "shard_local_batch"]
