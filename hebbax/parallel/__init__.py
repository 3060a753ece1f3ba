"""hebbax parallel layer — mesh + sharding helpers (SPMD data parallel)."""

from .mesh import (batch_sharding, make_mesh, pad_batch_to, replicate_state,
                   replicated, shard_batch, spatial_sharding)

__all__ = ["batch_sharding", "make_mesh", "pad_batch_to",
           "replicate_state", "replicated", "shard_batch",
           "spatial_sharding"]
