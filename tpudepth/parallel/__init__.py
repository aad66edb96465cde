"""Parallelism utilities (mesh, shardings, spatial partitioning).

The reference has no distributed backend at all (SURVEY.md §2c); this package
is the framework's new first-class parallel layer. Data parallelism shards the
batch over the mesh 'data' axis; 'model' is reserved for spatial sharding of
large-resolution inference (window attention is 7x7-local, so H x W shards
with only conv-halo communication, which XLA inserts automatically).
"""

from tpudepth.core.mesh import (
    batch_sharding,
    create_mesh,
    replicated,
    shard_batch,
    spatial_sharding,
)

__all__ = [
    "batch_sharding",
    "create_mesh",
    "replicated",
    "shard_batch",
    "spatial_sharding",
]
