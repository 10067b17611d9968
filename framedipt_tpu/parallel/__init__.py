"""Device-mesh parallelism: mesh construction and sharding rules."""

from framedipt_tpu.parallel import sp
from framedipt_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
from framedipt_tpu.parallel.sp import make_sp_mesh

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "make_sp_mesh",
    "sp",
]
