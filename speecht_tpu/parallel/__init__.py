"""Parallelism: device mesh, sharding specs, activation constraints."""

from speecht_tpu.parallel.mesh import (
    MeshContext,
    constrain,
    get_mesh,
    make_mesh,
    shard_batch,
    use_mesh,
)

__all__ = [
    "MeshContext",
    "constrain",
    "get_mesh",
    "make_mesh",
    "shard_batch",
    "use_mesh",
]
