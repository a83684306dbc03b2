"""Device mesh + sharding utilities (the DataParallel/NCCL replacement)."""

from .mesh import (  # noqa: F401
    batch_sharding,
    data_mesh,
    replicated_sharding,
    shard_batch_size,
)
