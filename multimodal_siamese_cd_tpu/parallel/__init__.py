"""Device mesh + sharding utilities (the DataParallel/NCCL replacement)."""

from .distributed import maybe_initialize_distributed, process_shard  # noqa: F401
from .mesh import (  # noqa: F401
    batch_sharding,
    data_axis_size,
    data_mesh,
    data_space_mesh,
    replicated_sharding,
    space_axis_size,
    wire_sharding,
)
