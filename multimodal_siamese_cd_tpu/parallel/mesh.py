"""Data-parallel device mesh.

The reference's entire parallelism story is ``nn.DataParallel``
(utils/networks.py:27): per-forward module replication, batch scatter on
dim 0, gradient reduction on device 0, single process. The TPU-native
equivalent is a 1-D ``jax.sharding.Mesh`` over all local devices with the
batch sharded on its leading axis and parameters replicated; XLA GSPMD
inserts the gradient ``psum`` over ICI automatically when the jitted train
step's output shardings demand replicated parameters.

Differences from DataParallel, by design:
  * gradients are all-reduced (every replica updates identically) instead
    of being gathered to device 0 — no parameter re-broadcast per step;
  * batch-norm statistics computed inside the jitted step are **global**
    over the batch (sync-BN) rather than per-replica — strictly more
    consistent than DataParallel's per-replica stats;
  * multi-host extension: ``jax.distributed.initialize`` + the same mesh
    over ``jax.devices()`` spans DCN without code changes here.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def data_mesh(devices=None) -> Mesh:
    """1-D mesh over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(devices, (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_size(global_batch: int, mesh: Mesh) -> int:
    """Validate the global batch divides the mesh; returns per-device size."""
    n = mesh.size
    if global_batch % n != 0:
        raise ValueError(
            f"TRAINER.BATCH_SIZE={global_batch} must be divisible by the "
            f"{n}-device '{DATA_AXIS}' mesh")
    return global_batch // n
