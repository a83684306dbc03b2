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
SPACE_AXIS = "space"


def data_mesh(devices=None) -> Mesh:
    """1-D mesh over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(devices, (DATA_AXIS,))


def data_space_mesh(n_space: int, devices=None) -> Mesh:
    """2-D ``(data, space)`` mesh: batch parallelism over ``data`` crossed
    with spatial (height) sharding over ``space`` — the training-side analog
    of :func:`evaluation.sharded_scene_probabilities` (SURVEY §5
    long-context row). GSPMD inserts the conv halo exchanges and the
    cross-``space`` BatchNorm reductions; numerics match the 1-D data mesh
    to reduction-order tolerance (tests/test_train_lib.py). Use when a
    single crop/scene exceeds one chip's memory (TRAINER.SPATIAL_SHARDS)."""
    import numpy as np
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) % n_space:
        raise ValueError(
            f"{len(devices)} devices not divisible by SPATIAL_SHARDS={n_space}")
    grid = np.asarray(devices).reshape(len(devices) // n_space, n_space)
    return Mesh(grid, (DATA_AXIS, SPACE_AXIS))


def data_axis_size(mesh: Mesh) -> int:
    """Devices along the batch axis (== mesh.size for the 1-D data mesh)."""
    return mesh.shape[DATA_AXIS] if DATA_AXIS in mesh.axis_names else mesh.size


def space_axis_size(mesh: Mesh) -> int:
    return mesh.shape.get(SPACE_AXIS, 1) if SPACE_AXIS in mesh.axis_names else 1


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding; rank-agnostic (trailing axes
    replicated — spatial sharding of wire stacks is :func:`wire_sharding`)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def wire_sharding(mesh: Mesh, scanned: bool = False) -> NamedSharding:
    """Sharding for the planar wire stack ``(B, C, H, W)`` (scanned:
    ``(K, B, C, H, W)``): batch over ``data`` and, on a 2-D mesh, the
    height axis over ``space``."""
    sp = SPACE_AXIS if SPACE_AXIS in mesh.axis_names else None
    spec = (None, DATA_AXIS, None, sp) if scanned else (DATA_AXIS, None, sp)
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
