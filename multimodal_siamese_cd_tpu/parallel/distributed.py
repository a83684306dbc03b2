"""Multi-host (DCN) extension point.

The reference is single-process (SURVEY §2.12); this framework's data mesh
spans multiple hosts transparently once ``jax.distributed`` is initialized:
``jax.devices()`` then covers the whole slice, the same
``Mesh``/NamedSharding code paths apply, and gradient all-reduces ride
ICI within a host and DCN across hosts.

Initialization is env-gated so single-host runs (the common case, and the
only one testable here) are untouched: set ``MSCD_DISTRIBUTED=1`` plus the
standard JAX coordinator variables (``JAX_COORDINATOR_ADDRESS``,
``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``) or rely on TPU-pod
auto-detection.
"""

from __future__ import annotations

import os

import jax

_initialized = False


def maybe_initialize_distributed() -> bool:
    """Initialize jax.distributed when requested via env. Returns True when
    running multi-process after the call."""
    global _initialized
    if _initialized:
        return jax.process_count() > 1
    if os.environ.get("MSCD_DISTRIBUTED") == "1":
        kwargs = {}
        if os.environ.get("JAX_COORDINATOR_ADDRESS"):
            kwargs = dict(
                coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
                num_processes=int(os.environ.get("JAX_NUM_PROCESSES", "1")),
                process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
            )
        jax.distributed.initialize(**kwargs)
        _initialized = True
    return jax.process_count() > 1


def process_shard(n_items: int) -> slice:
    """This host's contiguous shard of a length-``n_items`` work list —
    the multi-host analog of sharding the data loader by process index."""
    per = -(-n_items // jax.process_count())
    start = jax.process_index() * per
    return slice(start, min(start + per, n_items))
