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
        explicit = [os.environ.get(k) for k in
                    ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                     "JAX_PROCESS_ID")]
        if any(explicit):
            # all-or-nothing: defaulting the missing ones to 1/0 would
            # silently force auto-detection OFF and make every host claim
            # a 1-process world — N independent trainings, no error
            if not all(explicit):
                raise ValueError(
                    "MSCD_DISTRIBUTED=1 with a partial coordinator spec: "
                    "set ALL of JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES "
                    "/ JAX_PROCESS_ID, or none of them for TPU-pod "
                    "auto-detection")
            kwargs = dict(coordinator_address=explicit[0],
                          num_processes=int(explicit[1]),
                          process_id=int(explicit[2]))
        jax.distributed.initialize(**kwargs)
        _initialized = True
    return jax.process_count() > 1


def process_shard(n_items: int) -> slice:
    """This host's contiguous shard of a length-``n_items`` work list.

    Extension point for multi-host drivers with embarrassingly-parallel
    host-side work (sweeps, per-scene export). The trainer itself does NOT
    shard by process: every process stages the full global batch and
    ``device_put`` transfers only its addressable mesh shards, and the eval
    paths must aggregate counts across the whole dataset, so neither can
    consume a bare slice. Balanced np.array_split semantics: shard sizes
    differ by at most one
    and every process gets work whenever ``n_items >= process_count`` (a
    ceil split could hand trailing processes EMPTY shards — e.g. 4 items
    over 3 processes as 2,2,0 — and an idle process deadlocks any
    collective the others enter)."""
    n, p, i = n_items, jax.process_count(), jax.process_index()
    base, extra = divmod(n, p)
    start = i * base + min(i, extra)
    return slice(start, start + base + (1 if i < extra else 0))
