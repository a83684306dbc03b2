"""Checkpoint save/load.

Keeps the reference's on-disk contract — files named
``{OUTPUT}/networks/{NAME}_checkpoint{epoch}.pt`` holding step + model +
optimizer state (utils/networks.py:30-56) — with flax msgpack serialization
instead of torch pickles. ``load_checkpoint`` rebuilds the model and
TrainState exactly like the reference rebuilds net+AdamW before restoring.
"""

from __future__ import annotations

from pathlib import Path

import jax
from flax import serialization

from . import train_lib


def checkpoint_file(cfg, epoch) -> Path:
    return Path(cfg.PATHS.OUTPUT) / 'networks' / f'{cfg.NAME}_checkpoint{epoch}.pt'


def latest_checkpoint_epoch(cfg):
    """Highest epoch with a ``{NAME}_checkpoint{epoch}.pt`` on disk, or None.

    Discovery half of ``TRAINER.RESUME_CHECKPOINT: latest`` — restart the
    same command after a preemption and it finds its own newest checkpoint.
    Only integer epoch tags count (the trainers save integers); partial
    ``.tmp{pid}`` files from a crash mid-save never match the ``.pt``
    suffix, and other experiments' checkpoints in the same OUTPUT are
    excluded by the NAME prefix.
    """
    net_dir = Path(cfg.PATHS.OUTPUT) / 'networks'
    if not net_dir.is_dir():
        return None
    prefix, best = f'{cfg.NAME}_checkpoint', None
    for f in net_dir.iterdir():
        if not (f.name.startswith(prefix) and f.name.endswith('.pt')):
            continue
        try:
            epoch = int(f.name[len(prefix):-3])
        except ValueError:
            continue
        if best is None or epoch > best:
            best = epoch
    return best


def save_checkpoint(state: train_lib.TrainState, epoch, step: int, cfg) -> Path:
    """reference networks.py:30-38."""
    save_file = checkpoint_file(cfg, epoch)
    save_file.parent.mkdir(parents=True, exist_ok=True)
    payload = {
        'step': step,
        'params': jax.device_get(state.params),
        'batch_stats': jax.device_get(state.batch_stats),
        'opt_state': jax.device_get(state.opt_state),
    }
    # atomic: a crash mid-write must leave the canonical name either absent
    # or pointing at the previous complete checkpoint, never truncated
    import os

    tmp = save_file.with_name(save_file.name + f".tmp{os.getpid()}")
    tmp.write_bytes(serialization.to_bytes(payload))
    os.replace(tmp, save_file)
    return save_file


def load_checkpoint(epoch, cfg, net_file: Path | None = None):
    """Rebuild model + optimizer and restore (reference networks.py:41-56).

    Returns ``(model, state, step)``.
    """
    model, state = train_lib.create_train_state(cfg, jax.random.PRNGKey(cfg.SEED))
    target = {
        'step': 0,
        'params': state.params,
        'batch_stats': state.batch_stats,
        'opt_state': state.opt_state,
    }
    file = checkpoint_file(cfg, epoch) if net_file is None else Path(net_file)
    data = file.read_bytes()  # a MISSING file keeps its FileNotFoundError
    try:
        restored = serialization.from_bytes(target, data)
    except Exception as e:
        # name the FILE: msgpack's raw errors ("ExtraData", "incomplete
        # input") don't say which checkpoint is corrupt/truncated, or that
        # a checkpoint is involved at all
        raise ValueError(
            f"Corrupt or incompatible checkpoint {file}: "
            f"{type(e).__name__}: {e}") from e
    state = state.replace(
        step=restored['step'],
        params=restored['params'],
        batch_stats=restored['batch_stats'],
        opt_state=restored['opt_state'],
    )
    return model, state, restored['step']
