"""Batch loading with threaded prefetch and device staging.

Replaces the reference's torch DataLoader worker processes + pin_memory
(train_supervised.py:40-47) with:

  * worker **threads** building whole batches ahead of the consumer — the
    per-sample work is numpy slicing out of the memmapped scene cache,
    which releases the GIL;
  * deterministic randomness independent of thread scheduling: epoch
    shuffling and each batch's augmentation draws come from
    ``np.random.SeedSequence(seed, epoch, batch)`` spawns;
  * :func:`prefetch_to_device` — async ``jax.device_put`` (optionally with
    a NamedSharding so batches land already sharded over the mesh),
    keeping H2D copies overlapped with compute (the pin_memory analog).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Iterable, Iterator

import numpy as np

_STACK_KEYS = ("x_t1", "x_t2", "y_change", "y_sem_t1", "y_sem_t2", "stack")


def collate(items: list[dict]) -> dict:
    """Stack a list of sample dicts into one batch dict. Array-valued keys
    are stacked on a new leading axis; ``is_labeled`` becomes a float32
    mask vector; scalar metadata becomes lists/arrays."""
    batch: dict = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        if key in _STACK_KEYS:
            batch[key] = np.stack(vals).astype(np.float32)
        elif key == "is_labeled":
            batch[key] = np.asarray(vals, np.float32)
        elif isinstance(vals[0], (int, float, np.integer, np.floating)):
            batch[key] = np.asarray(vals)
        else:
            batch[key] = vals
    return batch


class TrainLoader:
    """Epoch iterator over a dataset, yielding collated numpy batches.

    Matches the reference DataLoader contract: ``shuffle`` per epoch,
    ``drop_last=True`` semantics (train_supervised.py:44), ``len()`` =
    batches per epoch. ``num_workers=0`` runs synchronously (the DEBUG
    path, train_supervised.py:42).
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, num_workers: int = 2,
                 prefetch: int = 4, seed: int = 0):
        import os

        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        # More threads than cores only adds GIL thrash (this image's TPU VM
        # exposes a single core); one producer thread still overlaps host
        # work with device execution.
        self.num_workers = min(max(0, int(num_workers)), os.cpu_count() or 1)
        self.prefetch = max(1, prefetch)
        self.seed = seed
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _batch_indices(self, epoch: int) -> list[np.ndarray]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.default_rng(
                np.random.SeedSequence([self.seed, epoch])).shuffle(order)
        limit = (n // self.batch_size) * self.batch_size if self.drop_last else n
        return [order[i:i + self.batch_size]
                for i in range(0, limit, self.batch_size)]

    def _build_batch(self, epoch: int, batch_idx: int, indices: np.ndarray) -> dict:
        ss = np.random.SeedSequence([self.seed, epoch, batch_idx])
        rngs = [np.random.default_rng(c) for c in ss.spawn(len(indices))]
        return collate([self.dataset.get(int(i), rng)
                        for i, rng in zip(indices, rngs)])

    def __iter__(self) -> Iterator[dict]:
        epoch = self._epoch
        self._epoch += 1
        batches = self._batch_indices(epoch)
        if self.num_workers == 0:
            for b, idxs in enumerate(batches):
                yield self._build_batch(epoch, b, idxs)
            return

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            window = self.num_workers + self.prefetch
            futures = []
            submitted = 0
            for _ in range(min(window, len(batches))):
                futures.append(pool.submit(self._build_batch, epoch,
                                           submitted, batches[submitted]))
                submitted += 1
            for done in range(len(batches)):
                batch = futures[done].result()
                if submitted < len(batches):
                    futures.append(pool.submit(self._build_batch, epoch,
                                               submitted, batches[submitted]))
                    submitted += 1
                yield batch


def prefetch_to_device(iterator: Iterable[dict], size: int = 2,
                       sharding=None, keys: tuple = _STACK_KEYS + ("is_labeled",)):
    """Stage upcoming batches onto device(s) ahead of consumption.

    Array values under ``keys`` are ``jax.device_put`` (with ``sharding``
    when given — batches then arrive already laid out over the mesh);
    everything else passes through untouched.
    """
    import jax

    def put(batch: dict) -> dict:
        out = {}
        for k, v in batch.items():
            if k in keys and isinstance(v, np.ndarray):
                out[k] = jax.device_put(v, sharding) if sharding is not None \
                    else jax.device_put(v)
            else:
                out[k] = v
        return out

    buf: list = []
    it = iter(iterator)
    try:
        for _ in range(size):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        nxt = buf.pop(0)
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield nxt
