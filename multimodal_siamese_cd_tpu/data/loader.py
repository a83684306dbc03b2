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


def collate(items: list[dict], skip: tuple = ()) -> dict:
    """Stack a list of sample dicts into one batch dict. Array-valued keys
    are stacked on a new leading axis; ``is_labeled`` becomes a float32
    mask vector; scalar metadata becomes lists/arrays. Keys in ``skip`` are
    omitted (used when the batch array was assembled in place)."""
    batch: dict = {}
    for key in items[0]:
        if key in skip:
            continue
        vals = [it[key] for it in items]
        if key in _STACK_KEYS:
            # keep f16/f32 as produced (f16 is the training wire format —
            # half the host->device bytes; steps upcast on device)
            arr = np.stack(vals)
            batch[key] = arr if arr.dtype in (np.float32, np.float16) \
                else arr.astype(np.float32)
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
                 prefetch: int = 4, seed: int = 0,
                 worker_type: str = "thread"):
        import os

        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        # More threads than cores only adds GIL thrash (this image's TPU VM
        # exposes a single core); one producer thread still overlaps host
        # work with device execution. Process workers sidestep the GIL on
        # multi-core hosts at the cost of pickling batches back.
        self.num_workers = min(max(0, int(num_workers)), os.cpu_count() or 1)
        self.prefetch = max(1, prefetch)
        self.seed = seed
        self.worker_type = worker_type
        if worker_type not in ("thread", "process"):
            raise ValueError(f"worker_type must be thread|process, got {worker_type!r}")
        self._epoch = 0
        self._proc_pool = None

    def set_epoch(self, epoch: int) -> None:
        """Advance the epoch counter that seeds each epoch's shuffle order
        and crop randomness (SeedSequence([seed, epoch])). A resumed run
        calls this with the number of epochs already trained so the data
        schedule continues where the unbroken run would be, instead of
        replaying epoch 0's batches."""
        self._epoch = int(epoch)

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
        return _assemble_batch(self.dataset, self.seed, epoch, batch_idx, indices)

    def _pool(self):
        if self.worker_type == "thread":
            return ThreadPoolExecutor(max_workers=self.num_workers), \
                lambda e, b, idx: (self._build_batch, e, b, idx)
        # Process pool: create once, init each worker with the dataset a
        # single time instead of pickling it per task. NEVER fork: by pool
        # time the JAX backend's RPC/runtime threads are live (sitecustomize
        # imports jax at interpreter startup on this rig) and fork() from a
        # multithreaded process can copy held mutexes — a worker then wedges
        # inside an inherited lock with no error. forkserver children fork
        # from a FRESH server interpreter instead (spawn fallback); the
        # dataset pickles fine (SceneCache.__getstate__ drops open mmaps).
        if self._proc_pool is None:
            import multiprocessing as mp
            from concurrent.futures import ProcessPoolExecutor

            ctx = mp.get_context(
                "forkserver" if "forkserver" in mp.get_all_start_methods()
                else "spawn")
            self._proc_pool = ProcessPoolExecutor(
                max_workers=self.num_workers, mp_context=ctx,
                initializer=_init_proc_worker,
                initargs=(self.dataset, self.seed))
        return self._proc_pool, lambda e, b, idx: (_build_batch_in_worker, e, b, idx)

    def __iter__(self) -> Iterator[dict]:
        epoch = self._epoch
        self._epoch += 1
        batches = self._batch_indices(epoch)
        if self.num_workers == 0:
            for b, idxs in enumerate(batches):
                yield self._build_batch(epoch, b, idxs)
            return

        pool, make_task = self._pool()
        futures = []
        try:
            window = self.num_workers + self.prefetch
            submitted = 0
            for _ in range(min(window, len(batches))):
                futures.append(pool.submit(*make_task(epoch, submitted,
                                                      batches[submitted])))
                submitted += 1
            for done in range(len(batches)):
                batch = futures[done].result()
                # Drop the completed future NOW: a Future retains its result,
                # so keeping the list intact pins every batch of the epoch
                # (~31 MB each at batch 8) in memory — measured 4-6x loader
                # slowdown from allocator/page churn within ~5 batches.
                futures[done] = None
                if submitted < len(batches):
                    futures.append(pool.submit(*make_task(epoch, submitted,
                                                          batches[submitted])))
                    submitted += 1
                yield batch
        finally:
            # An abandoned epoch (exception, early stop) must not leave
            # queued ~31 MB batch builds competing for the 1-core host
            # during teardown/eval. Thread pools are per-epoch: shut down.
            # The process pool is persistent: cancel what's still queued
            # but keep the workers alive for the next epoch.
            if self.worker_type == "thread":
                pool.shutdown(wait=False, cancel_futures=True)
            else:
                for f in futures:
                    if f is not None:
                        f.cancel()

    def close(self) -> None:
        if self._proc_pool is not None:
            self._proc_pool.shutdown(wait=False, cancel_futures=True)
            self._proc_pool = None


def group_batches(iterator: Iterable[dict], k: int) -> Iterator[dict]:
    """Stack consecutive batches into (k, B, ...) super-batches for scanned
    multi-step execution (train_lib.make_scanned_train_step). Array keys gain
    a leading axis; metadata keys become lists. A trailing partial group is
    dropped (callers validate divisibility up front)."""
    buf: list[dict] = []
    for batch in iterator:
        buf.append(batch)
        if len(buf) < k:
            continue
        out: dict = {}
        for key in buf[0]:
            vals = [b[key] for b in buf]
            if isinstance(vals[0], np.ndarray):
                out[key] = np.stack(vals)
            else:
                out[key] = vals
        buf = []
        yield out


def _assemble_batch(dataset, seed: int, epoch: int, batch_idx: int,
                    indices) -> dict:
    """Build one collated batch (deterministic per (seed, epoch, batch)).

    When the dataset advertises a fixed stack layout (``stack_spec()``),
    samples are assembled straight into one preallocated ``(B, C, S, S)``
    buffer via ``get(..., out=row)`` — no per-sample stack allocation and no
    ``np.stack`` copy in collate (measured ~15% of the per-sample budget on
    the 1-core host)."""
    ss = np.random.SeedSequence([seed, epoch, batch_idx])
    rngs = [np.random.default_rng(c) for c in ss.spawn(len(indices))]
    spec = getattr(dataset, "stack_spec", None)
    spec = spec() if callable(spec) else None
    if spec is None:
        return collate([dataset.get(int(i), rng)
                        for i, rng in zip(indices, rngs)])
    shape, dtype = spec
    stack = np.empty((len(indices),) + tuple(shape), dtype)
    items = [dataset.get(int(i), rng, out=stack[k])
             for k, (i, rng) in enumerate(zip(indices, rngs))]
    batch = collate(items, skip=("stack",))
    batch["stack"] = stack
    return batch


# --- process-pool worker plumbing (module-level for picklability) -----------

_WORKER_STATE: dict = {}


def _init_proc_worker(dataset, seed) -> None:
    _WORKER_STATE["dataset"] = dataset
    _WORKER_STATE["seed"] = seed


def _build_batch_in_worker(epoch: int, batch_idx: int, indices) -> dict:
    return _assemble_batch(_WORKER_STATE["dataset"], _WORKER_STATE["seed"],
                           epoch, batch_idx, indices)


def prefetch_to_device(iterator: Iterable[dict], size: int = 2,
                       sharding=None, keys: tuple = _STACK_KEYS + ("is_labeled",)):
    """Stage upcoming batches onto device(s) ahead of consumption.

    A background thread pulls from ``iterator`` and ``jax.device_put``s array
    values under ``keys`` (with ``sharding`` when given — batches arrive
    already laid out over the mesh) into a bounded queue, so host->device
    transfer genuinely overlaps device execution even when device_put blocks
    (as it does on remote-attached TPUs, where the transfer link — not the
    chip — can be the bottleneck).

    ``sharding`` may be one sharding for every key, or a ``{key: sharding}``
    dict for rank-dependent layouts (a 2-D data×space mesh shards the wire
    stack's height axis but only the batch axis of ``is_labeled``).
    """
    import queue
    import threading

    import jax

    def put(batch: dict) -> dict:
        out = {}
        for k, v in batch.items():
            if k in keys and isinstance(v, np.ndarray):
                sh = sharding.get(k) if isinstance(sharding, dict) else sharding
                out[k] = jax.device_put(v, sh) if sh is not None \
                    else jax.device_put(v)
            else:
                out[k] = v
        return out

    q: queue.Queue = queue.Queue(maxsize=max(1, size))
    _END = object()
    error: list = []
    stop = threading.Event()

    def producer():
        try:
            for batch in iterator:
                staged = put(batch)
                while not stop.is_set():
                    try:
                        q.put(staged, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # surface in the consumer
            error.append(e)
        finally:
            # The end sentinel must not be dropped on a momentarily-full
            # queue — block for space unless the consumer has stopped.
            while not stop.is_set():
                try:
                    q.put(_END, timeout=0.1)
                    break
                except queue.Full:
                    continue

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                if error:
                    raise error[0]
                return
            yield item
    finally:
        # Consumer abandoned early (e.g. the DEBUG one-batch break):
        # stop the producer instead of letting it stage a whole epoch.
        stop.set()
