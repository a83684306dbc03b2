"""In-training evaluation and offline inference loops.

``model_evaluation`` mirrors the reference protocol (utils/evaluation.py:
7-41): fresh first_last/no-aug/no-multiplier dataset, batch 1 over full
scenes, sigmoid probabilities, threshold set linspace(0.5, 1, 1) == {0.5},
max-F1 over thresholds, '{run_type} F1/precision/recall' metric names.

XLA needs static shapes, so variable-size scenes are padded up to bucketed
dimensions (multiples of 64 by default) and the padded area is excluded
from the confusion counts via a validity mask; compilation cost is bounded
by the number of distinct buckets, not scenes. Caveat: zero-padding is seen
by the network as image content, so predictions for VALID pixels within the
receptive field of a padded edge differ slightly from an unpadded forward —
scenes whose sides are already bucket multiples are bit-exact. The effect
was MEASURED at the SpaceNet7 shape class (tools/eval_exactness.py:
~1000^2 scenes with non-64-multiple sides, trained checkpoint, real chip):
max |dF1| = 4.7e-5 — two orders of magnitude inside the 0.5 pt quality
tolerance, so padded buckets remain the deliberate default everywhere,
including the offline assessment scripts. For reference-exact numbers on
arbitrary scene sizes set ``TRAINER.EVAL_PAD_MULTIPLE: 1`` (exact shapes;
one compile per distinct scene shape — the models handle any size natively
via floor-pooling and pad-to-skip upsampling).

``inference_loop`` is the rebuilt version of the reference's missing
``evaluation.inference_loop`` that assessment_change.py:59 calls — the
repo-wide stale symbol (SURVEY defect 3) — implemented with the same
semantics as the in-training pass minus logging.

Also fixes the reference's loop-variable shadowing of ``step``
(evaluation.py:19) — the logged 'step' here is the trainer's global step.
"""

from __future__ import annotations

import functools as _functools

import jax as _jax
import jax.numpy as jnp
import numpy as np

from . import wandb_compat
from .data.dataset import MultimodalCDDataset
from .metrics import (MultiThresholdMetric, confusion_at_thresholds,
                      strict_confusion_counts)
from .train_lib import eval_forward, wire_to_nhwc

EVAL_BUCKET = 64

# Scene-batched eval group policy: scenes per forward scale inversely with
# padded area inside a fixed memory envelope. The envelope is measured:
# 16 x 1024^2 scenes fits a v5-lite and beats group 8 (73.5 vs 71.4
# scenes/s); 32 x 1024^2 OOMs — which means the old FIXED group of 8 would
# also have OOMed on 2048^2-class scenes (same bytes), so scaling DOWN for
# large scenes is a correctness fix, not just tuning.
EVAL_GROUP_BUDGET_PX = 16 * 1024 * 1024
EVAL_GROUP_CAP = 16
# Host-side bound on one buffered wire group (the per-chip envelope above is
# DEVICE memory; a large data mesh multiplies the group and this VM's host
# RAM is the smaller resource — np.stack transiently doubles the group, so
# the cap compares 2x wire bytes against this budget).
HOST_WIRE_BUDGET_BYTES = 2 << 30


def eval_bucket(cfg) -> int:
    """The padding bucket a config asks for: ``TRAINER.EVAL_PAD_MULTIPLE``
    (1 = exact shapes) or the 64-pixel default. THE accessor every eval
    entry point (in-training and the offline assessment scripts) resolves
    the knob through, so the docstring's exactness-hatch promise holds on
    all of them."""
    return int(cfg.TRAINER.get('EVAL_PAD_MULTIPLE', EVAL_BUCKET))


def eval_group_limit(shape) -> int:
    """Max scenes per batched eval forward for a padded scene ``shape``."""
    return max(1, min(EVAL_GROUP_CAP,
                      EVAL_GROUP_BUDGET_PX // (shape[0] * shape[1])))


def pad_to_bucket(arr: np.ndarray, bucket: int = EVAL_BUCKET):
    """Pad (H, W, C) up to multiples of ``bucket``; returns (padded, valid)
    where valid is the (H_pad, W_pad) {0,1} mask of real pixels.
    ``bucket=1`` is the exact-shape (no padding) mode."""
    h, w = arr.shape[:2]
    hp = -(-h // bucket) * bucket
    wp = -(-w // bucket) * bucket
    padded = np.zeros((hp, wp) + arr.shape[2:], arr.dtype)
    padded[:h, :w] = arr
    valid = np.zeros((hp, wp), np.float32)
    valid[:h, :w] = 1.0
    return padded, valid


def scene_probabilities(model, state, item: dict,
                        bucket: int = EVAL_BUCKET) -> np.ndarray:
    """Eval-mode change probabilities for one full (unpadded) scene item."""
    x1, _ = pad_to_bucket(item["x_t1"], bucket)
    x2, _ = pad_to_bucket(item["x_t2"], bucket)
    probs = eval_forward(model, state.params, state.batch_stats,
                         x1[None], x2[None])
    h, w = item["x_t1"].shape[:2]
    return np.asarray(probs)[0, :h, :w, 0]


@_functools.partial(_jax.jit, static_argnames=("model",))
def _eval_wire_counts_jit(model, params, batch_stats, x1p, x2p, y, valid,
                          thresholds):
    """Fused eval forward + confusion for one padded scene group — ONE
    dispatch in, one tiny ``(B, 4, n_thresholds)`` count array out
    (tp/tn/fp/fn rows per scene).

    Wires are planar ``(B, C, Hp, Wp)`` in the cache storage dtype plus
    uint8 label/valid planes; the transpose to NHWC and the float32 upcast
    happen on device (free layout/convert ops XLA folds into the first
    convolution), so the graph sees exactly what :func:`eval_forward` sees
    on float32 items. Confusion is vmapped PER SCENE so group size never
    degrades count exactness; callers accumulate across scenes in float64
    on host (:meth:`MultiThresholdMetric.add_counts`). The per-scene sums
    themselves run in float32 on device, so exactness holds up to 2^24
    valid pixels per single scene (~4096x4096) — the same envelope as the
    item path's float32 ``add_sample`` reductions; SpaceNet7 scenes are
    ~1024^2.

    Replaces the per-scene eager-jnp confusion the measurer used to run
    (≈10 dispatches + 8 MB of label/mask upload per scene, serialized with
    the forwards) — the e2e win is measured in tools/bench_assessment.py.
    """
    x1 = wire_to_nhwc(x1p).astype(jnp.float32)
    x2 = wire_to_nhwc(x2p).astype(jnp.float32)
    probs = eval_forward(model, params, batch_stats, x1, x2)

    def scene_counts(p, yt, v):
        return jnp.stack(confusion_at_thresholds(yt, p, thresholds, v))

    # one (B, 4, n_thresholds) array, not a 4-tuple: the host fetch is ONE
    # device-to-host transfer per group instead of four ~25 ms RTTs on the
    # tunneled TPU (same reasoning as metrics.add_sample's stacked fetch)
    return _jax.vmap(scene_counts)(probs[..., 0], y, valid)


@_functools.lru_cache(maxsize=8)
def _replicated_jit(fn, mesh):
    """Re-jit a wire-counts function with REPLICATED outputs for a mesh.
    The per-scene counts inherit the group's data-axis sharding, which on a
    multi-PROCESS mesh spans non-addressable devices — ``np.asarray`` on
    the host would raise. Replicated out_shardings make GSPMD all-gather
    the tiny (B, n_thresholds) counts at program end so every process holds
    them fully. lru_cache: one jit object (and hence one XLA cache) per
    (fn, mesh), not per eval pass."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    return _jax.jit(fn, static_argnames=("model",),
                    out_shardings=NamedSharding(mesh, P()))


def _shard_group(arrs: tuple, mesh) -> tuple:
    """Pad a stacked scene group to a multiple of the mesh's data axis with
    all-zero scenes (``valid`` is zero there, so their confusion counts are
    exactly zero — eval has no cross-sample coupling, BN runs on stored
    stats) and commit the batch axis sharded over the data mesh. GSPMD then
    splits every forward across devices; counts come back per-scene. On a
    2-D (data, space) mesh the padded scene HEIGHT is additionally sharded
    over ``space`` (bucket padding is a 64-multiple, so meshes up to 64-way
    spatial divide evenly)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .parallel.mesh import (DATA_AXIS, SPACE_AXIS, data_axis_size,
                                space_axis_size, wire_sharding)
    pad = -arrs[0].shape[0] % data_axis_size(mesh)
    if pad:
        arrs = tuple(np.concatenate(
            [a, np.zeros((pad, *a.shape[1:]), a.dtype)]) for a in arrs)
    n_space = space_axis_size(mesh)
    spatial = n_space > 1 and arrs[0].shape[2] % n_space == 0
    plane_sh = NamedSharding(
        mesh, P(DATA_AXIS, SPACE_AXIS if spatial else None))
    return tuple(_jax.device_put(
        a, wire_sharding(mesh) if (a.ndim == 4 and spatial) else plane_sh)
        for a in arrs)


def _stream_wire_groups(ds, bucket: int, keys: tuple, run_group, accumulate,
                        mesh=None, wire_kwargs: dict | None = None,
                        group_scale: int = 1) -> None:
    """The ONE streaming-group engine behind both fused eval paths
    (:func:`_measure_wired`, :func:`dualtask_quantitative_counts`): group
    ``ds.eval_wire`` wires by padded shape, dispatch a filled group the
    moment it fills, keep ONE group in flight — while the device runs
    group N the host assembles group N+1 (the count fetch is a tiny RTT) —
    then flush the tails. Accumulation order is identical to a sequential
    loop (groups are consumed in dispatch order). With a multi-device
    ``mesh``, each group's batch axis is sharded over the data mesh
    (:func:`_shard_group`), so full-scene eval scales with devices.

    ``run_group(arrs)`` dispatches one stacked group and returns the device
    result; ``accumulate(result)`` fetches + folds it on host (float64).
    ``group_scale`` divides :func:`eval_group_limit`'s memory envelope for
    dispatches that hold more live bytes per scene than the plain
    change-head forward the envelope was measured on. The envelope is
    PER-CHIP, so with a mesh the group target scales by the data-axis size:
    each chip still holds at most the measured envelope, full groups need
    no zero-scene padding, and utilization stays flat as devices grow —
    up to a HOST byte budget: the group buffers on the host before
    dispatch (np.stack transiently doubles it), and this VM has one small
    CPU, so on large meshes the target is capped to keep pending+stacked
    wires under ``HOST_WIRE_BUDGET_BYTES`` (short groups just mean
    zero-valid padding on some chips; counts stay exact)."""
    from .parallel.mesh import data_axis_size

    n_data = 1 if mesh is None else data_axis_size(mesh)
    pending: dict = {}
    inflight: list = []

    def consume() -> None:
        accumulate(inflight.pop(0))

    def dispatch(group: list) -> None:
        arrs = tuple(np.stack([g[k] for g in group]) for k in keys)
        if mesh is not None and mesh.size > 1:
            arrs = _shard_group(arrs, mesh)
        if inflight:  # bound device residency to one group + one staged
            consume()
        inflight.append(run_group(arrs))

    for i in range(len(ds)):
        wire = ds.eval_wire(i, bucket, **(wire_kwargs or {}))
        shape = wire['x1'].shape[1:]
        group = pending.setdefault(wire['x1'].shape, [])
        group.append(wire)
        wire_bytes = sum(v.nbytes for v in wire.values()
                         if isinstance(v, np.ndarray))
        host_cap = max(1, HOST_WIRE_BUDGET_BYTES // max(1, 2 * wire_bytes))
        target = min(max(1, eval_group_limit(shape) // group_scale) * n_data,
                     host_cap)
        if len(group) >= target:
            dispatch(group)  # consumes synchronously (np.stack copies)
            group.clear()
    for group in pending.values():
        if group:
            dispatch(group)
    while inflight:
        consume()


def _measure_wired(model, state, ds, measurer,
                   bucket: int, mesh=None) -> MultiThresholdMetric:
    """Streaming group evaluation over ``ds.eval_wire`` wires — the
    :func:`_stream_wire_groups` engine with the fused forward+confusion
    dispatch (:func:`_eval_wire_counts_jit`) and float64 host
    accumulation."""
    thr = np.asarray(measurer.thresholds)
    counts_fn = _eval_wire_counts_jit if mesh is None or mesh.size <= 1 \
        else _replicated_jit(_eval_wire_counts_jit.__wrapped__, mesh)
    _stream_wire_groups(
        ds, bucket, ('x1', 'x2', 'y', 'valid'),
        run_group=lambda arrs: counts_fn(
            model, state.params, state.batch_stats, *arrs, thr),
        accumulate=lambda counts: measurer.add_counts(
            *np.asarray(counts, np.float64).sum(axis=0)),
        mesh=mesh)
    return measurer


def run_measurer(model, state, ds, thresholds,
                 batch_scenes: bool = True,
                 bucket: int = EVAL_BUCKET, mesh=None) -> MultiThresholdMetric:
    """Full-scene confusion accumulation over a dataset.

    Scenes are padded to bucketed shapes; scenes sharing a bucket are
    stacked and evaluated in ONE forward (same per-scene metrics as the
    reference's batch-1 loop, far fewer dispatches — each dispatch costs a
    tunnel round trip here). When ``ds`` is a cache-backed
    :class:`MultimodalCDDataset`, the fused wire path runs instead
    (:func:`_measure_wired`): planar storage-dtype wires, on-device
    confusion, one group in flight. ``batch_scenes=False`` restores
    per-scene dispatch; item lists and cache-disabled datasets use the
    item path below."""
    measurer = MultiThresholdMetric(thresholds)
    if batch_scenes and getattr(ds, 'supports_eval_wire', None) is not None \
            and ds.supports_eval_wire():
        return _measure_wired(model, state, ds, measurer, bucket, mesh)

    def flush(chunk: list) -> None:
        x1 = np.stack([s[0] for s in chunk])
        x2 = np.stack([s[1] for s in chunk])
        probs = eval_forward(model, state.params, state.batch_stats, x1, x2)
        for i, (_, _, y, valid) in enumerate(chunk):
            measurer.add_sample(y[None, ..., 0], probs[i:i + 1, ..., 0],
                                valid_mask=valid[None])

    # Streaming: each shape bucket is evaluated the moment it fills, so host
    # RSS is bounded by (buckets in flight) * group_limit padded scenes — not
    # the whole split (~2 GB for the 39-AOI 1024^2 training split if it were
    # all materialized first).
    pending: dict = {}
    for item in ds:
        x1, valid = pad_to_bucket(item["x_t1"], bucket)
        x2, _ = pad_to_bucket(item["x_t2"], bucket)
        y, _ = pad_to_bucket(item["y_change"], bucket)
        if not batch_scenes:
            probs = eval_forward(model, state.params, state.batch_stats,
                                 x1[None], x2[None])
            measurer.add_sample(y[None, ..., 0], probs[..., 0],
                                valid_mask=valid[None])
            continue
        group = pending.setdefault(x1.shape, [])
        group.append((x1, x2, y, valid))
        if len(group) >= eval_group_limit(x1.shape):
            flush(group)
            group.clear()
    for group in pending.values():
        if group:
            flush(group)
    return measurer


def _summarize(measurer: MultiThresholdMetric):
    f1s = np.asarray(measurer.compute_f1())
    precisions = np.asarray(measurer.precision)
    recalls = np.asarray(measurer.recall)
    best = int(f1s.argmax())
    return float(f1s[best]), float(precisions[best]), float(recalls[best])


def model_evaluation(model, state, cfg, run_type: str, epoch: float,
                     step: int, mesh=None) -> float:
    """In-training eval + logging (reference evaluation.py:7-41).
    Returns the best F1. ``mesh``: the trainer's data mesh — multi-device
    meshes shard eval scene groups over devices (see _measure_wired)."""
    thresholds = np.linspace(0.5, 1, 1)
    ds = MultimodalCDDataset(cfg, run_type, no_augmentations=True,
                             dataset_mode='first_last', disable_multiplier=True,
                             disable_unlabeled=True)
    measurer = run_measurer(model, state, ds, thresholds,
                            bucket=eval_bucket(cfg), mesh=mesh)
    f1, precision, recall = _summarize(measurer)
    wandb_compat.log({
        f'{run_type} F1': f1,
        f'{run_type} precision': precision,
        f'{run_type} recall': recall,
        'step': step, 'epoch': epoch,
    })
    return f1


def inference_loop(model, state, ds, thresholds=None,
                   bucket: int = EVAL_BUCKET) -> dict:
    """Offline quantitative inference (the contract assessment_change.py:59-61
    expects): returns ``{'change': (f1, precision, recall)}`` over the
    dataset at threshold 0.5."""
    thresholds = np.asarray([0.5]) if thresholds is None else np.asarray(thresholds)
    measurer = run_measurer(model, state, ds, thresholds, bucket=bucket)
    return {'change': _summarize(measurer)}


def sharded_scene_probabilities(model, state, item: dict, mesh,
                                bucket: int = EVAL_BUCKET) -> np.ndarray:
    """Full-scene inference with the scene's HEIGHT axis sharded over the
    data mesh — the extension point for scenes that exceed a single chip's
    memory (SURVEY §5 long-context row). GSPMD inserts the conv halo
    exchanges at shard boundaries automatically; results are bitwise the
    single-device ones (tested on the virtual 8-device mesh).

    The padded height must divide the mesh; pad_to_bucket's 64-multiple
    already covers meshes up to 64 devices for 64-divisible buckets.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    x1, _ = pad_to_bucket(item["x_t1"], bucket)
    x2, _ = pad_to_bucket(item["x_t2"], bucket)
    if x1.shape[0] % mesh.size:
        # non-power-of-two meshes only (1/2/4/.../64 always divide the
        # 64-multiple height): pad the HEIGHT to lcm(bucket, mesh) — width
        # needs no mesh divisibility, and lcm keeps the zero border at its
        # minimum (bucket * mesh.size would pad both axes and deepen the
        # padded-edge prediction delta beyond the measured envelope). With
        # TRAINER.EVAL_PAD_MULTIPLE: 1 this degenerates to the minimum
        # mesh-divisible height and the exactness hatch holds here too.
        import math

        hp = -(-x1.shape[0] // math.lcm(bucket, mesh.size)) \
            * math.lcm(bucket, mesh.size)

        def pad_h(a):
            out = np.zeros((hp,) + a.shape[1:], a.dtype)
            out[:a.shape[0]] = a
            return out

        x1, x2 = pad_h(x1), pad_h(x2)
    # height over EVERY mesh axis — on a 2-D (data, space) mesh all devices
    # still split the one scene, consistent with the mesh.size padding above
    row_sharding = NamedSharding(mesh, P(None, tuple(mesh.axis_names)))
    x1 = jax.device_put(x1[None], row_sharding)
    x2 = jax.device_put(x2[None], row_sharding)
    probs = eval_forward(model, state.params, state.batch_stats, x1, x2)
    h, w = item["x_t1"].shape[:2]
    return np.asarray(probs)[0, :h, :w, 0]


@_functools.partial(_jax.jit, static_argnames=("model",))
def _dualtask_forward(model, variables, a, b):
    """Jit-cached (per model + shape bucket) dual-task forward with all
    sigmoid heads — module-level so per-scene calls reuse compilations."""
    logits_change, logits_sem_t1, logits_sem_t2 = model.apply(
        variables, a, b, train=False)
    logits_change_sem = model.apply(
        variables, logits_sem_t1, logits_sem_t2, method=model.sem_change_head)
    sig = _jax.nn.sigmoid
    return (sig(logits_change), sig(logits_sem_t1), sig(logits_sem_t2),
            sig(logits_change_sem))


def dualtask_scene_outputs(model, state, item: dict,
                           bucket: int = EVAL_BUCKET) -> dict:
    """All sigmoid heads of a dual-task model for one scene, plus the
    auxiliary change-from-semantics head (assessment_semantics.py:115-126)."""
    x1, _ = pad_to_bucket(item["x_t1"], bucket)
    x2, _ = pad_to_bucket(item["x_t2"], bucket)
    h, w = item["x_t1"].shape[:2]

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    change, sem_t1, sem_t2, change_sem = _dualtask_forward(
        model, variables, x1[None], x2[None])
    clip = lambda a: np.asarray(a)[0, :h, :w, 0]
    return {"change": clip(change), "sem_t1": clip(sem_t1),
            "sem_t2": clip(sem_t2), "change_sem": clip(change_sem)}


@_functools.partial(_jax.jit, static_argnames=("model",))
def _dualtask_wire_counts_jit(model, params, batch_stats, x1p, x2p,
                              ych, ysem1, ysem2, valid):
    """Fused dual-task forward + strict-threshold confusion over one padded
    scene group — the offline-assessment analog of :func:`_eval_wire_counts_
    jit`. Ships back only per-scene ``(4, 3)`` count rows (tp, fp, fn per
    block, rows in :data:`_DUALTASK_BLOCKS` order) for the reference's
    assessment blocks (change / change-from-semantics / semantics,
    assessment_semantics.py:99-152), instead of four full-scene probability
    rasters (~16 MB/1024² scene). Semantics counts are shipped per
    TIMESTAMP (sem_t1 / sem_t2) and pooled on host in float64 — summing
    them in float32 on device could round once a scene's dense-building
    pixels exceed 2^23, halving the documented 2^24 per-scene envelope."""
    x1 = wire_to_nhwc(x1p).astype(jnp.float32)
    x2 = wire_to_nhwc(x2p).astype(jnp.float32)
    variables = {"params": params, "batch_stats": batch_stats}
    change, sem1, sem2, change_sem = (
        p[..., 0] for p in _dualtask_forward.__wrapped__(
            model, variables, x1, x2))

    def scene(c, cs, s1, s2, y, y1, y2, v):
        # (4, 3) — rows in _DUALTASK_BLOCKS order; one array, not a dict
        # of tuples, so the host fetch is ONE transfer per group instead
        # of 12 ~25 ms RTTs on the tunneled TPU
        return jnp.stack([
            jnp.stack(strict_confusion_counts(y, c, v)),
            jnp.stack(strict_confusion_counts(y, cs, v)),
            jnp.stack(strict_confusion_counts(y1, s1, v)),
            jnp.stack(strict_confusion_counts(y2, s2, v)),
        ])

    return _jax.vmap(scene)(change, change_sem, sem1, sem2,
                            ych, ysem1, ysem2, valid)


# row order of _dualtask_wire_counts_jit's (B, 4, 3) result
_DUALTASK_BLOCKS = ("change", "change_sem", "sem_t1", "sem_t2")


def dualtask_quantitative_counts(model, state, ds, bucket: int = EVAL_BUCKET,
                                 mesh=None) -> dict | None:
    """Streaming pooled confusion counts for the dual-task offline
    assessment — the fused fast path behind assessment_semantics.py's
    quantitative protocol. Groups scenes by padded shape (same policy as
    :func:`_measure_wired`), keeps one group in flight, and accumulates the
    per-scene device counts in float64 on host.

    Returns ``{'change'|'change_sem'|'sem': (tp, fp, fn)}`` float64 pooled
    over the split, or None when the wire fast path is unavailable
    (cache-disabled or augmentation-mode dataset) — callers fall back to
    the reference-shaped pooled-pixel protocol, which materializes every
    probability raster on host (memory grows with the split; this path is
    O(1))."""
    if getattr(ds, "supports_eval_wire", None) is None \
            or not ds.supports_eval_wire():
        return None
    totals = {k: np.zeros(3, np.float64)
              for k in ("change", "change_sem", "sem")}

    def accumulate(counts) -> None:
        # ONE fetch of the (B, 4, 3) group counts, then float64 pooling on
        # host; sem_t1/sem_t2 pool into 'sem' — the reference's
        # concatenated t1+t2 prediction list, kept exact per scene
        pooled = np.asarray(counts, np.float64).sum(axis=0)   # (4, 3)
        for row, k in zip(pooled, _DUALTASK_BLOCKS):
            totals["sem" if k.startswith("sem_") else k] += row

    # group_scale=2: this dispatch holds roughly twice the live bytes per
    # scene of the envelope-measured change-head forward (a second decoder
    # pass through sem_change_head plus four full-res per-scene probability
    # rasters and three confusion reductions), so halve the scenes/group to
    # stay inside the measured 16x1024^2 memory envelope.
    counts_fn = _dualtask_wire_counts_jit if mesh is None or mesh.size <= 1 \
        else _replicated_jit(_dualtask_wire_counts_jit.__wrapped__, mesh)
    _stream_wire_groups(
        ds, bucket, ("x1", "x2", "y", "ysem1", "ysem2", "valid"),
        run_group=lambda arrs: counts_fn(
            model, state.params, state.batch_stats, *arrs),
        accumulate=accumulate, mesh=mesh, wire_kwargs={"sem": True},
        group_scale=2)
    return {k: tuple(v) for k, v in totals.items()}
