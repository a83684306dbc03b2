"""Trainer drivers for the three training regimes.

Each ``run_*`` reproduces its reference entry point's control flow —
epoch/step accounting, DEBUG short-circuits, LOG_FREQ evaluation cadence,
wandb metric names, checkpoint epochs — on top of the TPU training core:

  * run_supervised        ⇔ train_supervised.py:17-116
  * run_semisupervised    ⇔ train_semisupervised.py:16-163
  * run_dualtask          ⇔ train_supervised_dualtask.py:16-128 (the
    reference script is startup-broken — missing parser/dataset/eval
    symbols, SURVEY defect 2 — its intended semantics are rebuilt working)

The hot loop is: threaded host loader (crop-only samples as joint channel
stacks) -> async device_put sharded over the data mesh -> one jitted step
(augment + fwd + bwd + AdamW). Loss scalars stay on device until log time.
"""

from __future__ import annotations

import timeit

import jax
import numpy as np

from . import checkpoints, evaluation, train_lib, wandb_compat
from .data.dataset import MultimodalCDDataset
from .data.loader import TrainLoader, prefetch_to_device
from .parallel import batch_sharding, data_mesh, maybe_initialize_distributed


def print_run_config(cfg, device_desc: str) -> None:
    """Stdout run-config table (reference train_supervised.py:18-28, minus
    the tabulate dependency)."""
    rows = [
        ("CONFIG_NAME", cfg.NAME),
        ("device", device_desc),
        ("epochs", cfg.TRAINER.EPOCHS),
        ("learning rate", cfg.TRAINER.LR),
        ("batch size", cfg.TRAINER.BATCH_SIZE),
    ]
    width = max(len(k) for k, _ in rows)
    print("+" + "-" * (width + 24) + "+")
    for k, v in rows:
        print(f"| {k:<{width}} : {v!s:<19} |")
    print("+" + "-" * (width + 24) + "+", flush=True)


def _training_mesh(cfg):
    maybe_initialize_distributed()
    n_space = int(cfg.TRAINER.get('SPATIAL_SHARDS', 1))
    if n_space > 1:
        # 2-D (data, space) mesh: height-sharded training for crops that
        # exceed a chip (the train-side analog of sharded_scene_probabilities)
        from .parallel import data_space_mesh

        try:
            mesh = data_space_mesh(n_space)
        except ValueError:
            mesh = None
        if mesh is not None \
                and cfg.TRAINER.BATCH_SIZE % (mesh.size // n_space) == 0 \
                and cfg.AUGMENTATION.CROP_SIZE % n_space == 0:
            return mesh
        print(f"warning: device count / batch {cfg.TRAINER.BATCH_SIZE} / "
              f"crop {cfg.AUGMENTATION.CROP_SIZE} incompatible with "
              f"SPATIAL_SHARDS={n_space}; falling back to data-parallel")
    mesh = data_mesh()
    if cfg.TRAINER.BATCH_SIZE % mesh.size != 0:
        if jax.process_count() > 1:
            # the single-device fallback would pin every process to the
            # GLOBAL device 0 — non-addressable from processes 1..N-1 —
            # and crash obscurely at the first device_put; fail loudly
            raise ValueError(
                f"TRAINER.BATCH_SIZE={cfg.TRAINER.BATCH_SIZE} is not "
                f"divisible by the {mesh.size}-device global mesh of this "
                f"{jax.process_count()}-process run; pick a divisible batch")
        print(f"warning: batch {cfg.TRAINER.BATCH_SIZE} not divisible by "
              f"{mesh.size} devices; running single-device")
        mesh = data_mesh(jax.devices()[:1])
    return mesh


def _create_or_resume(cfg):
    """Build the train state, optionally restoring a checkpoint when
    ``TRAINER.RESUME_CHECKPOINT`` names an epoch (new capability; the
    reference cannot resume mid-run — SURVEY §5 failure-detection row).
    The sentinel ``latest`` (or ``auto``) discovers the newest
    ``{NAME}_checkpoint{epoch}.pt`` in ``{OUTPUT}/networks/`` itself, so a
    preempted run restarts with the SAME command line; an empty directory
    is a cold start, not an error. Returns (model, state, start_step)."""
    resume = cfg.TRAINER.get('RESUME_CHECKPOINT', None)
    if isinstance(resume, str) and resume.lower() in ('latest', 'auto'):
        resume = checkpoints.latest_checkpoint_epoch(cfg)
        if resume is None:
            print('RESUME_CHECKPOINT latest: no checkpoint found; cold start')
    if resume is not None and resume != '':
        model, state, step = checkpoints.load_checkpoint(resume, cfg)
        print(f'resumed from checkpoint epoch {resume} (step {step})')
        return model, state, int(step)
    model, state = train_lib.create_train_state(cfg, jax.random.PRNGKey(cfg.SEED))
    return model, state, 0


class ProfilerHook:
    """Optional jax.profiler trace over a step window (SURVEY §5 tracing
    row): set ``TRAINER.PROFILE_DIR`` to capture steps [10, 30)."""

    START_STEP, STOP_STEP = 10, 30

    def __init__(self, cfg):
        self.dir = cfg.TRAINER.get('PROFILE_DIR', None)
        self.active = False

    def step(self, global_step: int) -> None:
        if not self.dir:
            return
        if not self.active and global_step >= self.START_STEP:
            jax.profiler.start_trace(str(self.dir))
            self.active = True
        elif self.active and global_step >= self.STOP_STEP:
            jax.profiler.stop_trace()
            self.active = False
            self.dir = None

    def close(self) -> None:
        if self.active:
            jax.profiler.stop_trace()
            self.active = False


def measure_dispatch_latency_ms(wedge_timeout: float = 900.0) -> float:
    """Per-call dispatch latency of a tiny jitted op, in milliseconds.

    On remote-attached backends (the tunneled axon TPU) each dispatch costs
    ~2.7 ms of host->device command latency while a local backend is in the
    tens of microseconds. ``block_until_ready`` resolves before execution
    finishes on such backends, so timing is anchored on a host fetch: the
    difference between (21 chained dispatches + 1 fetch) and (1 dispatch +
    1 fetch) isolates 20 dispatches.

    A wedged tunnel hangs the very first dispatch+fetch forever (observed
    outage mode, see bench.py's watchdog) — since this probe is the first
    device contact of every 'auto' trainer run, it arms its own watchdog:
    no completed warmup fetch within ``wedge_timeout`` (healthy worst case
    ~100 s warmup) aborts loudly instead of hanging the CLI silently."""
    import os
    import sys
    import threading

    import jax.numpy as jnp

    ready = threading.Event()

    def watch():
        if not ready.wait(wedge_timeout):
            print(f"TRAINER WEDGED: no completed device fetch after "
                  f"{wedge_timeout:.0f}s — accelerator backend unreachable "
                  f"(tunnel down?); aborting", file=sys.stderr, flush=True)
            os._exit(2)

    threading.Thread(target=watch, daemon=True).start()
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((), jnp.float32)
    float(f(x))  # compile + first round trip
    ready.set()

    def timed(n: int) -> float:
        t0 = timeit.default_timer()
        y = x
        for _ in range(n):
            y = f(y)
        float(y)
        return timeit.default_timer() - t0

    t1 = min(timed(1) for _ in range(3))
    t21 = min(timed(21) for _ in range(3))
    return max((t21 - t1) / 20.0 * 1e3, 0.0)


def auto_steps_per_execution(log_freq: int, steps_per_epoch: int,
                             dispatch_ms: float,
                             threshold_ms: float = 0.5,
                             max_k: int = 20) -> int:
    """Pick the scan-fusion factor k for STEPS_PER_EXECUTION='auto': when the
    per-step dispatch latency is material (> ``threshold_ms``), the largest
    k <= ``max_k`` that divides both LOG_FREQ and steps/epoch — so the log
    cadence and epoch accounting stay exact; otherwise 1.

    ``max_k`` 20 is from the round-2 scan-saturation probe (BASELINE.md):
    K=10 left ~1% on the tunneled rig (330.1 vs 333.6 at K=20); K=40 adds
    only +0.1% more while doubling the input staging footprint, so 20 is
    the knee."""
    if dispatch_ms <= threshold_ms:
        return 1
    import math

    g = math.gcd(int(log_freq), int(steps_per_epoch))
    return max((d for d in range(1, max_k + 1) if g % d == 0), default=1)


def _execution_plan(cfg, model, regime, mesh, loader, start_step: int = 0):
    """Resolve STEPS_PER_EXECUTION: returns (k, step_fn, sharding_spec).

    k > 1 fuses k optimizer steps into one dispatch via lax.scan
    (train_lib.make_scanned_train_step) — worthwhile when dispatch latency
    is material (remote-attached TPUs). The default 'auto' probes dispatch
    latency at trainer start and picks k itself; an explicit integer is
    honored, falling back to 1 when DEBUG or when the epoch/log cadence does
    not divide evenly. A resumed ``start_step`` that is not a multiple of k
    also forces k=1: global_step advances in strides of k, so a misaligned
    start would make ``global_step % LOG_FREQ == 0`` unreachable and
    silently disable every in-epoch eval and loss log of the resumed run."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .parallel.mesh import DATA_AXIS

    raw = cfg.TRAINER.get('STEPS_PER_EXECUTION', 'auto')
    if isinstance(raw, str) and raw.lower() == 'auto':
        if cfg.DEBUG:
            k = 1
        else:
            # WEDGE_TIMEOUT: seconds allowed for the first device fetch
            # (compile + tunnel warmup). 900 s covers the healthy worst
            # case here, but transiently slow tunnel days exceed it
            # (observed round 5) — harnesses that retry anyway can widen it
            ms = measure_dispatch_latency_ms(
                float(cfg.TRAINER.get('WEDGE_TIMEOUT', 900.0)))
            if jax.process_count() > 1:
                # every process must enqueue the SAME program over the
                # global mesh: the latency probe is wall-clock noise, so
                # agree on process 0's measurement before deriving k
                from jax.experimental import multihost_utils

                ms = float(multihost_utils.broadcast_one_to_all(
                    np.float32(ms)))
            k = auto_steps_per_execution(cfg.LOG_FREQ, len(loader), ms)
            if k > 1:
                print(f'dispatch latency {ms:.2f} ms/step -> '
                      f'STEPS_PER_EXECUTION={k} (scan-fused)')
    else:
        k = int(raw)
        if k > 1 and (cfg.DEBUG or len(loader) % k != 0
                      or cfg.LOG_FREQ % k != 0):
            print(f'warning: STEPS_PER_EXECUTION={k} incompatible with '
                  f'steps/epoch={len(loader)} or LOG_FREQ={cfg.LOG_FREQ}; '
                  f'using 1')
            k = 1
    if k > 1 and start_step % k != 0:
        print(f'warning: resume step {start_step} is not a multiple of '
              f'STEPS_PER_EXECUTION={k}; using 1 so the LOG_FREQ cadence '
              f'stays reachable')
        k = 1
    from .parallel.mesh import wire_sharding

    if k <= 1:
        sharding = {"stack": wire_sharding(mesh),
                    "is_labeled": batch_sharding(mesh)}
        return 1, train_lib.make_train_step(model, cfg, regime, mesh=mesh), \
            sharding
    step_fn = train_lib.make_scanned_train_step(model, cfg, regime, mesh=mesh)
    sharding = {"stack": wire_sharding(mesh, scanned=True),
                "is_labeled": NamedSharding(mesh, P(None, DATA_AXIS))}
    return k, step_fn, sharding


def _batch_stream(cfg, loader, k, sharding):
    """Loader -> (grouped ->) device-staged batch stream."""
    from .data.loader import group_batches

    source = loader if k == 1 else group_batches(loader, k)
    return prefetch_to_device(source, sharding=sharding)


def _loader(cfg) -> TrainLoader:
    ds = MultimodalCDDataset(cfg, 'training', return_stack=True, crop_only=True)
    print(ds)
    return TrainLoader(
        ds,
        batch_size=cfg.TRAINER.BATCH_SIZE,
        shuffle=cfg.DATALOADER.SHUFFLE,
        drop_last=True,
        num_workers=0 if cfg.DEBUG else cfg.DATALOADER.NUM_WORKER,
        seed=cfg.SEED,
        worker_type=cfg.DATALOADER.get('WORKER_TYPE', 'thread'),
    )


def _mean(values: list) -> float:
    return float(np.mean([float(v) for v in values])) if values else 0.0


def _fetch_window(sets: dict, label_counts: list) -> tuple[dict, list]:
    """Gather a log window's device scalars in ONE stack + ONE host fetch.
    Fetching them one ``float()`` at a time costs a serial ~25 ms RTT each
    on the tunneled backend — ~40 round trips (≈1 s) per semisup log window
    at the production cadence; the stacked fetch is 2 round trips total."""
    import jax.numpy as jnp

    flat = [v for k in sets for v in sets[k]]
    flat += [x for row in label_counts for x in row]
    if not flat:
        return sets, label_counts
    stacked = np.asarray(jnp.stack([jnp.asarray(v) for v in flat]))
    out, i = {}, 0
    for k in sets:
        out[k] = list(stacked[i:i + len(sets[k])])
        i += len(sets[k])
    rows = []
    for row in label_counts:
        rows.append(tuple(stacked[i:i + len(row)]))
        i += len(row)
    return out, rows


def _semisup_window_means(sets: dict, label_counts: list) -> dict:
    """Reduce the window's scalars with the reference's protocol
    (train_semisupervised.py:85-106): supervised component losses average
    only over batches that HAD labeled rows, the consistency loss only over
    batches that had unlabeled rows (our step emits 0 for the absent
    partition, which must not bias the mean toward 0).

    ``label_counts`` rows are (n_labeled, n_notlabeled[, w_lab, w_unl]);
    the optional weights carry how many LEAF batches inside a scan-fused /
    grad-accum entry had each partition, so the cross-window reduction
    stays the reference's flat per-batch average (a window with one labeled
    batch must not weigh as much as a window with k of them). Rows without
    weights fall back to 0/1 presence — the exact per-batch case."""
    n_lab = np.array([float(r[0]) for r in label_counts])
    n_unl = np.array([float(r[1]) for r in label_counts])
    w_lab = np.array([float(r[2]) if len(r) > 2 else float(r[0] > 0)
                      for r in label_counts])
    w_unl = np.array([float(r[3]) if len(r) > 3 else float(r[1] > 0)
                      for r in label_counts])

    def weighted_mean(key, w):
        vals = np.array([float(v) for v in sets[key]])
        return float((vals * w).sum() / w.sum()) if w.sum() > 0 else 0.0

    total = n_lab.sum() + n_unl.sum()
    return {
        'fusion_loss': weighted_mean('fusion_loss', w_lab),
        'stream1_loss': weighted_mean('stream1_loss', w_lab),
        'stream2_loss': weighted_mean('stream2_loss', w_lab),
        'sup_loss': weighted_mean('sup_loss', w_lab),
        'cons_loss': weighted_mean('cons_loss', w_unl),
        'loss': _mean(sets['loss']),
        'labeled_percentage':
            float(n_lab.sum()) / max(total, 1.0) * 100,
    }


# Per-regime differences of the otherwise-identical training loop:
#   keys            — device metric scalars accumulated per log window
#   track_labels    — also collect (n_labeled, n_notlabeled) per batch
#   debug_test_eval — DEBUG short-circuit runs a test eval first
#                     (train_supervised.py:84-86; semisup just breaks,
#                     train_semisupervised.py:123-124)
#   ckpt_in_debug   — semisup checkpointing is NOT gated on DEBUG,
#                     matching the reference (train_semisupervised.py:161-163)
_REGIMES = {
    'supervised': dict(
        keys=('loss',), track_labels=False,
        debug_test_eval=True, ckpt_in_debug=False),
    'semisupervised': dict(
        keys=('fusion_loss', 'stream1_loss', 'stream2_loss',
              'loss', 'sup_loss', 'cons_loss'), track_labels=True,
        debug_test_eval=False, ckpt_in_debug=True),
    'dualtask': dict(
        keys=('loss', 'sem_loss', 'change_loss'), track_labels=False,
        debug_test_eval=True, ckpt_in_debug=False),
}


def _window_summary(regime: str, sets: dict, label_counts: list) -> dict:
    """Reduce a log window's device scalars to the regime's wandb payload
    (metric names and order match the reference scripts)."""
    sets, label_counts = _fetch_window(sets, label_counts)
    if regime == 'semisupervised':
        return _semisup_window_means(sets, label_counts)
    if regime == 'dualtask':
        return {'change_loss': _mean(sets['change_loss']),
                'sem_loss': _mean(sets['sem_loss']),
                'loss': _mean(sets['loss']),
                'labeled_percentage': 100}
    return {'loss': _mean(sets['loss']), 'labeled_percentage': 100}


def run_training(cfg, regime: str) -> None:
    """The training driver shared by all three regimes; per-regime behavior
    is confined to the _REGIMES table and _window_summary."""
    spec = _REGIMES[regime]
    mesh = _training_mesh(cfg)
    print_run_config(cfg, f"{jax.default_backend()}[{mesh.size}]")

    model, state, start_step = _create_or_resume(cfg)
    profiler = ProfilerHook(cfg)
    rng = jax.random.PRNGKey(cfg.SEED)

    loader = _loader(cfg)
    epochs = cfg.TRAINER.EPOCHS
    save_checkpoints = cfg.SAVE_CHECKPOINTS
    steps_per_epoch = len(loader)
    if steps_per_epoch == 0:
        raise ValueError(
            f"empty training loader: {len(loader.dataset)} samples < "
            f"TRAINER.BATCH_SIZE={cfg.TRAINER.BATCH_SIZE} with drop_last — "
            f"shrink the batch or raise DATALOADER.TRAINING_MULTIPLIER")
    k_exec, step_fn, stream_sharding = _execution_plan(
        cfg, model, regime, mesh, loader, start_step)

    global_step = start_step  # advances inside _run_epochs
    start_epoch = start_step // steps_per_epoch
    if start_epoch:
        print(f'resuming at epoch {start_epoch + 1} '
              f'(step {start_step}, {steps_per_epoch} steps/epoch)')
        # an unbroken run would have consumed start_epoch loader epochs;
        # advancing the counter keeps the resumed shuffle/crop sequence on
        # the SAME schedule instead of replaying epochs 1..start_epoch
        loader.set_epoch(start_epoch)
    try:
        _run_epochs(cfg, regime, spec, mesh, model, state, rng, loader,
                    epochs, save_checkpoints, steps_per_epoch, k_exec,
                    step_fn, stream_sharding, profiler, global_step,
                    start_step, start_epoch)
    finally:
        # shut the worker pool down (a lingering ProcessPoolExecutor keeps
        # dataset/memmap copies alive and competes with post-training work)
        loader.close()
        profiler.close()


def _run_epochs(cfg, regime, spec, mesh, model, state, rng, loader, epochs,
                save_checkpoints, steps_per_epoch, k_exec, step_fn,
                stream_sharding, profiler, global_step, start_step,
                start_epoch) -> None:
    for epoch in range(start_epoch + 1, epochs + 1):
        print(f'Starting epoch {epoch}/{epochs}.')
        start = timeit.default_timer()
        sets: dict[str, list] = {k: [] for k in spec['keys']}
        label_counts: list = []

        for batch in _batch_stream(cfg, loader, k_exec, stream_sharding):
            state, m = step_fn(state, batch['stack'], batch['is_labeled'], rng)
            # keep device scalars; fetch only at log time
            for k in sets:
                sets[k].append(m[k])
            if spec['track_labels']:
                # weights: leaf-batch presence counts when the entry is a
                # scan/accum window (n_lab_steps), else 0/1 presence — see
                # _semisup_window_means
                label_counts.append(
                    (m['n_labeled'], m['n_notlabeled'],
                     m.get('n_lab_steps', m['n_labeled'] > 0),
                     m.get('n_notlab_steps', m['n_notlabeled'] > 0)))

            global_step += k_exec
            profiler.step(global_step)
            epoch_float = global_step / steps_per_epoch

            if cfg.DEBUG:
                if spec['debug_test_eval']:
                    evaluation.model_evaluation(model, state, cfg, 'test',
                                                epoch_float, global_step,
                                                mesh=mesh)
                break

            if global_step % cfg.LOG_FREQ == 0:
                print(f'Logging step {global_step} (epoch {epoch_float:.2f}).')
                if next(iter(sets.values()), None):
                    # drain the queued train steps before timing the evals —
                    # a host FETCH, because on the tunneled axon platform
                    # block_until_ready resolves before execution finishes
                    # (CLAUDE.md); one ~25 ms RTT per LOG_FREQ window
                    jax.device_get(next(iter(sets.values()))[-1])
                eval_start = timeit.default_timer()
                evaluation.model_evaluation(model, state, cfg, 'training',
                                            epoch_float, global_step,
                                            mesh=mesh)
                evaluation.model_evaluation(model, state, cfg, 'validation',
                                            epoch_float, global_step,
                                            mesh=mesh)
                eval_time = timeit.default_timer() - eval_start
                time = timeit.default_timer() - start
                wandb_compat.log({
                    **_window_summary(regime, sets, label_counts),
                    'time': time,
                    # beyond-reference instrumentation: the window 'time'
                    # (kept for metric parity, reference
                    # train_supervised.py:100-116) is dominated by the two
                    # full-split in-window evals at production shape;
                    # train_time isolates the LOG_FREQ training steps so
                    # steps/s is checkable against bench.py
                    'train_time': time - eval_time,
                    'step': global_step,
                    'epoch': epoch_float,
                })
                start = timeit.default_timer()
                sets = {k: [] for k in sets}
                label_counts = []

        if not cfg.DEBUG and start_step % steps_per_epoch == 0:
            assert epoch == epoch_float
        print(f'epoch float {epoch_float} (step {global_step}) - epoch {epoch}')
        evaluation.model_evaluation(model, state, cfg, 'training', epoch_float, global_step, mesh=mesh)
        evaluation.model_evaluation(model, state, cfg, 'validation', epoch_float, global_step, mesh=mesh)
        evaluation.model_evaluation(model, state, cfg, 'test', epoch_float, global_step, mesh=mesh)

        if epoch in save_checkpoints and (spec['ckpt_in_debug'] or not cfg.DEBUG):
            print('saving network', flush=True)
            checkpoints.save_checkpoint(state, epoch, global_step, cfg)


def run_supervised(cfg) -> None:
    run_training(cfg, 'supervised')


def run_semisupervised(cfg) -> None:
    run_training(cfg, 'semisupervised')


def run_dualtask(cfg) -> None:
    run_training(cfg, 'dualtask')


def seed_everything(seed: int) -> None:
    """Host-side determinism (reference train_supervised.py:124-127; device
    determinism comes from explicit JAX PRNG keys by construction)."""
    np.random.seed(seed)
