"""Training core: train state, jitted train steps for all three regimes.

One jitted XLA program per optimizer step, containing the device-side
augmentation graph, the forward+backward pass, and the AdamW update —
the TPU-first restructuring of the reference's per-batch Python loop
(train_supervised.py:63-77, train_semisupervised.py:66-118,
train_supervised_dualtask.py:64-92).

Data parallelism: batches arrive sharded on the leading axis over the
:mod:`~.parallel.mesh` data mesh; the step is jitted with replicated
in/out shardings for the state, so GSPMD inserts the gradient all-reduce
over ICI. Loss semantics match the reference exactly, with the
semi-supervised labeled/unlabeled partition expressed as loss masks
(see :mod:`~.losses`) instead of dynamic boolean indexing.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.training import train_state

from . import losses
from .data.augmentations import device_augment_batch
from .models import create_network, init_variables
from .parallel import replicated_sharding


class TrainState(train_state.TrainState):
    batch_stats: Any = struct.field(default=None)


# Each regime's headline model — the pairing the shipped configs use
# (siamese.yaml / dtsiamese.yaml / siamese_mmcr_*.yaml). Single source for
# bench.py, tools/profile_step.py, tools/f1_trajectory_parity.py and the
# driver dryrun.
REGIME_MODELS = {
    "supervised": "siameseunet",
    "dualtask": "dtsiameseunet",
    "semisupervised": "whatevernet",
}


def make_optimizer(cfg) -> optax.GradientTransformation:
    """AdamW with the reference's hyperparameters: lr from TRAINER.LR,
    weight_decay 0.01 hardcoded, torch betas/eps defaults
    (train_supervised.py:32)."""
    return optax.adamw(learning_rate=cfg.TRAINER.LR, b1=0.9, b2=0.999,
                       eps=1e-8, weight_decay=0.01)


def create_train_state(cfg, rng: jax.Array):
    """Build (model, TrainState) for ``cfg``."""
    model = create_network(cfg)
    variables = init_variables(model, cfg, rng)
    tx = make_optimizer(cfg)
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tx,
    )
    return model, state


# --------------------------------------------------------------------------
# Batch stack layout
# --------------------------------------------------------------------------

def stack_layout(cfg) -> dict:
    """Static channel offsets of the joint training stack:
    [s1_t1 | s1_t2 | s2_t1 | s2_t2 | buildings_t1 | buildings_t2 | change].

    WIRE format (what the loader ships and the step functions take) is
    channel-PLANAR ``(B, C, S, S)`` (scanned: ``(K, B, C, S, S)``) — planar
    crop assembly is 16x cheaper on the 1-core host (see data/cache.py).
    The step transposes to NHWC on device (:func:`wire_to_nhwc`, one
    layout op XLA folds into the augmentation graph); everything from
    :func:`split_stack` on is channels-last.
    """
    n_s1 = len(cfg.DATALOADER.S1_BANDS)
    n_s2 = len(cfg.DATALOADER.S2_BANDS)
    return {
        "n_s1": n_s1,
        "n_s2": n_s2,
        "n_img": 2 * n_s1 + 2 * n_s2,
        "input_mode": cfg.DATALOADER.INPUT_MODE,
    }


def wire_to_nhwc(stack: jnp.ndarray) -> jnp.ndarray:
    """Planar wire stack ``(..., C, S, S)`` -> channels-last
    ``(..., S, S, C)`` (device-side; works for batched and scanned wires)."""
    return jnp.moveaxis(stack, -3, -1)


def nhwc_to_wire(stack: np.ndarray) -> np.ndarray:
    """Host-side inverse of :func:`wire_to_nhwc` for tests/tools that build
    channels-last stacks and need the planar wire layout."""
    return np.ascontiguousarray(np.moveaxis(stack, -1, -3))


def split_stack(stack: jnp.ndarray, layout: dict):
    """Split the joint NHWC stack (post :func:`wire_to_nhwc`) into model
    inputs and labels (static slices)."""
    n_s1, n_s2, n_img = layout["n_s1"], layout["n_s2"], layout["n_img"]
    s1_t1 = stack[..., :n_s1]
    s1_t2 = stack[..., n_s1:2 * n_s1]
    s2_t1 = stack[..., 2 * n_s1:2 * n_s1 + n_s2]
    s2_t2 = stack[..., 2 * n_s1 + n_s2:n_img]
    # labels in f32: loss reductions must not accumulate in bf16
    y_sem_t1 = stack[..., n_img:n_img + 1].astype(jnp.float32)
    y_sem_t2 = stack[..., n_img + 1:n_img + 2].astype(jnp.float32)
    y_change = stack[..., n_img + 2:n_img + 3].astype(jnp.float32)

    mode = layout["input_mode"]
    if mode == "s1":
        x_t1, x_t2 = s1_t1, s1_t2
    elif mode == "s2":
        x_t1, x_t2 = s2_t1, s2_t2
    else:
        x_t1 = jnp.concatenate([s1_t1, s2_t1], axis=-1)
        x_t2 = jnp.concatenate([s1_t2, s2_t2], axis=-1)
    return x_t1, x_t2, y_change, y_sem_t1, y_sem_t2


def _augment(stack, rng, cfg, layout):
    a = cfg.AUGMENTATION
    # Augment in the model's compute dtype (bf16 by default): the 5
    # elementwise augmentation passes are HBM-bound, so halving the bytes
    # halves their cost (~1.4 ms/step at batch 8). Flips/rot90 are exact in
    # any dtype and the label planes are {0,1} (exact in bf16); gamma's pow
    # rounds at the model's own bf16 input precision. Labels are upcast to
    # f32 in split_stack before any loss reduction.
    from .models.factory import compute_dtype

    stack = wire_to_nhwc(stack).astype(compute_dtype(cfg))
    return device_augment_batch(
        stack, rng,
        flip=bool(a.RANDOM_FLIP), rotate=bool(a.RANDOM_ROTATE),
        color_shift=bool(a.COLOR_SHIFT), gamma=bool(a.GAMMA_CORRECTION),
        n_img_channels=layout["n_img"])


def _apply_train(model, params, batch_stats, x_t1, x_t2, rng, bn_groups=1):
    """Train-mode forward. ``bn_groups > 1`` is the per-replica BatchNorm
    mode (MODEL.SYNC_BN: False): the batch is split into ``bn_groups``
    contiguous groups — one per mesh device, matching the leading-axis
    sharding — and vmapped so BN statistics are computed per group, exactly
    like ``nn.DataParallel``'s per-replica stats (SURVEY §2.12). The
    retained running stats are group 0's (DataParallel keeps only device
    0's buffer updates); the loss downstream still reduces over the full
    gathered batch, as DataParallel's device-0 loss does. Default (1) is
    sync-BN over the global batch."""
    def fwd(a, b, drop_rng):
        out, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            a, b, train=True, mutable=["batch_stats"],
            rngs={"dropout": drop_rng})
        return out, updates["batch_stats"]

    if bn_groups <= 1:
        return fwd(x_t1, x_t2, rng)

    batch = x_t1.shape[0]
    gb = batch // bn_groups
    xs1 = x_t1.reshape(bn_groups, gb, *x_t1.shape[1:])
    xs2 = x_t2.reshape(bn_groups, gb, *x_t2.shape[1:])
    # independent dropout masks per group, like DataParallel's per-replica
    # RNG streams (only siamunet_diff uses dropout)
    out, stats = jax.vmap(fwd)(xs1, xs2, jax.random.split(rng, bn_groups))
    out = jax.tree_util.tree_map(
        lambda o: o.reshape(batch, *o.shape[2:]), out)
    new_stats = jax.tree_util.tree_map(lambda s: s[0], stats)
    return out, new_stats


def bn_group_count(cfg, mesh) -> int:
    """Resolve MODEL.SYNC_BN into the per-replica group count for
    ``_apply_train``: 1 (sync-BN, default) or the mesh size."""
    from .parallel.mesh import data_axis_size

    sync = cfg.MODEL.get("SYNC_BN", True)
    if sync or mesh is None or mesh.size <= 1:
        return 1
    n = data_axis_size(mesh)  # per-replica == per data-axis column; a 2-D
    if n <= 1:                # (data, space) mesh's space shards share stats
        return 1
    if cfg.TRAINER.BATCH_SIZE % n:
        raise ValueError(
            f"MODEL.SYNC_BN: False needs TRAINER.BATCH_SIZE "
            f"({cfg.TRAINER.BATCH_SIZE}) divisible by the {n}-device mesh")
    return n


# --------------------------------------------------------------------------
# Train steps
# --------------------------------------------------------------------------

def _jit_step(fn, mesh, batch_ndim: int = 1):
    """Jit a step body with data-parallel shardings. ``batch_ndim`` 1 shards
    the leading axis of stack/is_labeled; 2 shards their second axis (the
    scanned multi-batch layout (K, B, ...)). On a 2-D ``(data, space)`` mesh
    the wire stack's height axis is additionally sharded over ``space``
    (GSPMD conv halo exchange + cross-space BN reductions)."""
    if mesh is None:
        return jax.jit(fn, donate_argnums=(0,))
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .parallel.mesh import DATA_AXIS, wire_sharding

    rep = replicated_sharding(mesh)
    stack_sh = wire_sharding(mesh, scanned=batch_ndim == 2)
    lab_spec = P(DATA_AXIS) if batch_ndim == 1 else P(None, DATA_AXIS)
    lab_sh = NamedSharding(mesh, lab_spec)
    return jax.jit(
        fn, donate_argnums=(0,),
        in_shardings=(rep, stack_sh, lab_sh, rep),
        out_shardings=(rep, rep),
    )


def _grad_apply_step(grads_of, cfg, mesh=None, bn_groups: int = 1) -> Callable:
    """Finish a regime's gradient function into a full optimizer step.

    ``grads_of(state, stack, is_labeled, rng) -> (grads, new_stats, aux)``
    computes one batch's gradients. With ``TRAINER.GRAD_ACCUM: a > 1`` the
    global batch is split into ``a`` micro-batches scanned sequentially:
    gradients are averaged across micro-batches into ONE optimizer step
    (the memory lever for batches whose activations exceed a chip —
    composes with MODEL.REMAT and TRAINER.SPATIAL_SHARDS). Matching torch
    accumulation semantics: BatchNorm normalizes per micro-batch and its
    running stats chain through the micro-batches; masked-mean losses
    average per micro-batch then across them (== global mean only when the
    mask counts are equal per micro-batch). Metrics: ``n_*`` keys sum over
    micro-batches, semi-supervised component losses take presence-masked
    means (the per-step analog of the scanned-window reduction), the rest
    average.

    The MICRO-batch is what the model sees, so it carries the layout
    constraints the global batch carried without accumulation: it must
    split evenly over the mesh's data axis (otherwise GSPMD silently
    all-gathers the batch — replicating exactly the activations GRAD_ACCUM
    exists to shrink) and over the per-replica BN groups of
    ``MODEL.SYNC_BN: False``. Both are validated here with clear errors."""
    accum = int(cfg.TRAINER.get("GRAD_ACCUM", 1))

    if accum <= 1:
        def step(state: TrainState, stack, is_labeled, rng):
            grads, new_stats, aux = grads_of(state, stack, is_labeled, rng)
            return state.apply_gradients(grads=grads,
                                         batch_stats=new_stats), aux
        return step

    from .parallel.mesh import data_axis_size
    data_shards = 1 if mesh is None else data_axis_size(mesh)

    def step(state: TrainState, stack, is_labeled, rng):
        batch = stack.shape[0]
        if batch % accum:
            raise ValueError(f"TRAINER.GRAD_ACCUM={accum} must divide the "
                             f"batch size {batch}")
        mb = batch // accum
        if data_shards > 1 and mb % data_shards:
            raise ValueError(
                f"TRAINER.GRAD_ACCUM={accum} makes the micro-batch {mb}, "
                f"which does not split over the {data_shards}-shard data "
                f"mesh axis — GSPMD would all-gather (replicate) the batch. "
                f"Use a batch size with micro-batch a multiple of "
                f"{data_shards}.")
        if bn_groups > 1 and mb % bn_groups:
            raise ValueError(
                f"TRAINER.GRAD_ACCUM={accum} makes the micro-batch {mb}, "
                f"which does not split over the {bn_groups} per-replica BN "
                f"groups of MODEL.SYNC_BN: False.")
        stacks = stack.reshape(accum, mb, *stack.shape[1:])
        labs = is_labeled.reshape(accum, mb)

        def body(carry, xs):
            stats, g_acc = carry
            s, lab, idx = xs
            # distinct augmentation randomness per micro-batch (grads_of
            # folds state.step on top, so accum=1 semantics are unchanged)
            grads, new_stats, aux = grads_of(
                state.replace(batch_stats=stats), s, lab,
                jax.random.fold_in(rng, idx))
            g_acc = jax.tree_util.tree_map(jnp.add, g_acc, grads)
            return (new_stats, g_acc), aux

        zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        (new_stats, g_sum), auxs = jax.lax.scan(
            body, (state.batch_stats, zeros),
            (stacks, labs, jnp.arange(accum)))
        grads = jax.tree_util.tree_map(lambda g: g / accum, g_sum)
        aux = _reduce_window_metrics(auxs)
        return state.apply_gradients(grads=grads, batch_stats=new_stats), aux

    return step


def _reduce_window_metrics(metrics: dict) -> dict:
    """Reduce per-step metrics stacked on a leading axis (scanned windows,
    gradient-accumulation micro-batches) to one scalar set. Semi-supervised
    component losses average only over entries where their partition was
    present (a plain mean would dilute them toward 0 — the reference's
    window protocol, train_semisupervised.py:85-106); counts are sums.

    The reduction is WEIGHTED by each entry's leaf-batch presence count
    (``n_lab_steps``/``n_notlab_steps``: how many underlying batches had the
    partition — 0/1 for plain entries, up to ``a`` for grad-accum entries).
    Weighted means of weighted means with summed weights compose exactly,
    so nesting (accum inside scan inside the trainer's log window) always
    reproduces the reference's flat per-batch average."""
    if "n_labeled" in metrics:
        w_lab = metrics.get("n_lab_steps",
                            (metrics["n_labeled"] > 0).astype(jnp.float32))
        w_unl = metrics.get("n_notlab_steps",
                            (metrics["n_notlabeled"] > 0).astype(jnp.float32))

        def wmean(key, w):
            return jnp.sum(metrics[key] * w) / jnp.maximum(jnp.sum(w), 1.0)

        return {
            "loss": jnp.mean(metrics["loss"]),
            "sup_loss": wmean("sup_loss", w_lab),
            "cons_loss": wmean("cons_loss", w_unl),
            "fusion_loss": wmean("fusion_loss", w_lab),
            "stream1_loss": wmean("stream1_loss", w_lab),
            "stream2_loss": wmean("stream2_loss", w_lab),
            "n_labeled": jnp.sum(metrics["n_labeled"]),
            "n_notlabeled": jnp.sum(metrics["n_notlabeled"]),
            "n_lab_steps": jnp.sum(w_lab),
            "n_notlab_steps": jnp.sum(w_unl),
        }
    return jax.tree_util.tree_map(lambda a: jnp.mean(a, axis=0), metrics)


def make_supervised_train_step(model, cfg, mesh=None, jit: bool = True) -> Callable:
    """Supervised change-detection step (reference train_supervised.py:63-77):
    ``loss = criterion(logits, y_change)``; single-head models only."""
    criterion = losses.get_criterion(cfg.MODEL.LOSS_TYPE)
    layout = stack_layout(cfg)
    bn_groups = bn_group_count(cfg, mesh)

    def grads_of(state: TrainState, stack, is_labeled, rng):
        del is_labeled
        aug_rng, drop_rng = jax.random.split(jax.random.fold_in(rng, state.step))
        stack_aug = _augment(stack, aug_rng, cfg, layout)
        x_t1, x_t2, y_change, _, _ = split_stack(stack_aug, layout)

        def loss_fn(params):
            logits, new_stats = _apply_train(model, params, state.batch_stats,
                                             x_t1, x_t2, drop_rng, bn_groups)
            return criterion(logits, y_change), new_stats

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        return grads, new_stats, {"loss": loss}

    step = _grad_apply_step(grads_of, cfg, mesh, bn_groups)
    return _jit_step(step, mesh) if jit else step


def make_semisupervised_train_step(model, cfg, mesh=None, jit: bool = True) -> Callable:
    """Cross-modal consistency step (reference train_semisupervised.py:66-118).

    sup = mean(fusion, stream1, stream2 losses on labeled rows) * α
    cons = consistency(stream1, stream2 on unlabeled rows) * (1 - α)
    total = sup (labeled only) / cons (unlabeled only) / sup + cons (mixed),
    expressed as presence-weighted arithmetic so the step stays static.
    """
    # Any 3-head model trains here, matching the reference's positional
    # unpacking (train_semisupervised.py:74): whatevernet/whatevernet2
    # (fusion + per-modality streams) and dtsiameseunet (the dtsiamese_ssl
    # configs — change head as 'fusion', semantic heads as the consistency
    # pair, exactly as the reference trainer would consume it).
    if cfg.MODEL.TYPE not in ("whatevernet", "whatevernet2", "dtsiameseunet"):
        raise ValueError(
            f"semisupervised training needs a 3-head model "
            f"(whatevernet/whatevernet2/dtsiameseunet), got "
            f"MODEL.TYPE={cfg.MODEL.TYPE!r}")
    sup_criterion = losses.get_criterion(cfg.MODEL.LOSS_TYPE)
    cons_criterion = losses.get_criterion(cfg.CONSISTENCY_TRAINER.LOSS_TYPE)
    cons_is_l2 = cfg.CONSISTENCY_TRAINER.LOSS_TYPE == "L2"
    alpha = float(cfg.CONSISTENCY_TRAINER.LOSS_FACTOR)
    layout = stack_layout(cfg)
    bn_groups = bn_group_count(cfg, mesh)

    def grads_of(state: TrainState, stack, is_labeled, rng):
        aug_rng, drop_rng = jax.random.split(jax.random.fold_in(rng, state.step))
        stack_aug = _augment(stack, aug_rng, cfg, layout)
        x_t1, x_t2, y_change, _, _ = split_stack(stack_aug, layout)

        lab = is_labeled.astype(jnp.float32)
        unlab = 1.0 - lab
        has_lab = jnp.max(lab)
        has_unlab = jnp.max(unlab)

        def loss_fn(params):
            (logits_fusion, logits_s1, logits_s2), new_stats = _apply_train(
                model, params, state.batch_stats, x_t1, x_t2, drop_rng,
                bn_groups)
            probs_s1 = jax.nn.sigmoid(logits_s1)
            probs_s2 = jax.nn.sigmoid(logits_s2)

            fusion_loss = sup_criterion(logits_fusion, y_change, mask=lab)
            stream1_loss = sup_criterion(logits_s1, y_change, mask=lab)
            stream2_loss = sup_criterion(logits_s2, y_change, mask=lab)
            sup_loss = alpha * (fusion_loss + stream1_loss + stream2_loss) / 3.0

            if cons_is_l2:
                cons_raw = cons_criterion(probs_s1, probs_s2, mask=unlab)
            else:
                cons_raw = cons_criterion(logits_s1, probs_s2, mask=unlab)
            cons_loss = (1.0 - alpha) * cons_raw

            loss = has_lab * sup_loss + has_unlab * cons_loss
            aux = {
                "loss": loss,
                "sup_loss": has_lab * sup_loss,
                "cons_loss": has_unlab * cons_loss,
                "fusion_loss": has_lab * fusion_loss,
                "stream1_loss": has_lab * stream1_loss,
                "stream2_loss": has_lab * stream2_loss,
                "n_labeled": jnp.sum(lab),
                "n_notlabeled": jnp.sum(unlab),
            }
            return loss, (new_stats, aux)

        (_, (new_stats, aux)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return grads, new_stats, aux

    step = _grad_apply_step(grads_of, cfg, mesh, bn_groups)
    return _jit_step(step, mesh) if jit else step


def make_dualtask_train_step(model, cfg, mesh=None, jit: bool = True) -> Callable:
    """Dual-task step (intended semantics of the reference's stale
    train_supervised_dualtask.py:64-92, rebuilt working):
    ``loss = (change_loss + (sem_t1_loss + sem_t2_loss) / 2) / 2``."""
    change_criterion = losses.get_criterion(cfg.MODEL.LOSS_TYPE)
    sem_criterion = losses.get_criterion(cfg.MODEL.LOSS_TYPE)
    layout = stack_layout(cfg)
    bn_groups = bn_group_count(cfg, mesh)

    def grads_of(state: TrainState, stack, is_labeled, rng):
        del is_labeled
        aug_rng, drop_rng = jax.random.split(jax.random.fold_in(rng, state.step))
        stack_aug = _augment(stack, aug_rng, cfg, layout)
        x_t1, x_t2, y_change, y_sem_t1, y_sem_t2 = split_stack(stack_aug, layout)

        def loss_fn(params):
            (logits_change, logits_sem_t1, logits_sem_t2), new_stats = \
                _apply_train(model, params, state.batch_stats, x_t1, x_t2,
                             drop_rng, bn_groups)
            change_loss = change_criterion(logits_change, y_change)
            sem_t1_loss = sem_criterion(logits_sem_t1, y_sem_t1)
            sem_t2_loss = sem_criterion(logits_sem_t2, y_sem_t2)
            sem_loss = (sem_t1_loss + sem_t2_loss) / 2.0
            loss = (change_loss + sem_loss) / 2.0
            return loss, (new_stats, {"loss": loss, "change_loss": change_loss,
                                      "sem_loss": sem_loss})

        (_, (new_stats, aux)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return grads, new_stats, aux

    step = _grad_apply_step(grads_of, cfg, mesh, bn_groups)
    return _jit_step(step, mesh) if jit else step


def make_train_step(model, cfg, regime: str, mesh=None, jit: bool = True) -> Callable:
    if regime == "supervised":
        return make_supervised_train_step(model, cfg, mesh, jit)
    if regime == "semisupervised":
        return make_semisupervised_train_step(model, cfg, mesh, jit)
    if regime == "dualtask":
        return make_dualtask_train_step(model, cfg, mesh, jit)
    raise ValueError(f"unknown training regime {regime!r}")


def make_scanned_train_step(model, cfg, regime: str, mesh=None,
                            unroll: int = 1) -> Callable:
    """K optimizer steps fused into ONE jitted dispatch via ``lax.scan``.

    Takes ``(state, stacks, is_labeled, rng)`` where ``stacks`` is
    (K, B, C, S, S) — K independent batches — and ``is_labeled`` is (K, B);
    runs K full steps (each with its own augmentation randomness, since the
    per-step fold_in uses the incrementing ``state.step``) and returns
    ``(state, metrics)`` with metrics averaged over the window.

    This amortizes host->device dispatch across K steps: the trainer's
    log-window arithmetic is unchanged because it already averages metrics
    between log points. Batches are sharded over the mesh on axis 1.
    ``unroll`` is forwarded to ``lax.scan`` (XLA can elide loop-carry
    staging copies across unrolled iterations, at higher compile cost).
    """
    # The unjitted body still needs the REAL mesh: bn_group_count reads it
    # for the per-replica BN mode (MODEL.SYNC_BN: False must mean the same
    # thing whether or not the execution plan scan-fuses).
    body = make_train_step(model, cfg, regime, mesh=mesh, jit=False)

    def multi_step(state, stacks, is_labeled, rng):
        def f(s, xs):
            stack, lab = xs
            return body(s, stack, lab, rng)

        state, metrics = jax.lax.scan(f, state, (stacks, is_labeled),
                                      unroll=unroll)
        # Semi-supervised window reduction mirrors the per-step trainer
        # protocol (see _reduce_window_metrics): presence-masked component
        # means, summed counts; everything else is a plain window mean.
        return state, _reduce_window_metrics(metrics)

    return _jit_step(multi_step, mesh, batch_ndim=2)


# --------------------------------------------------------------------------
# Eval forward
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("model",))
def eval_forward(model, params, batch_stats, x_t1, x_t2):
    """Jitted eval-mode forward returning change probabilities (first head
    for multi-head models, matching net.eval() usage in evaluation.py:22)."""
    out = model.apply({"params": params, "batch_stats": batch_stats},
                      x_t1, x_t2, train=False)
    if isinstance(out, tuple):
        out = out[0]
    return jax.nn.sigmoid(out)
