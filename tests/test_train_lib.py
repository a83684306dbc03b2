"""Training-core tests: loss decreases per regime, semi-supervised mask
fallback semantics, data-parallel mesh numerics vs single device,
checkpoint roundtrip, evaluation protocol on the synthetic fixture."""

import os

import jax
import numpy as np
import pytest

from multimodal_siamese_cd_tpu import checkpoints, evaluation, train_lib
from multimodal_siamese_cd_tpu.config import load_cfg
from multimodal_siamese_cd_tpu.data.dataset import MultimodalCDDataset
from multimodal_siamese_cd_tpu.data.loader import TrainLoader
from multimodal_siamese_cd_tpu.data.synthetic import fixture_cfg_overrides
from multimodal_siamese_cd_tpu.parallel import batch_sharding, data_mesh


@pytest.fixture()
def cfg(fixture_dataset, tmp_path):
    c = load_cfg("debug")
    c.merge_from_list(fixture_cfg_overrides())
    c.MODEL.TOPOLOGY = [4, 8]
    c.TRAINER.BATCH_SIZE = 4
    c.TRAINER.PRECISION = "fp32"
    c.TRAINER.LR = 1e-3
    c.PATHS.OUTPUT = str(tmp_path)
    c.PATHS.DATASET = str(fixture_dataset)
    os.makedirs(tmp_path, exist_ok=True)
    return c


def make_batch(cfg, regime="supervised", include_unlabeled=False, seed=0):
    if include_unlabeled:
        cfg.DATALOADER.INCLUDE_UNLABELED = True
    ds = MultimodalCDDataset(cfg, "training", return_stack=True, crop_only=True)
    loader = TrainLoader(ds, cfg.TRAINER.BATCH_SIZE, num_workers=0, seed=seed,
                         drop_last=False, shuffle=True)
    return next(iter(loader))


def run_steps(cfg, regime, n_steps=6, mesh=None):
    model, state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    step_fn = train_lib.make_train_step(model, cfg, regime, mesh=mesh)
    rng = jax.random.PRNGKey(cfg.SEED)
    batch = make_batch(cfg, regime,
                       include_unlabeled=(regime == "semisupervised"))
    lo = []
    for _ in range(n_steps):
        state, m = step_fn(state, batch["stack"], batch["is_labeled"], rng)
        lo.append(float(m["loss"]))
    return state, lo, m


def test_supervised_loss_decreases(cfg):
    cfg.MODEL.TYPE = "siameseunet"
    _, lo, _ = run_steps(cfg, "supervised", n_steps=8)
    assert all(np.isfinite(lo))
    assert lo[-1] < lo[0]


def test_dualtask_loss_decreases(cfg):
    cfg.MODEL.TYPE = "dtsiameseunet"
    cfg.DATALOADER.INCLUDE_BUILDING_LABELS = True
    _, lo, m = run_steps(cfg, "dualtask", n_steps=8)
    assert lo[-1] < lo[0]
    assert "change_loss" in m and "sem_loss" in m


def test_semisupervised_mixed_batch(cfg):
    cfg.MODEL.TYPE = "whatevernet"
    cfg.CONSISTENCY_TRAINER.LOSS_FACTOR = 0.5
    _, lo, m = run_steps(cfg, "semisupervised", n_steps=8)
    assert lo[-1] < lo[0]
    assert float(m["n_labeled"]) + float(m["n_notlabeled"]) == cfg.TRAINER.BATCH_SIZE


def test_semisupervised_fallback_all_labeled(cfg):
    """All-labeled batch: total loss must equal the supervised term alone
    (reference train_semisupervised.py:108-113)."""
    cfg.MODEL.TYPE = "whatevernet"
    cfg.CONSISTENCY_TRAINER.LOSS_FACTOR = 0.5
    model, state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    step_fn = train_lib.make_train_step(model, cfg, "semisupervised")
    batch = make_batch(cfg)
    all_lab = np.ones_like(batch["is_labeled"])
    _, m = step_fn(state, batch["stack"], all_lab, jax.random.PRNGKey(1))
    assert float(m["cons_loss"]) == 0.0
    assert float(m["loss"]) == pytest.approx(float(m["sup_loss"]), rel=1e-6)

    model, state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    no_lab = np.zeros_like(batch["is_labeled"])
    _, m2 = step_fn(state, batch["stack"], no_lab, jax.random.PRNGKey(1))
    assert float(m2["sup_loss"]) == 0.0
    assert float(m2["loss"]) == pytest.approx(float(m2["cons_loss"]), rel=1e-6)


@pytest.mark.parametrize("regime,model_type",
                         [("supervised", "siameseunet"),
                          ("dualtask", "dtsiameseunet"),
                          ("semisupervised", "whatevernet")])
def test_production_defaults_step(cfg, regime, model_type):
    """Every regime's train step at the PRODUCTION factory defaults —
    bf16 precision + PACKED_FULLRES — must trace and produce finite,
    decreasing loss.

    Regression class: the suite's trainer tests run fp32 for tight numeric
    bars, so a bf16-only trace failure (e.g. the packed pair-conv
    preferred_element_type transpose, jax 0.9) passed the entire suite AND
    the fp32 multichip dryrun while every real bench/training run crashed.
    This is the smoke layer for dtype-dependent trace regressions."""
    cfg.MODEL.TYPE = model_type
    cfg.TRAINER.PRECISION = "bf16"
    cfg.MODEL.PACKED_FULLRES = True
    if regime == "dualtask":
        cfg.DATALOADER.INCLUDE_BUILDING_LABELS = True
    if regime == "semisupervised":
        cfg.CONSISTENCY_TRAINER.LOSS_FACTOR = 0.5
    _, lo, _ = run_steps(cfg, regime, n_steps=8)
    assert all(np.isfinite(lo)), lo
    assert lo[-1] < lo[0], lo


def test_mesh_step_matches_single_device(cfg):
    """8-way data-parallel step must match the single-device step bitwise-ish
    (same global batch, replicated params, psum'd grads)."""
    cfg.MODEL.TYPE = "siameseunet"
    cfg.TRAINER.BATCH_SIZE = 8
    cfg.DATALOADER.TRAINING_MULTIPLIER = 4  # 2 fixture AOIs -> 8 samples
    batch = make_batch(cfg)

    model, state1 = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    step1 = train_lib.make_train_step(model, cfg, "supervised", mesh=None)
    rng = jax.random.PRNGKey(3)
    state1, m1 = step1(state1, batch["stack"], batch["is_labeled"], rng)

    mesh = data_mesh()
    assert mesh.size == 8  # conftest forces 8 virtual CPU devices
    _, state8 = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    step8 = train_lib.make_train_step(model, cfg, "supervised", mesh=mesh)
    stack8 = jax.device_put(batch["stack"], batch_sharding(mesh))
    state8, m8 = step8(state8, stack8, batch["is_labeled"], rng)

    assert float(m1["loss"]) == pytest.approx(float(m8["loss"]), rel=1e-5)
    # Bitwise post-Adam param equality doesn't hold: conv biases feeding
    # BatchNorm have ~zero true gradient, so Adam normalizes reduction-order
    # noise into lr-sized sign-arbitrary updates there. The data-parallel
    # correctness statement is that the GRADIENTS agree to reduction
    # tolerance: the GSPMD all-reduce must reproduce single-device sums.
    from multimodal_siamese_cd_tpu import losses
    from multimodal_siamese_cd_tpu.parallel import replicated_sharding

    layout = train_lib.stack_layout(cfg)
    x_t1, x_t2, y_change, _, _ = train_lib.split_stack(
        train_lib.wire_to_nhwc(batch["stack"]), layout)
    _, state0 = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    criterion = losses.get_criterion(cfg.MODEL.LOSS_TYPE)

    def loss_fn(params, a, b, y):
        logits, _ = model.apply(
            {"params": params, "batch_stats": state0.batch_stats},
            a, b, train=True, mutable=["batch_stats"])
        return criterion(logits, y)

    g1 = jax.jit(jax.grad(loss_fn))(state0.params, x_t1, x_t2, y_change)
    bsh = batch_sharding(mesh)
    rep = replicated_sharding(mesh)
    g8 = jax.jit(jax.grad(loss_fn),
                 in_shardings=(rep, bsh, bsh, bsh),
                 out_shardings=rep)(
        state0.params,
        jax.device_put(x_t1, bsh), jax.device_put(x_t2, bsh),
        jax.device_put(y_change, bsh))
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_data_space_mesh_step_matches_single_device(cfg):
    """2-D (data, space) mesh — batch over 'data', crop HEIGHT over 'space'
    (GSPMD conv halo exchange + cross-space BN reductions) — must reproduce
    the single-device step to reduction-order tolerance."""
    from multimodal_siamese_cd_tpu.parallel import data_space_mesh, wire_sharding

    cfg.MODEL.TYPE = "siameseunet"
    cfg.TRAINER.BATCH_SIZE = 4
    batch = make_batch(cfg)

    model, state1 = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    step1 = train_lib.make_train_step(model, cfg, "supervised", mesh=None)
    rng = jax.random.PRNGKey(3)
    state1, m1 = step1(state1, batch["stack"], batch["is_labeled"], rng)

    mesh = data_space_mesh(4)  # 8 virtual devices -> (data 2, space 4)
    assert mesh.shape == {"data": 2, "space": 4}
    assert batch["stack"].shape[2] % 4 == 0  # 32px crop heights over space
    _, state2 = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    step2 = train_lib.make_train_step(model, cfg, "supervised", mesh=mesh)
    stack = jax.device_put(batch["stack"], wire_sharding(mesh))
    state2, m2 = step2(state2, stack, batch["is_labeled"], rng)

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(state1.batch_stats),
                    jax.tree_util.tree_leaves(state2.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_spatial_shards_trainer_end_to_end(cfg):
    """TRAINER.SPATIAL_SHARDS drives a full DEBUG training run on the 2-D
    mesh through the shipped trainer (loader -> dict-sharded prefetch ->
    height-sharded step -> eval)."""
    from multimodal_siamese_cd_tpu import trainers, wandb_compat

    cfg.MODEL.TYPE = "siameseunet"
    cfg.TRAINER.BATCH_SIZE = 4
    cfg.TRAINER.SPATIAL_SHARDS = 4
    mesh = trainers._training_mesh(cfg)
    assert mesh.axis_names == ("data", "space")
    wandb_compat.init(cfg.NAME, mode="disabled", out_dir=cfg.PATHS.OUTPUT)
    try:
        trainers.run_supervised(cfg)
    finally:
        wandb_compat.finish()


def test_spatial_shards_incompatible_falls_back(cfg, capsys):
    from multimodal_siamese_cd_tpu import trainers

    cfg.TRAINER.SPATIAL_SHARDS = 3  # 8 devices % 3 != 0 via crop 32 % 3 != 0
    mesh = trainers._training_mesh(cfg)
    assert mesh.axis_names == ("data",)


@pytest.mark.parametrize("regime,model_type", [
    ("supervised", "siameseunet"),
    ("dualtask", "dtsiameseunet"),
    ("semisupervised", "whatevernet"),
])
def test_remat_step_matches_plain(cfg, regime, model_type):
    """MODEL.REMAT (jax.checkpoint on every stem/Down/Up stage) must be
    numerically transparent: identical param tree and init, same step loss,
    and train-mode forward gradients equal to the plain graph (remat
    recomputes the identical ops; grads match to fp tolerance — post-Adam
    PARAM comparison would be meaningless here for the same reason as the
    mesh test above: BN-fed conv biases have ~zero true gradient, and Adam
    normalizes compile-order noise there into lr-sized updates)."""
    from multimodal_siamese_cd_tpu import losses

    cfg.MODEL.TYPE = model_type
    if regime == "semisupervised":
        cfg.DATALOADER.INCLUDE_UNLABELED = True
    batch = make_batch(cfg, regime,
                       include_unlabeled=(regime == "semisupervised"))
    rng = jax.random.PRNGKey(3)
    criterion = losses.get_criterion(cfg.MODEL.LOSS_TYPE)
    layout = train_lib.stack_layout(cfg)
    x_t1, x_t2, y_change, _, _ = train_lib.split_stack(
        train_lib.wire_to_nhwc(batch["stack"]), layout)

    results = []
    for remat in (False, True):
        cfg.MODEL.REMAT = remat
        model, state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
        params, batch_stats = state.params, state.batch_stats

        def loss_fn(p):
            out, _ = train_lib._apply_train(model, p, batch_stats,
                                            x_t1, x_t2, jax.random.PRNGKey(1))
            logits = out[0] if isinstance(out, tuple) else out
            return criterion(logits, y_change)

        grads = jax.jit(jax.grad(loss_fn))(params)
        params_np = jax.tree_util.tree_map(np.asarray, params)
        step = train_lib.make_train_step(model, cfg, regime, mesh=None)
        _, m = step(state, batch["stack"], batch["is_labeled"], rng)  # donates
        results.append((float(m["loss"]), params_np, grads))
    (l0, p0, g0), (l1, p1, g1) = results
    assert l0 == pytest.approx(l1, rel=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    leaves0 = jax.tree_util.tree_leaves(g0)
    leaves1 = jax.tree_util.tree_leaves(g1)
    assert len(leaves0) == len(leaves1)  # identical tree through remat
    for a, b in zip(leaves0, leaves1):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-4, atol=1e-7)


def test_grad_accum_matches_duplicated_microbatch(cfg):
    """TRAINER.GRAD_ACCUM=2 on a batch made of two identical halves must
    produce the same parameter update as the plain step on one half:
    micro-batch gradients are equal, so their average is too (augmentation
    disabled — the accum path deliberately draws distinct augmentation
    randomness per micro-batch)."""
    cfg.MODEL.TYPE = "siameseunet"
    for k in ("RANDOM_FLIP", "RANDOM_ROTATE", "COLOR_SHIFT",
              "GAMMA_CORRECTION"):
        setattr(cfg.AUGMENTATION, k, False)
    cfg.TRAINER.BATCH_SIZE = 2
    batch = make_batch(cfg)
    half_stack, half_lab = batch["stack"], batch["is_labeled"]
    full_stack = np.concatenate([half_stack, half_stack])
    full_lab = np.concatenate([half_lab, half_lab])
    rng = jax.random.PRNGKey(3)

    model, s_plain = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    step_plain = train_lib.make_train_step(model, cfg, "supervised")
    s_plain, m_plain = step_plain(s_plain, half_stack, half_lab, rng)

    cfg.TRAINER.GRAD_ACCUM = 2
    _, s_acc = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    step_acc = train_lib.make_train_step(model, cfg, "supervised")
    s_acc, m_acc = step_acc(s_acc, full_stack, full_lab, rng)

    assert float(m_plain["loss"]) == pytest.approx(float(m_acc["loss"]),
                                                   rel=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s_plain.params),
                    jax.tree_util.tree_leaves(s_acc.params)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-4, atol=1e-6)


def test_grad_accum_semisup_metrics_and_training(cfg):
    """Accumulated semi-supervised steps keep the window metric protocol
    (presence-masked component means, summed counts) and still train."""
    cfg.MODEL.TYPE = "whatevernet"
    cfg.DATALOADER.INCLUDE_UNLABELED = True
    cfg.TRAINER.BATCH_SIZE = 4
    cfg.TRAINER.GRAD_ACCUM = 2
    state, lo, m = run_steps(cfg, "semisupervised", n_steps=6)
    assert all(np.isfinite(lo))
    assert lo[-1] < lo[0]
    assert float(m["n_labeled"]) + float(m["n_notlabeled"]) == 4  # summed


def test_grad_accum_composes_with_scanned_step(cfg):
    """GRAD_ACCUM under the K>1 scan-fused step (scan-in-scan): with
    augmentation off, scanned K=2 + GRAD_ACCUM=2 on duplicated micro-batch
    halves must match the plain scanned K=2 step on the halves — same
    window loss, same parameters."""
    cfg.MODEL.TYPE = "siameseunet"
    for k in ("RANDOM_FLIP", "RANDOM_ROTATE", "COLOR_SHIFT",
              "GAMMA_CORRECTION"):
        setattr(cfg.AUGMENTATION, k, False)
    cfg.TRAINER.BATCH_SIZE = 2
    K = 2
    halves = [make_batch(cfg, seed=s) for s in (0, 1)]
    stacks = np.stack([b["stack"] for b in halves])            # (K, B, ...)
    labs = np.stack([b["is_labeled"] for b in halves])
    rng = jax.random.PRNGKey(3)

    model, s_plain = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    step_plain = train_lib.make_scanned_train_step(model, cfg, "supervised")
    s_plain, m_plain = step_plain(s_plain, stacks, labs, rng)

    cfg.TRAINER.GRAD_ACCUM = 2
    _, s_acc = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    step_acc = train_lib.make_scanned_train_step(model, cfg, "supervised")
    s_acc, m_acc = step_acc(s_acc, np.concatenate([stacks, stacks], axis=1),
                            np.concatenate([labs, labs], axis=1), rng)

    assert float(m_plain["loss"]) == pytest.approx(float(m_acc["loss"]),
                                                   rel=1e-6)
    assert int(s_acc.step) == int(s_plain.step) == K  # one update per window step
    for a, b in zip(jax.tree_util.tree_leaves(s_plain.params),
                    jax.tree_util.tree_leaves(s_acc.params)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-4, atol=1e-6)


def test_mesh_step_collective_structure(cfg):
    """Sharding-hygiene guard on the compiled 1-D data-parallel step: the
    ONLY collective GSPMD may insert is all-reduce (gradient sums + sync-BN
    batch stats), and nothing activation-sized may ride one. An accidental
    replication or resharding of a batch-sharded activation shows up as an
    all-gather / all-to-all / collective-permute, or as an all-reduce whose
    operand carries the global batch — either fails here long before it
    would be measurable on real chips."""
    import re

    cfg.MODEL.TYPE = "siameseunet"
    cfg.TRAINER.BATCH_SIZE = 8
    cfg.DATALOADER.TRAINING_MULTIPLIER = 4
    batch = make_batch(cfg)
    mesh = data_mesh()
    model, state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    step = train_lib.make_train_step(model, cfg, "supervised", mesh=mesh)
    stack = jax.device_put(batch["stack"], batch_sharding(mesh))
    txt = step.lower(state, stack, batch["is_labeled"],
                     jax.random.PRNGKey(3)).compile().as_text()

    for op in ("all-gather", "all-to-all", "collective-permute",
               "reduce-scatter"):
        assert f" {op}(" not in txt, f"unexpected {op} in data-parallel step"

    ar_lines = [l for l in txt.splitlines() if " all-reduce(" in l]
    assert ar_lines, "expected gradient/BN all-reduces on the 8-device mesh"
    # Largest legal all-reduce payload: the biggest parameter leaf. The
    # smallest activation-shaped tensor per shard is batch/8 x 32^2 x
    # channels — orders above it.
    max_param = max(int(np.prod(np.asarray(a.shape)))
                    for a in jax.tree_util.tree_leaves(state.params))
    for line in ar_lines:
        shapes = re.findall(r"f32\[([\d,]*)\]", line.split("all-reduce(")[0])
        for s in shapes:
            n = int(np.prod([int(d) for d in s.split(",")])) if s else 1
            assert n <= max_param, (
                f"activation-sized all-reduce ({n} elements): {line[:120]}")


def test_grad_accum_must_divide_batch(cfg):
    cfg.MODEL.TYPE = "siameseunet"
    cfg.TRAINER.BATCH_SIZE = 4
    cfg.TRAINER.GRAD_ACCUM = 3
    batch = make_batch(cfg)
    model, state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    step = train_lib.make_train_step(model, cfg, "supervised")
    with pytest.raises(ValueError, match="GRAD_ACCUM"):
        step(state, batch["stack"], batch["is_labeled"], jax.random.PRNGKey(3))


def test_grad_accum_microbatch_must_split_over_mesh(cfg):
    """A micro-batch smaller than the data-mesh axis must be rejected:
    GSPMD would otherwise silently all-gather (replicate) the batch —
    the exact activation blow-up GRAD_ACCUM exists to prevent."""
    cfg.MODEL.TYPE = "siameseunet"
    cfg.TRAINER.BATCH_SIZE = 16
    cfg.DATALOADER.TRAINING_MULTIPLIER = 8
    cfg.TRAINER.GRAD_ACCUM = 4          # micro-batch 4 < 8 mesh devices
    batch = make_batch(cfg)
    mesh = data_mesh()
    model, state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    step = train_lib.make_train_step(model, cfg, "supervised", mesh=mesh)
    stack = jax.device_put(batch["stack"], batch_sharding(mesh))
    with pytest.raises(ValueError, match="all-gather"):
        step(state, stack, batch["is_labeled"], jax.random.PRNGKey(3))


def test_grad_accum_microbatch_must_split_over_bn_groups(cfg):
    """MODEL.SYNC_BN: False passes bn_group_count's whole-batch check, but
    the micro-batch is what the per-replica BN vmap sees — a clear error
    must replace the former opaque trace-time reshape failure."""
    cfg.MODEL.TYPE = "siameseunet"
    cfg.MODEL.SYNC_BN = False
    cfg.TRAINER.BATCH_SIZE = 16
    cfg.DATALOADER.TRAINING_MULTIPLIER = 8
    cfg.TRAINER.GRAD_ACCUM = 4          # micro-batch 4; mesh check fires
    batch = make_batch(cfg)
    mesh = data_mesh()
    model, state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    step = train_lib.make_train_step(model, cfg, "supervised", mesh=mesh)
    stack = jax.device_put(batch["stack"], batch_sharding(mesh))
    with pytest.raises(ValueError, match="all-gather|BN"):
        step(state, stack, batch["is_labeled"], jax.random.PRNGKey(3))


def test_checkpoint_roundtrip(cfg):
    cfg.MODEL.TYPE = "siameseunet"
    # roundtrip a TRAINED state so nonzero Adam moments must survive
    state, _, _ = run_steps(cfg, "supervised", n_steps=2)
    f = checkpoints.save_checkpoint(state, epoch=100, step=42, cfg=cfg)
    assert f.name == f"{cfg.NAME}_checkpoint100.pt"
    model2, state2, step = checkpoints.load_checkpoint(100, cfg)
    assert step == 42
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state restored too
    for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                    jax.tree_util.tree_leaves(state2.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_corrupt_file_raises_named_valueerror(cfg):
    """Garbage or truncated checkpoint bytes must raise a ValueError that
    NAMES the file — msgpack's raw 'ExtraData'/'incomplete input' say
    neither which file nor that a checkpoint is involved. A missing file
    keeps its FileNotFoundError."""
    cfg.MODEL.TYPE = "siameseunet"
    model, state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    f = checkpoints.save_checkpoint(state, epoch=7, step=1, cfg=cfg)
    good = f.read_bytes()
    for bad in (b"not a checkpoint" * 8, good[:len(good) // 2]):
        f.write_bytes(bad)
        with pytest.raises(ValueError, match="checkpoint .*_checkpoint7.pt"):
            checkpoints.load_checkpoint(7, cfg)
    f.unlink()
    with pytest.raises(FileNotFoundError):
        checkpoints.load_checkpoint(7, cfg)


def test_checkpoint_inference_checkpoint_key(cfg):
    cfg.MODEL.TYPE = "siameseunet"
    _, state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    checkpoints.save_checkpoint(state, epoch=cfg.INFERENCE_CHECKPOINT,
                                step=1, cfg=cfg)
    model, state2, _ = checkpoints.load_checkpoint(cfg.INFERENCE_CHECKPOINT, cfg)
    assert state2 is not None


def test_model_evaluation_and_inference_loop(cfg, tmp_path):
    from multimodal_siamese_cd_tpu import wandb_compat

    cfg.MODEL.TYPE = "siameseunet"
    model, state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    wandb_compat.init(cfg.NAME, config=cfg, mode="jsonl", out_dir=tmp_path)
    f1 = evaluation.model_evaluation(model, state, cfg, "validation",
                                     epoch=0.0, step=0)
    wandb_compat.finish()
    assert 0.0 <= f1 <= 1.0
    log_file = tmp_path / "logs" / f"{cfg.NAME}.jsonl"
    assert log_file.exists()
    lines = [l for l in log_file.read_text().splitlines() if "validation F1" in l]
    assert lines

    ds = MultimodalCDDataset(cfg, "test", no_augmentations=True,
                             dataset_mode="first_last", disable_multiplier=True,
                             disable_unlabeled=True)
    data = evaluation.inference_loop(model, state, ds)
    f1, precision, recall = data["change"]
    assert 0.0 <= f1 <= 1.0


def test_pad_to_bucket_and_valid_mask():
    arr = np.ones((70, 90, 2), np.float32)
    padded, valid = evaluation.pad_to_bucket(arr, bucket=64)
    assert padded.shape == (128, 128, 2)
    assert valid.sum() == 70 * 90
    np.testing.assert_array_equal(padded[:70, :90], arr)
    assert padded[70:].sum() == 0


def test_eval_padding_does_not_change_metrics(cfg):
    """Scene metrics must be identical whether computed on the raw scene or
    on the padded+masked one."""
    cfg.MODEL.TYPE = "siameseunet"
    model, state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    ds = MultimodalCDDataset(cfg, "validation", no_augmentations=True,
                             dataset_mode="first_last", disable_multiplier=True,
                             disable_unlabeled=True)
    item = ds[0]
    probs = evaluation.scene_probabilities(model, state, item)
    assert probs.shape == item["y_change"].shape[:2]
    from multimodal_siamese_cd_tpu.metrics import MultiThresholdMetric

    direct = MultiThresholdMetric([0.5])
    direct.add_sample(item["y_change"][..., 0], probs)
    padded = evaluation.run_measurer(model, state, [item], np.array([0.5]))
    assert float(direct.TP[0]) == float(padded.TP[0])
    assert float(direct.FP[0]) == float(padded.FP[0])
    assert float(direct.FN[0]) == float(padded.FN[0])
    assert float(direct.TN[0]) == float(padded.TN[0])


def test_sharded_scene_inference_matches_single_device(cfg):
    """Height-sharded full-scene eval over the 8-device mesh must reproduce
    single-device probabilities (GSPMD conv halo exchange)."""
    cfg.MODEL.TYPE = "siameseunet"
    model, state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    ds = MultimodalCDDataset(cfg, "validation", no_augmentations=True,
                             dataset_mode="first_last", disable_multiplier=True,
                             disable_unlabeled=True)
    item = ds[0]
    single = evaluation.scene_probabilities(model, state, item)
    mesh = data_mesh()
    sharded = evaluation.sharded_scene_probabilities(model, state, item, mesh)
    np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-6)
    # non-power-of-two mesh: the 64-padded height is not divisible by 3, so
    # the lcm(64, 3) height-only re-pad path runs; results must still match
    # the single-device forward on the valid region
    mesh3 = data_mesh(jax.devices()[:3])
    sharded3 = evaluation.sharded_scene_probabilities(model, state, item,
                                                      mesh3)
    np.testing.assert_allclose(sharded3, single, rtol=1e-5, atol=1e-6)


def test_batched_eval_matches_per_scene(cfg):
    """Scene-batched measurer must produce identical counts to per-scene
    dispatch (the reference's batch-1 protocol)."""
    cfg.MODEL.TYPE = "siameseunet"
    model, state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    ds = MultimodalCDDataset(cfg, "training", no_augmentations=True,
                             dataset_mode="first_last", disable_multiplier=True,
                             disable_unlabeled=True)
    items = list(ds)
    batched = evaluation.run_measurer(model, state, items, np.array([0.5]),
                                      batch_scenes=True)
    single = evaluation.run_measurer(model, state, items, np.array([0.5]),
                                     batch_scenes=False)
    for a, b in [(batched.TP, single.TP), (batched.TN, single.TN),
                 (batched.FP, single.FP), (batched.FN, single.FN)]:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1.0)


def test_auto_steps_per_execution_divisor_logic():
    """STEPS_PER_EXECUTION='auto' picks the largest k <= 20 dividing both
    LOG_FREQ and steps/epoch when dispatch latency is material, else 1."""
    from multimodal_siamese_cd_tpu.trainers import auto_steps_per_execution

    # fast local backend -> no fusion
    assert auto_steps_per_execution(100, 4000, dispatch_ms=0.01) == 1
    # remote-attached backend (~2.7 ms on the tunneled TPU): the saturation
    # probe (BASELINE.md) put the knee at K=20, the new max_k
    assert auto_steps_per_execution(100, 4000, dispatch_ms=2.7) == 20
    assert auto_steps_per_execution(100, 4875, dispatch_ms=2.7) == 5
    assert auto_steps_per_execution(12, 4000, dispatch_ms=2.7) == 4
    # coprime cadences can only fuse k=1
    assert auto_steps_per_execution(7, 9, dispatch_ms=2.7) == 1
    # exactly at the threshold counts as cheap dispatch
    assert auto_steps_per_execution(100, 4000, dispatch_ms=0.5) == 1


def test_measure_dispatch_latency_probe():
    from multimodal_siamese_cd_tpu.trainers import measure_dispatch_latency_ms

    ms = measure_dispatch_latency_ms()
    assert ms >= 0.0
    # the virtual CPU backend dispatches locally; anything near the remote
    # threshold would mean the probe is broken
    assert ms < 0.5


def test_wired_eval_path_matches_item_path(cfg):
    """The fused wire path (planar f16 wires + on-device confusion,
    evaluation._measure_wired) must reproduce the float32 item path's
    confusion counts EXACTLY — the wires carry the same real values
    (f16-exact cache storage) and the same confusion math runs on the same
    probabilities."""
    cfg.MODEL.TYPE = "siameseunet"
    model, state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    ds = MultimodalCDDataset(cfg, "validation", no_augmentations=True,
                             dataset_mode="first_last", disable_multiplier=True,
                             disable_unlabeled=True)
    assert ds.eval_wire(0) is not None and ds.cache.enabled  # fast path armed
    wired = evaluation.run_measurer(model, state, ds, np.array([0.5]))
    items = [ds[i] for i in range(len(ds))]  # lists take the item path
    ref = evaluation.run_measurer(model, state, items, np.array([0.5]))
    for k in ("TP", "TN", "FP", "FN"):
        a = np.asarray(getattr(wired, k), np.float64)
        b = np.asarray(getattr(ref, k), np.float64)
        np.testing.assert_array_equal(a, b, err_msg=k)


def test_wired_eval_multihead_and_pad_exact_modes(cfg):
    """Fused path works for multi-head models (first-head selection) and
    under EVAL_PAD_MULTIPLE: 1 (exact shapes, one compile per shape)."""
    cfg.MODEL.TYPE = "dtsiameseunet"
    model, state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    ds = MultimodalCDDataset(cfg, "validation", no_augmentations=True,
                             dataset_mode="first_last", disable_multiplier=True,
                             disable_unlabeled=True)
    items = [ds[i] for i in range(len(ds))]
    for bucket in (64, 1):
        wired = evaluation.run_measurer(model, state, ds, np.array([0.5]),
                                        bucket=bucket)
        ref = evaluation.run_measurer(model, state, items, np.array([0.5]),
                                      bucket=bucket)
        for k in ("TP", "TN", "FP", "FN"):
            np.testing.assert_array_equal(
                np.asarray(getattr(wired, k), np.float64),
                np.asarray(getattr(ref, k), np.float64), err_msg=f"{k}@{bucket}")


def test_replicated_jit_is_cached_per_fn_and_mesh():
    """Two eval passes on the same mesh must reuse ONE jit object (and
    hence one XLA executable cache): without the cache every mesh eval
    pass re-jitted the fused eval forward from scratch — a multi-minute
    recompile per eval on the real TPU."""
    from multimodal_siamese_cd_tpu.parallel import data_mesh

    f = evaluation._eval_wire_counts_jit.__wrapped__
    m1 = data_mesh(jax.devices()[:4])
    m2 = data_mesh(jax.devices()[:4])
    assert evaluation._replicated_jit(f, m1) is evaluation._replicated_jit(f, m2)
    m8 = data_mesh(jax.devices()[:8])
    assert evaluation._replicated_jit(f, m8) is not evaluation._replicated_jit(f, m1)


def test_wired_eval_mesh_sharded_matches_single_device(cfg):
    """Fused eval with the group batch axis sharded over the 8-device
    virtual mesh (including zero-valid padding up to a mesh multiple — the
    fixture split is smaller than the mesh) must reproduce single-device
    confusion counts."""
    cfg.MODEL.TYPE = "siameseunet"
    model, state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    ds = MultimodalCDDataset(cfg, "validation", no_augmentations=True,
                             dataset_mode="first_last", disable_multiplier=True,
                             disable_unlabeled=True)
    mesh = data_mesh()
    assert mesh.size > 1
    sharded = evaluation.run_measurer(model, state, ds, np.array([0.5]),
                                      mesh=mesh)
    single = evaluation.run_measurer(model, state, ds, np.array([0.5]))
    for k in ("TP", "TN", "FP", "FN"):
        np.testing.assert_allclose(np.asarray(getattr(sharded, k)),
                                   np.asarray(getattr(single, k)),
                                   atol=1.0, err_msg=k)


def test_wired_eval_host_budget_cap_keeps_counts(cfg, monkeypatch):
    """A tight HOST_WIRE_BUDGET_BYTES forces single-wire groups (the host
    cap that bounds pending+stacked bytes on large meshes); confusion
    counts must be unchanged — short groups only mean more dispatches and,
    on a mesh, zero-valid padding."""
    cfg.MODEL.TYPE = "siameseunet"
    model, state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    ds = MultimodalCDDataset(cfg, "validation", no_augmentations=True,
                             dataset_mode="first_last", disable_multiplier=True,
                             disable_unlabeled=True)
    ref = evaluation.run_measurer(model, state, ds, np.array([0.5]))
    monkeypatch.setattr(evaluation, "HOST_WIRE_BUDGET_BYTES", 1)
    capped = evaluation.run_measurer(model, state, ds, np.array([0.5]))
    capped_mesh = evaluation.run_measurer(model, state, ds, np.array([0.5]),
                                          mesh=data_mesh())
    for k in ("TP", "TN", "FP", "FN"):
        np.testing.assert_array_equal(
            np.asarray(getattr(capped, k), np.float64),
            np.asarray(getattr(ref, k), np.float64), err_msg=k)
        np.testing.assert_allclose(
            np.asarray(getattr(capped_mesh, k)),
            np.asarray(getattr(ref, k)), atol=1.0, err_msg=f"{k}@mesh")


def test_dualtask_counts_mesh_sharded_matches_single_device(cfg):
    cfg.MODEL.TYPE = "dtsiameseunet"
    cfg.DATALOADER.INCLUDE_BUILDING_LABELS = True
    model, state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    ds = MultimodalCDDataset(cfg, "validation", no_augmentations=True,
                             dataset_mode="first_last", disable_multiplier=True,
                             disable_unlabeled=True)
    sharded = evaluation.dualtask_quantitative_counts(model, state, ds,
                                                      mesh=data_mesh())
    single = evaluation.dualtask_quantitative_counts(model, state, ds)
    for key in ("change", "change_sem", "sem"):
        np.testing.assert_allclose(np.asarray(sharded[key]),
                                   np.asarray(single[key]),
                                   atol=1.0, err_msg=key)


def test_dualtask_counts_match_pooled_pixel_protocol(cfg):
    """The fused dual-task assessment path (streaming on-device confusion,
    evaluation.dualtask_quantitative_counts) must reproduce the reference's
    pooled-pixel protocol: concatenate every scene's probability rasters,
    threshold strictly at 0.5, sum. Counts may differ by the batched-vs-
    batch-1 forward's LSB wobble only (same tolerance as
    test_batched_eval_matches_per_scene)."""
    from multimodal_siamese_cd_tpu.metrics import (
        false_negatives_from_prob, false_positives_from_prob,
        prob_metrics_from_counts, true_positives_from_prob)

    cfg.MODEL.TYPE = "dtsiameseunet"
    cfg.DATALOADER.INCLUDE_BUILDING_LABELS = True
    model, state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    ds = MultimodalCDDataset(cfg, "validation", no_augmentations=True,
                             dataset_mode="first_last", disable_multiplier=True,
                             disable_unlabeled=True)
    counts = evaluation.dualtask_quantitative_counts(model, state, ds)
    assert counts is not None

    # Reference-shaped pooled protocol (assessment_semantics.py fallback)
    pools = {"change": [], "change_sem": [], "sem": []}
    gts = {"change": [], "sem": []}
    for i in range(len(ds)):
        item = ds[i]
        out = evaluation.dualtask_scene_outputs(model, state, item)
        pools["change"].append(out["change"].ravel())
        pools["change_sem"].append(out["change_sem"].ravel())
        pools["sem"].extend([out["sem_t1"].ravel(), out["sem_t2"].ravel()])
        gts["change"].append(item["y_change"].ravel())
        gts["sem"].extend([item["y_sem_t1"].ravel(), item["y_sem_t2"].ravel()])
    y_change = np.concatenate(gts["change"]) > 0.5
    y_sem = np.concatenate(gts["sem"]) > 0.5
    for key, y in (("change", y_change), ("change_sem", y_change),
                   ("sem", y_sem)):
        prob = np.concatenate(pools[key])
        ref = (true_positives_from_prob(prob, y),
               false_positives_from_prob(prob, y),
               false_negatives_from_prob(prob, y))
        np.testing.assert_allclose(np.asarray(counts[key]),
                                   np.asarray(ref, np.float64),
                                   atol=1.0, err_msg=key)
        # exact-count case: the metric triple matches *_from_prob bit-wise
        if np.array_equal(np.asarray(counts[key]), np.asarray(ref)):
            f1, p, r = prob_metrics_from_counts(*ref)
            sf1, sp, sr = prob_metrics_from_counts(*counts[key])
            assert (f1, p, r) == (sf1, sp, sr)


def test_eval_wire_sem_planes_match_items(cfg):
    """sem=True wires must carry exactly the item path's building rasters."""
    cfg.DATALOADER.INCLUDE_BUILDING_LABELS = True
    ds = MultimodalCDDataset(cfg, "validation", no_augmentations=True,
                             dataset_mode="first_last", disable_multiplier=True,
                             disable_unlabeled=True)
    for i in range(len(ds)):
        w = ds.eval_wire(i, sem=True)
        item = ds[i]
        h, wd = item["x_t1"].shape[:2]
        for wk, ik in (("ysem1", "y_sem_t1"), ("ysem2", "y_sem_t2")):
            np.testing.assert_array_equal(
                w[wk][:h, :wd].astype(np.float32), item[ik][..., 0],
                err_msg=wk)
            assert not w[wk][h:].any() and not w[wk][:, wd:].any()


def test_run_measurer_streams_buckets(cfg, monkeypatch):
    """run_measurer must evaluate each shape bucket as it fills instead of
    materializing every padded scene before the first forward (the round-1
    version held the entire split in RAM)."""
    cfg.MODEL.TYPE = "siameseunet"
    model, state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))

    events = []
    real_forward = evaluation.eval_forward

    def recording_forward(*args, **kwargs):
        events.append("forward")
        return real_forward(*args, **kwargs)

    monkeypatch.setattr(evaluation, "eval_forward", recording_forward)
    # pin group size 8 for these 64^2-padded scenes (the adaptive policy
    # would otherwise allow thousands of tiny scenes per forward)
    monkeypatch.setattr(evaluation, "EVAL_GROUP_BUDGET_PX", 8 * 64 * 64)
    monkeypatch.setattr(evaluation, "EVAL_GROUP_CAP", 8)

    rng = np.random.default_rng(0)
    n = 20

    def items():
        for _ in range(n):
            events.append("yield")
            yield {
                "x_t1": rng.uniform(0, 1, (40, 40, 6)).astype(np.float32),
                "x_t2": rng.uniform(0, 1, (40, 40, 6)).astype(np.float32),
                "y_change": (rng.uniform(size=(40, 40, 1)) > 0.9
                             ).astype(np.float32),
            }

    measurer = evaluation.run_measurer(model, state, items(),
                                       np.array([0.5]))
    # 20 same-shape scenes, group size 8 -> flushes after items 8 and 16,
    # remainder of 4 at the end: forwards interleave with the stream.
    assert events.count("forward") == 3
    first_forward = events.index("forward")
    assert first_forward < len(events) - 1 and events[first_forward - 1] == "yield"
    assert events[:first_forward].count("yield") == 8
    total = (np.asarray(measurer.TP) + np.asarray(measurer.TN)
             + np.asarray(measurer.FP) + np.asarray(measurer.FN))
    # 64-bucket padding is masked out: only the 40x40 real pixels count
    assert float(total.max()) == n * 40 * 40


def test_run_measurer_memory_bounded(cfg, monkeypatch):
    """Host memory while streaming a large split stays bounded by one
    in-flight group per bucket — NOT the whole split (VERDICT round-1
    item 5: the old version held every padded scene, ~2 GB for a 39-AOI
    1024² split). 48 scenes of 512² = ~650 MB materialized; the streaming
    peak measures ~240 MB (one 8-scene group + stacking temporaries) and
    must stay below half the materialized size."""
    import tracemalloc

    cfg.MODEL.TYPE = "siameseunet"
    model, state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))

    def stub_forward(model, params, batch_stats, x1, x2):
        return np.zeros(x1.shape[:3] + (1,), np.float32)  # shape-only stub

    monkeypatch.setattr(evaluation, "eval_forward", stub_forward)
    # pin group size 8 at 512^2 so the bound below stays the one this test
    # was calibrated against (the adaptive policy would pick 16 here)
    monkeypatch.setattr(evaluation, "EVAL_GROUP_BUDGET_PX", 8 * 512 * 512)

    n, s = 48, 512

    def items():
        rng = np.random.default_rng(0)
        for _ in range(n):
            yield {
                "x_t1": rng.uniform(0, 1, (s, s, 6)).astype(np.float32),
                "x_t2": rng.uniform(0, 1, (s, s, 6)).astype(np.float32),
                "y_change": (rng.uniform(size=(s, s, 1)) > 0.9
                             ).astype(np.float32),
            }

    tracemalloc.start()
    tracemalloc.reset_peak()
    measurer = evaluation.run_measurer(model, state, items(),
                                       np.array([0.5]))
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()

    materialize_all = n * (2 * s * s * 6 + s * s) * 4  # ~650 MB
    assert peak < 0.5 * materialize_all, \
        f"peak {peak/1e6:.0f} MB suggests the split was materialized"
    total = (np.asarray(measurer.TP) + np.asarray(measurer.TN)
             + np.asarray(measurer.FP) + np.asarray(measurer.FN))
    assert float(total.max()) == n * s * s


def test_per_replica_bn_grouped_forward(cfg):
    """MODEL.SYNC_BN: False — _apply_train with bn_groups must equal running
    each contiguous batch group through the model independently (DataParallel
    per-replica BN, SURVEY §2.12), retaining group 0's running stats
    (DataParallel keeps only device 0's buffer updates)."""
    cfg.MODEL.TYPE = "siameseunet"
    model, state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(4)
    groups, gb = 4, 2
    x1 = rng.uniform(0, 1, (groups * gb, 16, 16, 6)).astype(np.float32)
    x2 = rng.uniform(0, 1, (groups * gb, 16, 16, 6)).astype(np.float32)
    drop = jax.random.PRNGKey(1)

    out, stats = train_lib._apply_train(
        model, state.params, state.batch_stats, x1, x2, drop,
        bn_groups=groups)

    per_group = []
    for g in range(groups):
        o, s = train_lib._apply_train(
            model, state.params, state.batch_stats,
            x1[g * gb:(g + 1) * gb], x2[g * gb:(g + 1) * gb], drop)
        per_group.append((o, s))
        if g == 0:
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=1e-6), stats, s)
    expected = np.concatenate([np.asarray(o) for o, _ in per_group])
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)
    # and it genuinely differs from sync-BN over the full batch
    sync_out, _ = train_lib._apply_train(
        model, state.params, state.batch_stats, x1, x2, drop)
    assert np.abs(np.asarray(sync_out) - expected).max() > 1e-4


def test_per_replica_bn_step_on_mesh(cfg):
    """The SYNC_BN: False knob must run end-to-end through the jitted,
    mesh-sharded train step for every regime."""
    from multimodal_siamese_cd_tpu.parallel import batch_sharding, data_mesh

    mesh = data_mesh(jax.devices()[:4])
    cfg.MODEL.SYNC_BN = False
    cfg.TRAINER.BATCH_SIZE = 8
    for regime, model_type in [("supervised", "siameseunet"),
                               ("semisupervised", "whatevernet"),
                               ("dualtask", "dtsiameseunet")]:
        cfg.MODEL.TYPE = model_type
        if regime == "dualtask":
            cfg.DATALOADER.INCLUDE_BUILDING_LABELS = True
        model, state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
        step_fn = train_lib.make_train_step(model, cfg, regime, mesh=mesh)
        batch = make_batch(cfg, regime,
                           include_unlabeled=(regime == "semisupervised"))
        # tile the fixture batch up to the full batch size (the tiny fixture
        # split yields fewer samples than BATCH_SIZE)
        reps = -(-cfg.TRAINER.BATCH_SIZE // batch["stack"].shape[0])
        stack = np.tile(batch["stack"], (reps, 1, 1, 1))[:cfg.TRAINER.BATCH_SIZE]
        lab = np.tile(batch["is_labeled"], reps)[:cfg.TRAINER.BATCH_SIZE]
        stack = jax.device_put(stack, batch_sharding(mesh))
        state, m = step_fn(state, stack, lab, jax.random.PRNGKey(3))
        assert np.isfinite(float(m["loss"])), regime


def test_per_replica_bn_step_on_mesh_bf16_packed(cfg):
    """SYNC_BN: False at the PRODUCTION dtype/layout (bf16 + packed).

    Regression: vmapping the packed pair-conv custom VJP batches its
    backward convs with both operands carrying the BN-group axis, and
    GSPMD emitted an invalid feature-grouped conv when that axis was
    sharded (jax 0.9). The custom vmap rule in packed.py folds the group
    axis into the conv batch axis instead; this pins the full production
    combo end-to-end."""
    from multimodal_siamese_cd_tpu.parallel import batch_sharding, data_mesh

    mesh = data_mesh(jax.devices()[:4])
    cfg.MODEL.SYNC_BN = False
    cfg.MODEL.PACKED_FULLRES = True
    cfg.TRAINER.PRECISION = "bf16"
    cfg.TRAINER.BATCH_SIZE = 8
    cfg.MODEL.TYPE = "siameseunet"
    model, state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    step_fn = train_lib.make_train_step(model, cfg, "supervised", mesh=mesh)
    batch = make_batch(cfg, "supervised")
    reps = -(-cfg.TRAINER.BATCH_SIZE // batch["stack"].shape[0])
    stack = np.tile(batch["stack"], (reps, 1, 1, 1))[:cfg.TRAINER.BATCH_SIZE]
    lab = np.tile(batch["is_labeled"], reps)[:cfg.TRAINER.BATCH_SIZE]
    stack = jax.device_put(stack, batch_sharding(mesh))
    state, m = step_fn(state, stack, lab, jax.random.PRNGKey(3))
    assert np.isfinite(float(m["loss"]))


def test_per_replica_bn_survives_scan_fusion(cfg):
    """Regression: make_scanned_train_step used to build its body with
    mesh=None, silently collapsing MODEL.SYNC_BN: False back to sync-BN
    whenever the execution plan scan-fused. A K=1 scanned step must
    produce the same updated batch_stats as the unscanned per-replica
    step."""
    from multimodal_siamese_cd_tpu.parallel import batch_sharding, data_mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = data_mesh(jax.devices()[:4])
    cfg.MODEL.SYNC_BN = False
    cfg.MODEL.TYPE = "siameseunet"
    cfg.TRAINER.BATCH_SIZE = 8
    model, state0 = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))

    rng = np.random.default_rng(11)
    stack = rng.uniform(0, 1, (8, 15, 32, 32)).astype(np.float32)
    stack[:, 12:] = (stack[:, 12:] > 0.8).astype(np.float32)
    lab = np.ones((8,), np.float32)
    key = jax.random.PRNGKey(5)

    plain = train_lib.make_train_step(model, cfg, "supervised", mesh=mesh)
    s1, _ = plain(jax.device_get(state0),
                  jax.device_put(stack, batch_sharding(mesh)), lab, key)

    scanned = train_lib.make_scanned_train_step(model, cfg, "supervised",
                                                mesh=mesh)
    s2, _ = scanned(jax.device_get(state0),
                    jax.device_put(stack[None],
                                   NamedSharding(mesh, P(None, "data"))),
                    lab[None], key)

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-6),
        s1.batch_stats, s2.batch_stats)


def test_bn_group_count_validation(cfg):
    from multimodal_siamese_cd_tpu.parallel import data_mesh

    mesh = data_mesh(jax.devices()[:4])
    assert train_lib.bn_group_count(cfg, None) == 1
    assert train_lib.bn_group_count(cfg, mesh) == 1  # SYNC_BN defaults True
    cfg.MODEL.SYNC_BN = False
    cfg.TRAINER.BATCH_SIZE = 8
    assert train_lib.bn_group_count(cfg, mesh) == 4
    cfg.TRAINER.BATCH_SIZE = 6
    with pytest.raises(ValueError):
        train_lib.bn_group_count(cfg, mesh)


def test_eval_group_limit_policy():
    """Scenes per batched eval forward scale inversely with padded area
    inside the measured 16x1024^2 memory envelope (BASELINE.md): the old
    fixed group of 8 would OOM on 2048^2-class scenes (same bytes as the
    measured-OOM 32x1024^2)."""
    from multimodal_siamese_cd_tpu.evaluation import eval_group_limit

    assert eval_group_limit((1024, 1024)) == 16   # measured: 73.5 scenes/s
    assert eval_group_limit((2048, 2048)) == 4    # old fixed 8 would OOM
    assert eval_group_limit((512, 512)) == 16     # capped by EVAL_GROUP_CAP
    assert eval_group_limit((64, 64)) == 16
    assert eval_group_limit((8192, 8192)) == 1    # never zero
