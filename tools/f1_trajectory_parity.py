#!/usr/bin/env python
"""Full-epoch cross-stack F1-trajectory parity: reference torch vs this repo.

The quality north star (BASELINE.json) — SpaceNet7 change F1 within 0.5 pt
of the reference — cannot be measured here (no dataset, no rasterio). This
tool is the closest buildable proxy: it drives the reference's OWN torch
stack (utils/networks.py SiameseUNet + loss_functions.get_criterion + AdamW,
the train_supervised.py:63-116 semantics) and this repo's shipped train step
from IDENTICAL initialization over an IDENTICAL pre-cropped batch sequence
for a full synthetic epoch, evaluating both every N steps under the
reference evaluation protocol (utils/evaluation.py:7-41: full scenes,
batch 1, sigmoid, threshold 0.5, MultiThresholdMetric max-F1) — the torch
side through the reference's own metrics.MultiThresholdMetric, the JAX side
through this repo's evaluation.run_measurer in exact-shape mode.

Output: a step -> (F1_ref, F1_tpu) table per split and the max |dF1|;
exit 1 if it exceeds --tol (default 0.005 == the 0.5 pt tolerance).

Both stacks consume the same in-memory scene items (from this repo's
dataset in first_last eval mode) so the comparison isolates model + loss +
optimizer + BN-dynamics parity; the host data pipeline has its own parity
tests. Augmentation is disabled so the two stacks see bit-identical inputs;
crops are importance-sampled (20 candidates, weight sum+5 — the reference
augmentations.py:129-142 distribution) by the tool, once, for both.
"""

import argparse
import importlib.util
import json
import sys
import tempfile
import time
import types
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REFERENCE = Path("/root/reference")


def import_reference_module(name: str):
    """Import a /root/reference/utils module with utils.experiment_manager
    stubbed (it needs fvcore, not installed here)."""
    if "utils" not in sys.modules:
        utils_pkg = types.ModuleType("utils")
        em = types.ModuleType("utils.experiment_manager")
        em.CfgNode = type("CfgNode", (), {})
        utils_pkg.experiment_manager = em
        sys.modules["utils"] = utils_pkg
        sys.modules["utils.experiment_manager"] = em
    spec = importlib.util.spec_from_file_location(
        f"ref_{name}", REFERENCE / "utils" / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def reference_f1(torch, ref_metrics, net, items) -> float:
    """The reference eval protocol (utils/evaluation.py:7-41) verbatim,
    over in-memory scene items, on the reference's own measurer. Multi-head
    models contribute their first (change/fusion) head, matching this
    repo's evaluation semantics (train_lib.eval_forward)."""
    net.eval()
    thresholds = torch.linspace(0.5, 1, 1)
    measurer = ref_metrics.MultiThresholdMetric(thresholds)
    with torch.no_grad():
        for item in items:
            x1 = torch.from_numpy(item["x_t1"].transpose(2, 0, 1))[None]
            x2 = torch.from_numpy(item["x_t2"].transpose(2, 0, 1))[None]
            logits = net(x1, x2)
            if isinstance(logits, tuple):
                logits = logits[0]
            y_pred = torch.sigmoid(logits)
            gt = torch.from_numpy(item["y_change"].transpose(2, 0, 1))[None]
            measurer.add_sample(gt, y_pred)
    net.train()
    return float(measurer.compute_f1().max())


def repo_f1(evaluation, model, state, items) -> float:
    """This repo's shipped eval path in exact-shape mode (bucket=1)."""
    measurer = evaluation.run_measurer(model, state, items,
                                       np.asarray([0.5]), bucket=1)
    return float(np.asarray(measurer.compute_f1()).max())


def importance_crop(rng, h, w, crop, change, n_candidates=20, weight=5.0):
    """The reference ImportanceRandomCrop distribution (augmentations.py:
    129-142): 20 uniform candidates, pick one with p ∝ (label sum + 5)."""
    ys = rng.integers(0, h - crop + 1, size=n_candidates)
    xs = rng.integers(0, w - crop + 1, size=n_candidates)
    weights = np.array([change[y:y + crop, x:x + crop].sum() + weight
                        for y, x in zip(ys, xs)])
    k = rng.choice(n_candidates, p=weights / weights.sum())
    return int(ys[k]), int(xs[k])


def build_batch_sequence(train_items, n_steps, batch, crop, seed, n_s1):
    """Pre-crop the whole epoch once; both stacks consume these arrays.
    Returns ((n_steps, batch, crop, crop, 15) stacks in this repo's joint
    layout [s1_t1|s1_t2|s2_t1|s2_t2|b_t1|b_t2|change], (n_steps, batch)
    is_labeled). Items carry ``item['is_labeled']``; unlabeled crops get
    zeroed labels (reference datasets.py:145).

    ``train_items`` is either a pre-fetched item list (fixed timestamp
    pairs — what this tool's twin-stack comparison uses) or a CALLABLE
    ``draw(rng) -> item`` so each sample re-draws its timestamp pair
    (the reference trainer's own random-pair distribution — what
    parity_run's torch-reference side uses)."""
    rng = np.random.default_rng(seed)
    steps = np.empty((n_steps, batch, crop, crop, 15), np.float32)
    labeled = np.empty((n_steps, batch), np.float32)
    for s in range(n_steps):
        for b in range(batch):
            item = train_items(rng) if callable(train_items) else \
                train_items[int(rng.integers(len(train_items)))]
            x1, x2, y = item["x_t1"], item["x_t2"], item["y_change"]
            is_lab = float(item.get("is_labeled", True))
            h, w = y.shape[:2]
            i, j = importance_crop(rng, h, w, crop, y[..., 0])
            c1 = x1[i:i + crop, j:j + crop]
            c2 = x2[i:i + crop, j:j + crop]
            cy = y[i:i + crop, j:j + crop]
            steps[s, b, :, :, 0:n_s1] = c1[..., :n_s1]
            steps[s, b, :, :, n_s1:2 * n_s1] = c2[..., :n_s1]
            steps[s, b, :, :, 2 * n_s1:2 * n_s1 + 4] = c1[..., n_s1:]
            steps[s, b, :, :, 2 * n_s1 + 4:12] = c2[..., n_s1:]
            for ch, key in ((12, "y_sem_t1"), (13, "y_sem_t2")):
                sem = item.get(key)
                steps[s, b, :, :, ch:ch + 1] = \
                    sem[i:i + crop, j:j + crop] if sem is not None else 0.0
            steps[s, b, :, :, 14:15] = cy if is_lab else 0.0
            labeled[s, b] = is_lab
    return steps, labeled


def make_torch_step(torch, regime, tnet, criterion, cons_criterion,
                    cons_is_l2, alpha, to_t):
    """One reference-semantics optimizer objective per regime:
    supervised  — train_supervised.py:71-75
    dualtask    — train_supervised_dualtask.py:73-85 (rebuilt intent)
    semisup     — train_semisupervised.py:74-118 (boolean partitions +
                  sup-only/cons-only/both fallback)"""
    def supervised(x1, x2, y, ys1, ys2, labeled):
        return criterion(tnet(to_t(x1), to_t(x2)), to_t(y))

    def dualtask(x1, x2, y, ys1, ys2, labeled):
        lc, l1, l2 = tnet(to_t(x1), to_t(x2))
        return (criterion(lc, to_t(y))
                + (criterion(l1, to_t(ys1)) + criterion(l2, to_t(ys2))) / 2) / 2

    def semisup(x1, x2, y, ys1, ys2, labeled):
        is_lab = torch.from_numpy(labeled.astype(bool))
        lf, l1, l2 = tnet(to_t(x1), to_t(x2))
        y_t = to_t(y)
        sup_loss = cons_loss = None
        if is_lab.any():
            sup_loss = alpha * (criterion(lf[is_lab], y_t[is_lab])
                                + criterion(l1[is_lab], y_t[is_lab])
                                + criterion(l2[is_lab], y_t[is_lab])) / 3
        if not is_lab.all():
            nl = torch.logical_not(is_lab)
            if cons_is_l2:
                cons_loss = cons_criterion(torch.sigmoid(l1[nl]),
                                           torch.sigmoid(l2[nl]))
            else:
                cons_loss = cons_criterion(l1[nl], torch.sigmoid(l2[nl]))
            cons_loss = (1 - alpha) * cons_loss
        return (cons_loss if sup_loss is None else
                sup_loss if cons_loss is None else sup_loss + cons_loss)

    return {"supervised": supervised, "dualtask": dualtask,
            "semisupervised": semisup}[regime]


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--regime", default="supervised",
                   choices=["supervised", "dualtask", "semisupervised"])
    p.add_argument("--steps", type=int, default=128)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--crop", type=int, default=64)
    p.add_argument("--eval-every", type=int, default=16)
    p.add_argument("--topology", default="16,32")
    p.add_argument("--scene", type=int, default=128)
    p.add_argument("--n-train", type=int, default=6)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--tol", type=float, default=0.005,
                   help="max |dF1| allowed (0.005 == the 0.5 pt north star)")
    p.add_argument("--tpu", action="store_true",
                   help="run the JAX side on the default backend (the TPU) "
                        "instead of forcing CPU")
    p.add_argument("--precision", default="fp32", choices=["fp32", "bf16"],
                   help="this repo's compute precision (bf16 == production)")
    p.add_argument("--unpacked", action="store_true",
                   help="MODEL.PACKED_FULLRES: False — the reference-shaped "
                        "graph; isolates fp-reassociation drift from the "
                        "packed layout (exact math, different summation "
                        "order) when attributing trajectory deltas")
    p.add_argument("--chaos-floor", action="store_true",
                   help="calibration mode: train the TORCH reference twice — "
                        "identical except ONE weight perturbed by 1e-6 — and "
                        "report the same max |dF1|. This is the trajectory's "
                        "intrinsic fp-chaos floor; cross-stack deltas at or "
                        "below it carry no parity signal")
    p.add_argument("--hard", action="store_true",
                   help="hard-mode fixture (synthetic.generate_hard_dataset):"
                        " <2%% change prevalence, confusers, speckle/drift —"
                        " trajectory parity in the regime real SpaceNet7"
                        " lives in")
    p.add_argument("--signal", type=float, default=0.3,
                   help="hard-mode building contrast scale (0.3 = the "
                        "on-chip calibrated mid-range-F1 default)")
    p.add_argument("--data-dir", default=None)
    args = p.parse_args()

    import jax  # noqa: E402

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import torch

    import optax
    from multimodal_siamese_cd_tpu import evaluation, torch_port, train_lib
    from multimodal_siamese_cd_tpu.config import load_cfg
    from multimodal_siamese_cd_tpu.data.dataset import MultimodalCDDataset
    from multimodal_siamese_cd_tpu.data.synthetic import generate_fixture_dataset
    from multimodal_siamese_cd_tpu.models import create_network, init_variables

    torch.manual_seed(args.seed)
    torch.set_num_threads(1)  # 1-core host; oversubscription only slows it

    ref_networks = import_reference_module("networks")
    ref_losses = import_reference_module("loss_functions")
    ref_metrics = import_reference_module("metrics")

    # --- synthetic dataset, scene sizes pinned (exact-shape eval) ---------
    semisup = args.regime == "semisupervised"
    n_unlab = 2 if semisup else 0
    data_dir = args.data_dir or tempfile.mkdtemp(prefix="f1par_")
    names = [f"L15-{1000 + i:04d}E-1000N_{i}_0_13"
             for i in range(args.n_train + 4 + n_unlab)]
    train_aois = names[:args.n_train]
    val_aois = names[args.n_train:args.n_train + 2]
    test_aois = names[args.n_train + 2:args.n_train + 4]
    unlab_aois = names[args.n_train + 4:]
    aois = {a: a not in unlab_aois for a in names}
    if args.hard:
        from multimodal_siamese_cd_tpu.data.synthetic import generate_hard_dataset

        generate_hard_dataset(Path(data_dir), seed=args.seed,
                              scene_size=(args.scene, args.scene),
                              n_timestamps=4, aois=aois, signal=args.signal)
    else:
        generate_fixture_dataset(Path(data_dir), seed=args.seed,
                                 scene_size=(args.scene, args.scene),
                                 n_timestamps=4, aois=aois, with_nans=False)

    cfg = load_cfg("base")
    cfg.MODEL.TYPE = train_lib.REGIME_MODELS[args.regime]
    cfg.MODEL.TOPOLOGY = [int(t) for t in args.topology.split(",")]
    cfg.MODEL.IN_CHANNELS = 6
    cfg.TRAINER.PRECISION = args.precision
    cfg.TRAINER.LR = args.lr
    cfg.TRAINER.BATCH_SIZE = args.batch
    if args.unpacked:
        cfg.MODEL.PACKED_FULLRES = False
    cfg.PATHS.DATASET = str(data_dir)
    cfg.DATASET.TRAINING_IDS = train_aois
    cfg.DATASET.VALIDATION_IDS = val_aois
    cfg.DATASET.TEST_IDS = test_aois
    cfg.DATASET.UNLABELED_IDS = unlab_aois
    if args.regime == "dualtask":
        cfg.DATALOADER.INCLUDE_BUILDING_LABELS = True
    if semisup:
        cfg.DATALOADER.INCLUDE_UNLABELED = True
    for k in ("RANDOM_FLIP", "RANDOM_ROTATE", "COLOR_SHIFT",
              "GAMMA_CORRECTION"):
        setattr(cfg.AUGMENTATION, k, False)  # identical inputs to both stacks

    def split_items(run_type, with_unlabeled=False):
        ds = MultimodalCDDataset(cfg, run_type, no_augmentations=True,
                                 dataset_mode="first_last",
                                 disable_multiplier=True,
                                 disable_unlabeled=not with_unlabeled)
        return [ds[i] for i in range(len(ds))]

    train_items = split_items("training", with_unlabeled=semisup)
    eval_items = {"validation": split_items("validation"),
                  "test": split_items("test")}

    # --- identical init: the reference's own torch default init, ported ---
    torch_cls = {"supervised": ref_networks.SiameseUNet,
                 "dualtask": ref_networks.DualTaskSiameseUNet,
                 "semisupervised": ref_networks.WhateverNet}[args.regime]
    tnet = torch_cls(cfg)
    tnet.train()
    criterion = ref_losses.get_criterion(cfg.MODEL.LOSS_TYPE)
    cons_criterion = ref_losses.get_criterion(
        cfg.CONSISTENCY_TRAINER.LOSS_TYPE)
    cons_is_l2 = cfg.CONSISTENCY_TRAINER.LOSS_TYPE == "L2"
    alpha = float(cfg.CONSISTENCY_TRAINER.LOSS_FACTOR)
    opt = torch.optim.AdamW(tnet.parameters(), lr=args.lr,
                            betas=(0.9, 0.999), eps=1e-8, weight_decay=0.01)

    n_s1 = len(cfg.DATALOADER.S1_BANDS)
    stacks, labeled = build_batch_sequence(
        train_items, args.steps, args.batch, args.crop, args.seed + 1, n_s1)
    layout = train_lib.stack_layout(cfg)
    to_t = lambda a: torch.from_numpy(
        np.ascontiguousarray(np.asarray(a).transpose(0, 3, 1, 2)))
    torch_step = make_torch_step(torch, args.regime, tnet, criterion,
                                 cons_criterion, cons_is_l2, alpha, to_t)

    # Side B: this repo's stack — or, in --chaos-floor calibration mode, a
    # SECOND torch net identical up to a 1e-6 single-weight perturbation.
    if args.chaos_floor:
        import copy

        tnet2 = copy.deepcopy(tnet)
        tnet2.train()
        with torch.no_grad():
            next(tnet2.parameters()).view(-1)[0] += 1e-6
        opt2 = torch.optim.AdamW(tnet2.parameters(), lr=args.lr,
                                 betas=(0.9, 0.999), eps=1e-8,
                                 weight_decay=0.01)
        torch_step2 = make_torch_step(torch, args.regime, tnet2, criterion,
                                      cons_criterion, cons_is_l2, alpha, to_t)

        def side_b_eval(items):
            return reference_f1(torch, ref_metrics, tnet2, items)

        def side_b_step(s, parts):
            opt2.zero_grad()
            loss = torch_step2(*parts, labeled[s])
            loss.backward()
            opt2.step()
            return float(loss.detach())

        side_b_desc = "torch + 1e-6 perturbation (chaos-floor calibration)"
    else:
        model = create_network(cfg)
        variables = init_variables(model, cfg, jax.random.PRNGKey(0))
        variables = torch_port.port_reference_state_dict(tnet.state_dict(),
                                                         variables)
        state = train_lib.TrainState.create(
            apply_fn=model.apply, params=variables["params"],
            batch_stats=variables["batch_stats"],
            tx=train_lib.make_optimizer(cfg))
        step_fn = train_lib.make_train_step(model, cfg, args.regime,
                                            mesh=None)
        rng_key = jax.random.PRNGKey(cfg.SEED)

        def side_b_eval(items):
            return repo_f1(evaluation, model, state, items)

        def side_b_step(s, parts):
            nonlocal state
            state, metrics = step_fn(state, train_lib.nhwc_to_wire(stacks[s]),
                                     labeled[s], rng_key)
            return float(metrics["loss"])

        side_b_desc = (f"this repo ({jax.default_backend()}, "
                       f"{args.precision}, packed={not args.unpacked})")

    print(f"# {args.regime}: torch reference (CPU, fp32) vs {side_b_desc}; "
          f"model {cfg.MODEL.TYPE} {cfg.MODEL.TOPOLOGY}, batch {args.batch}, "
          f"crop {args.crop}, {args.steps} steps, "
          f"{len(train_items)}/{len(eval_items['validation'])}/"
          f"{len(eval_items['test'])} train/val/test scenes at "
          f"{args.scene}^2", flush=True)

    rows = []
    deltas = []

    def evaluate(step_no):
        row = {"step": step_no}
        for split, items in eval_items.items():
            f1_ref = reference_f1(torch, ref_metrics, tnet, items)
            f1_tpu = side_b_eval(items)
            row[f"{split}_ref"] = f1_ref
            row[f"{split}_tpu"] = f1_tpu
            deltas.append(abs(f1_ref - f1_tpu))
        rows.append(row)
        print(f"step {step_no:4d}  "
              f"val F1 ref {row['validation_ref']:.4f} / "
              f"tpu {row['validation_tpu']:.4f}  "
              f"test F1 ref {row['test_ref']:.4f} / "
              f"tpu {row['test_tpu']:.4f}  "
              f"max|d| so far {max(deltas):.4f}", flush=True)

    def split_stack_host(stack):
        """Numpy twin of train_lib.split_stack for the torch side:
        identical slice arithmetic, zero device traffic (the jnp version's
        concatenate would commit these host-built batches to the
        accelerator under --tpu and np.asarray would fetch them back over
        the tunnel — pure overhead for data only torch consumes)."""
        n_s1_, n_s2, n_img = layout["n_s1"], layout["n_s2"], layout["n_img"]
        s1_t1, s1_t2 = stack[..., :n_s1_], stack[..., n_s1_:2 * n_s1_]
        s2_t1 = stack[..., 2 * n_s1_:2 * n_s1_ + n_s2]
        s2_t2 = stack[..., 2 * n_s1_ + n_s2:n_img]
        y_sem_t1 = stack[..., n_img:n_img + 1].astype(np.float32)
        y_sem_t2 = stack[..., n_img + 1:n_img + 2].astype(np.float32)
        y_change = stack[..., n_img + 2:n_img + 3].astype(np.float32)
        mode = layout["input_mode"]
        if mode == "s1":
            x_t1, x_t2 = s1_t1, s1_t2
        elif mode == "s2":
            x_t1, x_t2 = s2_t1, s2_t2
        else:
            x_t1 = np.concatenate([s1_t1, s2_t1], axis=-1)
            x_t2 = np.concatenate([s1_t2, s2_t2], axis=-1)
        return x_t1, x_t2, y_change, y_sem_t1, y_sem_t2

    t0 = time.time()
    evaluate(0)
    loss_dev = []
    for s in range(args.steps):
        stack = stacks[s]
        parts = split_stack_host(stack)
        opt.zero_grad()
        t_loss = torch_step(*parts, labeled[s])
        t_loss.backward()
        opt.step()

        b_loss = side_b_step(s, parts)
        loss_dev.append(abs(b_loss - float(t_loss.detach())))

        if (s + 1) % args.eval_every == 0 or s + 1 == args.steps:
            evaluate(s + 1)

    max_delta = max(deltas)
    final = rows[-1]
    summary = {
        "metric": "f1_trajectory_max_abs_delta",
        "regime": args.regime,
        "value": round(max_delta, 5),
        "tol": args.tol,
        "steps": args.steps,
        "precision": args.precision,
        "packed": not args.unpacked,
        "mode": "chaos_floor" if args.chaos_floor else "cross_stack",
        "backend": jax.default_backend(),
        "final": {k: round(v, 4) for k, v in final.items()},
        "mean_step_loss_abs_delta": round(float(np.mean(loss_dev)), 6),
        "runtime_s": round(time.time() - t0, 1),
    }
    print(json.dumps(summary))
    if max_delta > args.tol:
        print(f"FAIL: max |dF1| {max_delta:.4f} > tol {args.tol}",
              file=sys.stderr)
        return 1
    print(f"PASS: max |dF1| {max_delta:.4f} <= tol {args.tol} over "
          f"{args.steps} steps ({len(rows)} eval points, 2 splits)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
