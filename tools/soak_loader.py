#!/usr/bin/env python
"""1-core soak: does the loader's samples/s margin over the chip's demand
(pass the current bench number via --chip-demand) survive the host work
that in-training evaluation interleaves at LOG_FREQ cadence?

The host VM has ONE core. Every LOG_FREQ=100 steps the
trainer also runs two eval passes whose HOST side (GeoTIFF/cache reads,
pad_to_bucket copies, measurer confusion math) competes for the same core.
This tool measures the loader's steady-state rate alone and then with a
concurrent thread replaying exactly that eval host work in a loop — the
worst case, since real evals are periodic, not continuous.

Pure host measurement (no TPU): device dispatch is not the contended
resource; on this rig it would only add tunnel artifacts.

Prints one JSON line with both rates and the degradation; the margin
verdict goes to BASELINE.md.
"""

import argparse
import json
import sys
import threading
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _burst_loop(stop: threading.Event, one_pass, period) -> None:
    """Drive the eval-work replay either CONTINUOUSLY (``period`` None — the
    adversarial ceiling) or DUTY-CYCLED at the production cadence: the
    trainer runs TWO passes (training + validation protocols) every
    LOG_FREQ=100 steps, then trains for ~LOG_FREQ x step_time before the
    next burst; ``period`` is that full cycle length in seconds."""
    while not stop.is_set():
        t0 = time.perf_counter()
        one_pass()
        if stop.is_set():
            return
        one_pass()
        if period is not None:
            rest = period - (time.perf_counter() - t0)
            if rest > 0:
                stop.wait(rest)


def eval_host_work_loop(stop: threading.Event, eval_ds, counters,
                        period=None) -> None:
    """Replay the eval pass's host-side work: scene fetch from the dataset
    (cache read + first_last float32 assembly — PER PASS, as
    ``run_measurer``'s item path pays it, not a one-time pre-materialized
    list), pad_to_bucket, and the measurer's thresholded confusion
    accumulation on the padded shapes."""
    from multimodal_siamese_cd_tpu.evaluation import pad_to_bucket
    from multimodal_siamese_cd_tpu.metrics import MultiThresholdMetric

    thresholds = np.asarray([0.5])
    rng = np.random.default_rng(0)

    def one_pass():
        measurer = MultiThresholdMetric(thresholds)
        for i in range(len(eval_ds)):
            if stop.is_set():
                return
            item = eval_ds[i]  # full-scene cache read + assembly, each pass
            x1, valid = pad_to_bucket(item["x_t1"])
            pad_to_bucket(item["x_t2"])
            y, _ = pad_to_bucket(item["y_change"])
            # the probabilities a real eval feeds back arrive from device;
            # synthesize the same-shaped array (host cost is identical)
            probs = rng.random(y.shape[:2], np.float32)
            measurer.add_sample(y[None, ..., 0], probs[None],
                                valid_mask=valid[None])
            counters["eval_scenes"] += 1

    _burst_loop(stop, one_pass, period)


def wire_eval_host_work_loop(stop: threading.Event, eval_ds, bucket,
                             counters, period=None) -> None:
    """Replay the FUSED eval path's host-side work: eval_wire planar
    assembly plus the per-group np.stack — confusion math and the float32
    materialization moved on-device (evaluation._measure_wired), so this is
    everything that still competes for the host core."""
    from multimodal_siamese_cd_tpu.evaluation import eval_group_limit

    def one_pass():
        pending: dict = {}
        for i in range(len(eval_ds)):
            if stop.is_set():
                return
            w = eval_ds.eval_wire(i, bucket)
            group = pending.setdefault(w["x1"].shape, [])
            group.append(w)
            if len(group) >= eval_group_limit(w["x1"].shape[1:]):
                for k in ("x1", "x2", "y", "valid"):
                    np.stack([g[k] for g in group])
                group.clear()
            counters["eval_scenes"] += 1
        for group in pending.values():
            if group:
                for k in ("x1", "x2", "y", "valid"):
                    np.stack([g[k] for g in group])

    _burst_loop(stop, one_pass, period)


def measure_loader(loader, seconds: float) -> float:
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < seconds:
        for batch in loader:
            n += batch["stack"].shape[0]
            if time.perf_counter() - t0 >= seconds:
                break
    return n / (time.perf_counter() - t0)


def main() -> int:
    # "Pure host measurement (no TPU)" — enforce it: the measurer's jnp
    # accumulators and add_sample math would otherwise land on the pinned
    # axon backend (tunnel artifacts when healthy; a silently-hung eval
    # thread when the tunnel is wedged). CPU keeps every replayed byte of
    # eval work on the contended host core, which is the worst case the
    # margin verdict wants.
    import jax

    jax.config.update("jax_platforms", "cpu")
    p = argparse.ArgumentParser()
    p.add_argument("--scene", type=int, default=1000)
    p.add_argument("--seconds", type=float, default=30.0)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--wire", action="store_true",
                   help="replay the fused wire eval path's host work "
                        "(the production path since the fused measurer) "
                        "instead of the legacy float32 item path")
    p.add_argument("--chip-demand", type=float, default=None,
                   help="current chip patches/s from bench.py; echoed into "
                        "the JSON for the margin comparison (omitted when "
                        "not given — never baked into the source)")
    p.add_argument("--duty-period", type=float, default=None,
                   help="replay eval bursts (2 passes) every this many "
                        "seconds — the PRODUCTION cadence (LOG_FREQ=100 "
                        "steps x 24.3 ms = 2.43 s for the supervised "
                        "flagship) instead of the continuous worst case")
    args = p.parse_args()

    from multimodal_siamese_cd_tpu.config import load_cfg
    from multimodal_siamese_cd_tpu.data.dataset import MultimodalCDDataset
    from multimodal_siamese_cd_tpu.data.loader import TrainLoader
    from multimodal_siamese_cd_tpu.data.synthetic import generate_fixture_dataset

    data = Path(f"/tmp/soakds{args.scene}")
    train = [f"L15-soak{i}" for i in range(4)]
    val = [f"L15-soakval{i}" for i in range(2)]
    if not (data / "metadata.json").exists():
        print(f"generating {args.scene}^2-class scenes...", flush=True)
        generate_fixture_dataset(data, seed=5,
                                 scene_size=(args.scene, args.scene),
                                 aois={a: True for a in train + val})

    cfg = load_cfg("base")
    cfg.PATHS.DATASET = str(data)
    cfg.DATASET.TRAINING_IDS = train
    cfg.DATASET.VALIDATION_IDS = val
    cfg.DATASET.TEST_IDS = []
    cfg.DATASET.UNLABELED_IDS = []
    cfg.DATALOADER.TRAINING_MULTIPLIER = 100

    ds = MultimodalCDDataset(cfg, "training", return_stack=True,
                             crop_only=True)
    loader = TrainLoader(ds, batch_size=args.batch, shuffle=True,
                         drop_last=True, num_workers=1, seed=7)

    eval_ds = MultimodalCDDataset(cfg, "validation", no_augmentations=True,
                                  dataset_mode="first_last",
                                  disable_multiplier=True,
                                  disable_unlabeled=True)
    if args.wire:
        from multimodal_siamese_cd_tpu.evaluation import EVAL_BUCKET
        for i in range(len(eval_ds)):  # warm EVERY eval AOI's scene cache
            eval_ds.eval_wire(i, EVAL_BUCKET)
        eval_target = wire_eval_host_work_loop
        eval_args = (eval_ds, EVAL_BUCKET)
    else:
        for i in range(len(eval_ds)):  # warm the scene cache, not the items
            eval_ds[i]
        eval_target = eval_host_work_loop
        eval_args = (eval_ds,)
    eval_kwargs = {"period": args.duty_period}

    # Warm the scene cache fully: every (aoi, timestamp) pair must be
    # decoded before the timed window, else first-epoch GeoTIFF decodes
    # (seconds per 1000^2 scene) pollute the steady-state measurement.
    t0 = time.perf_counter()
    for i in range(min(len(ds), 64)):
        ds[i]
    print(f"cache warm ({time.perf_counter() - t0:.1f} s); measuring...",
          flush=True)

    alone = measure_loader(loader, args.seconds)
    print(f"loader alone: {alone:.1f} samples/s", flush=True)

    stop = threading.Event()
    counters = {"eval_scenes": 0}
    t = threading.Thread(target=eval_target, kwargs=eval_kwargs,
                         args=(stop, *eval_args, counters), daemon=True)
    t.start()
    t0 = time.perf_counter()
    contended = measure_loader(loader, args.seconds)
    eval_rate = counters["eval_scenes"] / (time.perf_counter() - t0)
    stop.set()
    t.join(timeout=10)
    print(f"loader + continuous eval host work: {contended:.1f} samples/s "
          f"(eval side processed {eval_rate:.2f} scenes/s)", flush=True)

    result = {
        "metric": "loader_soak_samples_per_sec",
        "alone": round(alone, 1),
        "with_eval_host_work": round(contended, 1),
        "degradation_pct": round(100 * (1 - contended / alone), 1),
        "eval_scenes_per_sec_concurrent": round(eval_rate, 2),
        "scene_class": args.scene,
        "eval_path": "wire" if args.wire else "item",
        "eval_cadence": ("continuous" if args.duty_period is None
                         else f"duty_{args.duty_period}s"),
    }
    if args.chip_demand is not None:
        result["chip_demand_patches_per_sec"] = args.chip_demand
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
