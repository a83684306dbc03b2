#!/usr/bin/env python
"""On-hardware convergence evidence via the SHIPPED trainer CLIs.

Generates a synthetic SpaceNet7-layout dataset (buildings visible in the
imagery) and runs one of the three training CLIs on the TPU with a short
schedule, then prints the eval-F1 trajectory parsed from the JSONL sink.
Round-1 recorded this for the supervised regime (BASELINE.md); this tool
makes the run reproducible and covers dualtask/semisupervised too.

Usage: python tools/convergence_run.py --regime dualtask
"""
import argparse
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

REGIMES = {
    "supervised": ("train_supervised.py", "siamese"),
    "dualtask": ("train_supervised_dualtask.py", "dtsiamese"),
    # alpha0500: supervised factor 0.5 — mmcr_base is the consistency-only
    # ablation (LOSS_FACTOR 0.0) and cannot learn change labels by design
    "semisupervised": ("train_semisupervised.py", "siamese_mmcr_alpha0500"),
}

# A larger AOI grid than the default test fixture (hyphen-only ids: the
# s1_{aoi}_{year}_{month}.tif naming stays unambiguous).
TRAIN = [f"L15-syntrain{i}" for i in range(8)]
VAL = [f"L15-synval{i}" for i in range(2)]
TEST = [f"L15-syntest{i}" for i in range(2)]
UNLAB = [f"L15-synunlab{i}" for i in range(4)]


def ensure_dataset(root: Path, scene: int, hard: bool = False,
                   signal: float = 1.0, seed: int = 7) -> None:
    import json as _json
    import shutil

    params = {"scene": scene, "train": TRAIN, "val": VAL, "test": TEST,
              "unlab": UNLAB, "hard": hard,
              "signal": signal if hard else None, "seed": seed}
    marker = root / "convergence_gen_params.json"
    if marker.exists() and _json.loads(marker.read_text()) == params:
        return
    if root.exists():
        if not marker.exists():
            # NEVER delete a tree this tool didn't generate (--data-dir may
            # point at a real dataset)
            raise SystemExit(
                f"{root} exists but has no {marker.name}; refusing to "
                f"overwrite a dataset this tool did not generate — pass an "
                f"empty/new --data-dir")
        shutil.rmtree(root)  # our own stale generation: regenerate
    from multimodal_siamese_cd_tpu.data.synthetic import (
        generate_fixture_dataset,
        generate_hard_dataset,
    )

    print(f"generating {'HARD ' if hard else ''}synthetic dataset at {root} "
          f"({scene}^2 scenes)...", flush=True)
    aois = {a: True for a in TRAIN + VAL + TEST}
    aois.update({a: False for a in UNLAB})
    if hard:
        generate_hard_dataset(root, seed=seed, scene_size=(scene, scene),
                              aois=aois, signal=signal)
    else:
        generate_fixture_dataset(root, seed=seed, scene_size=(scene, scene),
                                 aois=aois)
    marker.write_text(_json.dumps(params))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--regime", choices=sorted(REGIMES), default="dualtask")
    p.add_argument("--scene", type=int, default=320)
    p.add_argument("--data-dir", default=None)
    p.add_argument("--out-dir", default=None)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--multiplier", type=int, default=64)
    p.add_argument("--log-freq", type=int, default=10)
    p.add_argument("--save-checkpoints", default=None,
                   help="SAVE_CHECKPOINTS override, e.g. '[1]'")
    p.add_argument("--hard", action="store_true",
                   help="hard-mode fixture: <2%% change prevalence, "
                        "confuser buildings/clutter, speckle + drift "
                        "(synthetic.generate_hard_dataset)")
    p.add_argument("--signal", type=float, default=0.3,
                   help="hard-mode building contrast scale (0.3 = the "
                        "on-chip calibrated mid-range-F1 default)")
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--uniform-crop", action="store_true",
                   help="override AUGMENTATION.IMAGE_OVERSAMPLING_TYPE to "
                        "'none' (importance-vs-uniform ablation)")
    p.add_argument("--model", default=None,
                   help="MODEL.TYPE override (factory-type convergence legs)")
    p.add_argument("--config", default=None,
                   help="config name override (default: the regime's "
                        "headline config)")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("extra", nargs="*", metavar="KEY VALUE",
                   help="extra config overrides appended to the CLI — e.g. "
                        "`DEBUG False` (the upstream unet/baseline_* grid "
                        "pins DEBUG: True = one step per epoch, reproduced "
                        "faithfully by the shipped configs)")
    args = p.parse_args()
    if len(args.extra) % 2:
        p.error("extra overrides must come in KEY VALUE pairs")

    script, config = REGIMES[args.regime]
    if args.config is not None:
        config = args.config
    data = Path(args.data_dir or f"/tmp/convds{args.scene}")
    if args.data_dir is None and args.hard:
        data = Path(f"/tmp/convds_hard{args.scene}_s{args.signal}")
    out_tag = args.regime + ("_hard" if args.hard else "") \
        + (f"_{args.config}" if args.config else "") \
        + (f"_{args.model}" if args.model else "") \
        + ("_uniform" if args.uniform_crop else "")
    out = Path(args.out_dir or f"/tmp/convout_{out_tag}")
    out.mkdir(parents=True, exist_ok=True)
    ensure_dataset(data, args.scene, hard=args.hard, signal=args.signal,
                   seed=args.seed)

    log = out / "logs" / f"{config}.jsonl"
    log.unlink(missing_ok=True)  # the sink appends; keep one run per report

    cmd = [sys.executable, str(REPO / script), "-c", config,
           "-p", "convergence", "-o", str(out), "-d", str(data),
           "DATASET.TRAINING_IDS", repr(TRAIN),
           "DATASET.VALIDATION_IDS", repr(VAL),
           "DATASET.TEST_IDS", repr(TEST),
           "DATASET.UNLABELED_IDS", repr(UNLAB),
           "DATALOADER.TRAINING_MULTIPLIER", str(args.multiplier),
           "LOG_FREQ", str(args.log_freq),
           # transiently slow tunnel days exceed the 900 s default budget
           # for compile+warmup-to-first-fetch (observed round 5)
           "TRAINER.WEDGE_TIMEOUT", "1800",
           "TRAINER.EPOCHS", str(args.epochs)]
    if args.save_checkpoints is not None:
        cmd += ["SAVE_CHECKPOINTS", args.save_checkpoints]
    if args.uniform_crop:
        cmd += ["AUGMENTATION.IMAGE_OVERSAMPLING_TYPE", "none"]
    if args.model is not None:
        cmd += ["MODEL.TYPE", args.model]
    if args.batch_size is not None:
        cmd += ["TRAINER.BATCH_SIZE", str(args.batch_size)]
    cmd += args.extra
    print("running:", " ".join(cmd), flush=True)
    # the tunneled backend has observed transient stalls that trip the
    # trainer's wedge watchdog (rc=2) before the first step — rig
    # flakiness, not a training failure: retry with a clean log
    for attempt in range(3):
        log.unlink(missing_ok=True)
        rc = subprocess.run(cmd, cwd=REPO).returncode
        if rc == 0:
            break
        print(f"attempt {attempt + 1} failed rc={rc}; retrying", flush=True)
    if rc:
        return rc

    print(f"\nF1 trajectory ({log}):")
    for line in log.read_text().splitlines():
        rec = json.loads(line)
        for key in ("training F1", "validation F1", "test F1"):
            if key in rec:
                print(f"  step {rec.get('step'):>4}  {key}: {rec[key]:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
