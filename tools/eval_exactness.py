#!/usr/bin/env python
"""Measure the padded-bucket vs exact-shape eval F1 delta at SpaceNet7 scale.

Padded-bucket eval (the default, evaluation.py: EVAL_BUCKET 64) zero-pads
scenes up to 64-multiples and masks the padding out of the confusion
counts — but the network still SEES the padding, so predictions for valid
pixels inside the receptive field of a padded edge differ from an unpadded
forward. ``TRAINER.EVAL_PAD_MULTIPLE: 1`` restores exactness at the cost of
one compile per distinct scene shape. This tool puts a number on the F1
difference at the real-SpaceNet7 shape class (~1000^2 scenes whose sides
are NOT 64-multiples), at a TRAINED checkpoint (random weights would put
every pixel at the threshold cliff and overstate the effect):

  1. trains the supervised flagship briefly on synthetic 320^2 scenes
     (tools/convergence_run.py's recipe) unless --skip-train reuses the
     checkpoint already in --out-dir from a previous run;
  2. generates a second synthetic split with ~1000^2 scenes;
  3. evaluates the checkpoint on it with bucket=64 and bucket=1 and
     reports per-split F1 under both modes, the max |dF1|, and wall times.

The measured delta justifies the shipped default for assessment_change.py /
assessment_semantics.py (see BASELINE.md "Eval exactness").
"""

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

VAL = [f"L15-synval{i}" for i in range(2)]
TEST = [f"L15-syntest{i}" for i in range(2)]


def train_checkpoint(out: Path, data: Path, multiplier: int) -> None:
    """One short supervised epoch via the shipped CLI (checkpoint epoch 1)."""
    cmd = [sys.executable, str(REPO / "tools" / "convergence_run.py"),
           "--regime", "supervised", "--scene", "320",
           "--data-dir", str(data), "--out-dir", str(out),
           "--multiplier", str(multiplier), "--log-freq", "1000",
           "--save-checkpoints", "[1]"]
    print("training:", " ".join(cmd), flush=True)
    subprocess.run(cmd, cwd=REPO, check=True)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--scene", type=int, default=1000,
                   help="eval scene base size; 1000 %% 64 != 0 forces padding")
    p.add_argument("--multiplier", type=int, default=48,
                   help="training steps for the throwaway checkpoint")
    p.add_argument("--out-dir", default="/tmp/evex_out")
    p.add_argument("--skip-train", action="store_true",
                   help="reuse an existing checkpoint in --out-dir")
    args = p.parse_args()

    out = Path(args.out_dir)
    train_data = Path("/tmp/convds320")
    if not args.skip_train:
        train_checkpoint(out, train_data, args.multiplier)

    from multimodal_siamese_cd_tpu import checkpoints, evaluation
    from multimodal_siamese_cd_tpu.config import load_cfg
    from multimodal_siamese_cd_tpu.data.dataset import MultimodalCDDataset
    from multimodal_siamese_cd_tpu.data.synthetic import generate_fixture_dataset

    # --- eval split at the SpaceNet7 shape class --------------------------
    eval_data = Path(f"/tmp/evexds{args.scene}")
    if not (eval_data / "metadata.json").exists():
        print(f"generating {args.scene}^2-class eval scenes...", flush=True)
        aois = {a: True for a in VAL + TEST}
        generate_fixture_dataset(eval_data, seed=13,
                                 scene_size=(args.scene, args.scene),
                                 aois=aois)

    cfg = load_cfg("siamese")
    cfg.NAME = "siamese"
    cfg.PATHS.OUTPUT = str(out)
    cfg.PATHS.DATASET = str(eval_data)
    cfg.DATASET.TRAINING_IDS = []
    cfg.DATASET.VALIDATION_IDS = VAL
    cfg.DATASET.TEST_IDS = TEST
    cfg.DATASET.UNLABELED_IDS = []

    model, state, step = checkpoints.load_checkpoint(1, cfg)
    print(f"loaded checkpoint epoch 1 (step {step})", flush=True)

    summary = {"metric": "eval_pad_f1_abs_delta", "scene_class": args.scene,
               "splits": {}}
    deltas = []
    for split in ("validation", "test"):
        ds = MultimodalCDDataset(cfg, split, no_augmentations=True,
                                 dataset_mode="first_last",
                                 disable_multiplier=True,
                                 disable_unlabeled=True)
        items = [ds[i] for i in range(len(ds))]
        shapes = sorted({it["x_t1"].shape[:2] for it in items})
        results = {}
        for mode, bucket in (("padded64", 64), ("exact", 1)):
            t0 = time.time()
            measurer = evaluation.run_measurer(model, state, items,
                                               np.asarray([0.5]),
                                               bucket=bucket)
            f1 = float(np.asarray(measurer.compute_f1()).max())
            results[mode] = {"f1": f1, "wall_s": round(time.time() - t0, 1)}
            print(f"{split:10s} {mode:8s} F1 {f1:.6f} "
                  f"({results[mode]['wall_s']} s)", flush=True)
        delta = abs(results["padded64"]["f1"] - results["exact"]["f1"])
        deltas.append(delta)
        summary["splits"][split] = {
            "scene_shapes": [list(s) for s in shapes], **results,
            "abs_delta": round(delta, 6)}
    summary["value"] = round(max(deltas), 6)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
