#!/usr/bin/env bash
# Full user-journey demo on real hardware (recorded in BASELINE.md):
#   train 1 epoch -> checkpoint -> resume into epoch 2 -> checkpoint ->
#   offline assessment (must reproduce the trainer's epoch-end eval) ->
#   AOT serving export -> served scene cross-checked against the
#   assessment path.
# Prereq: the synthetic dataset from tools/convergence_run.py at $DATA
# (any regime run generates it).
set -e
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/lifecycle_out}
DATA=${2:-/tmp/convds320}
rm -rf "$OUT" && mkdir -p "$OUT"
OV=(DATASET.TRAINING_IDS "['L15-syntrain0', 'L15-syntrain1', 'L15-syntrain2', 'L15-syntrain3', 'L15-syntrain4', 'L15-syntrain5', 'L15-syntrain6', 'L15-syntrain7']"
    DATASET.VALIDATION_IDS "['L15-synval0', 'L15-synval1']"
    DATASET.TEST_IDS "['L15-syntest0', 'L15-syntest1']"
    DATASET.UNLABELED_IDS "['L15-synunlab0', 'L15-synunlab1', 'L15-synunlab2', 'L15-synunlab3']"
    DATALOADER.TRAINING_MULTIPLIER 16 LOG_FREQ 8 SAVE_CHECKPOINTS "[1, 2]")

echo "=== train epoch 1 (checkpoint at 1) ==="
python train_supervised.py -c siamese -p life -o "$OUT" -d "$DATA" "${OV[@]}" TRAINER.EPOCHS 1
echo "=== resume into epoch 2 (checkpoint at 2) ==="
python train_supervised.py -c siamese -p life -o "$OUT" -d "$DATA" "${OV[@]}" TRAINER.EPOCHS 2 TRAINER.RESUME_CHECKPOINT 1
echo "=== offline assessment of checkpoint 2 ==="
python assessment_change.py -c siamese -o "$OUT" -d "$DATA" -r test "${OV[@]}" INFERENCE_CHECKPOINT 2
echo "=== serving export of checkpoint 2 ==="
python tools/export_serving.py -c siamese -p life -o "$OUT" -d "$DATA" --dest "$OUT/bundle.zip" --epoch 2 --buckets 384 "${OV[@]}"
echo "=== serve one real scene, cross-check vs the assessment path ==="
OUT="$OUT" DATA="$DATA" python - <<'PYEOF'
import os
import numpy as np
from multimodal_siamese_cd_tpu import serving, checkpoints, evaluation
from multimodal_siamese_cd_tpu.experiment_manager import setup_cfg_manual
from multimodal_siamese_cd_tpu.data.dataset import MultimodalCDDataset

out, data = os.environ["OUT"], os.environ["DATA"]
cfg = setup_cfg_manual('siamese', out, data)
cfg.DATASET.TRAINING_IDS = ['L15-syntrain0']
cfg.DATASET.VALIDATION_IDS = ['L15-synval0']
cfg.DATASET.TEST_IDS = ['L15-syntest0', 'L15-syntest1']
cfg.DATASET.UNLABELED_IDS = []
ds = MultimodalCDDataset(cfg, 'test', no_augmentations=True,
                         dataset_mode='first_last', disable_multiplier=True,
                         disable_unlabeled=True)
item = ds[0]
model, state, step = checkpoints.load_checkpoint(2, cfg)
ref = evaluation.scene_probabilities(model, state, item)
served = serving.load_serving_bundle(f"{out}/bundle.zip")
got = served.predict(item['x_t1'], item['x_t2'])
h, w = got.shape
interior = (slice(96, h - 96), slice(96, w - 96))
d_int = float(np.abs(got[interior] - ref[interior]).max())
print(f"scene {item['x_t1'].shape}: served vs assessment "
      f"max|interior diff|={d_int:.4g}")
assert d_int < 5e-3  # bf16 noise; edges see the bucket's extra zero pad
print("LIFECYCLE OK")
PYEOF
