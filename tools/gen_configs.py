#!/usr/bin/env python
"""Generate the configs/ tree.

Config values reproduce the reference experiment definitions
(reference: configs/*.yaml) — they are experiment data, not code. Layout is
restructured for this repo: SpaceNet7 AOI split lists live in splits.yaml and
base.yaml inherits them via _BASE_. Two reference configs had broken _BASE_
references (baseline_unet_gamma.yaml inherited from itself;
baseline_dualstream_gamma.yaml from a misspelled file) — fixed here.
"""
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "configs"
OUT.mkdir(exist_ok=True)

SPLITS = {
    "TRAINING_IDS": [
        'L15-0331E-1257N_1327_3160_13', 'L15-0361E-1300N_1446_2989_13',
        'L15-0368E-1245N_1474_3210_13', 'L15-0387E-1276N_1549_3087_13',
        'L15-0434E-1218N_1736_3318_13', 'L15-0544E-1228N_2176_3279_13',
        'L15-0577E-1243N_2309_3217_13', 'L15-0586E-1127N_2345_3680_13',
        'L15-0595E-1278N_2383_3079_13', 'L15-0614E-0946N_2459_4406_13',
        'L15-0632E-0892N_2528_4620_13', 'L15-0683E-1006N_2732_4164_13',
        'L15-0760E-0887N_3041_4643_13', 'L15-0977E-1187N_3911_3441_13',
        'L15-1014E-1375N_4056_2688_13', 'L15-1015E-1062N_4061_3941_13',
        'L15-1025E-1366N_4102_2726_13', 'L15-1138E-1216N_4553_3325_13',
        'L15-1172E-1306N_4688_2967_13', 'L15-1185E-0935N_4742_4450_13',
        'L15-1200E-0847N_4802_4803_13', 'L15-1204E-1202N_4816_3380_13',
        'L15-1204E-1204N_4819_3372_13', 'L15-1289E-1169N_5156_3514_13',
        'L15-1296E-1198N_5184_3399_13', 'L15-1335E-1166N_5342_3524_13',
        'L15-1389E-1284N_5557_3054_13', 'L15-1438E-1134N_5753_3655_13',
        'L15-1439E-1134N_5759_3655_13', 'L15-1481E-1119N_5927_3715_13',
        'L15-1615E-1205N_6460_3370_13', 'L15-1615E-1206N_6460_3366_13',
        'L15-1617E-1207N_6468_3360_13', 'L15-1669E-1153N_6678_3579_13',
        'L15-1691E-1211N_6764_3347_13', 'L15-1709E-1112N_6838_3742_13',
        'L15-1716E-1211N_6864_3345_13', 'L15-1748E-1247N_6993_3202_13',
        'L15-1848E-0793N_7394_5018_13',
    ],
    "VALIDATION_IDS": [
        'L15-0358E-1220N_1433_3310_13', 'L15-0487E-1246N_1950_3207_13',
        'L15-0506E-1204N_2027_3374_13', 'L15-0924E-1108N_3699_3757_13',
        'L15-1049E-1370N_4196_2710_13', 'L15-1203E-1203N_4815_3378_13',
        'L15-1298E-1322N_5193_2903_13', 'L15-1538E-1163N_6154_3539_13',
        'L15-1669E-1160N_6679_3549_13',
    ],
    "TEST_IDS": [
        'L15-0357E-1223N_1429_3296_13', 'L15-0457E-1135N_1831_3648_13',
        'L15-0566E-1185N_2265_3451_13', 'L15-0571E-1075N_2287_3888_13',
        'L15-1209E-1113N_4838_3737_13', 'L15-1210E-1025N_4840_4088_13',
        'L15-1276E-1107N_5105_3761_13', 'L15-1479E-1101N_5916_3785_13',
        'L15-1669E-1160N_6678_3548_13', 'L15-1672E-1207N_6691_3363_13',
        'L15-1690E-1211N_6763_3346_13', 'L15-1703E-1219N_6813_3313_13',
    ],
    "UNLABELED_IDS": [
        'L15-0369E-1244N_1479_3214_13', 'L15-0391E-1219N_1567_3314_13',
        'L15-0509E-1108N_2037_3758_13', 'L15-0571E-1302N_2284_2983_13',
        'L15-0697E-0874N_2789_4694_13', 'L15-0744E-0927N_2979_4481_13',
        'L15-1031E-1300N_4127_2991_13', 'L15-1129E-0819N_4517_4915_13',
        'L15-1203E-1203N_4815_3379_13', 'L15-1213E-1238N_4852_3239_13',
        'L15-1249E-1167N_4999_3521_13', 'L15-1281E-1035N_5125_4049_13',
        'L15-1438E-1227N_5753_3282_13', 'L15-1546E-1154N_6186_3574_13',
        'L15-1615E-1205N_6461_3368_13', 'L15-1630E-0988N_6522_4239_13',
        'L15-1666E-1189N_6665_3433_13', 'L15-1670E-1159N_6681_3552_13',
        'L15-1690E-1210N_6762_3348_13', 'L15-1749E-1266N_6997_3126_13',
    ],
}


def write(name: str, text: str):
    (OUT / name).write_text(text.lstrip())


# SpaceNet7 AOI split lists (data constants shared by every experiment).
lines = ["# SpaceNet7 AOI splits: 39 train / 9 val / 12 test / 20 unlabeled AOIs.",
         "DATASET:"]
for key, ids in SPLITS.items():
    lines.append(f"  {key}: [")
    for aoi in ids:
        lines.append(f"    '{aoi}',")
    lines.append("  ]")
write("splits.yaml", "\n".join(lines) + "\n")

write("base.yaml", """
# Shared experiment defaults. AOI split lists are inherited from splits.yaml.
_BASE_: "splits.yaml"

SEED: 7
DEBUG: False
LOG_FREQ: 100
SAVE_CHECKPOINTS: [100]
INFERENCE_CHECKPOINT: 100

TRAINER:
  LR: 1e-4
  BATCH_SIZE: 8
  EPOCHS: 100
  OPTIMIZER: 'adamw'

MODEL:
  TYPE: 'unet'
  IN_CHANNELS: 3
  OUT_CHANNELS: 1
  LOSS_TYPE: 'PowerJaccardLoss'
  TOPOLOGY: [64, 128, 256, 512]
  ENABLE_SEMANTIC_CHANGE_LOSS: False

DATALOADER:
  NUM_WORKER: 2
  SHUFFLE: True
  DATASET_MODE: 'all'        # 'first_last' or 'all'
  INPUT_MODE: 's1s2'         # 's1', 's2' or 's1s2'
  S1_BANDS: [0, 1]
  S2_BANDS: [2, 1, 0, 3]
  TRAINING_MULTIPLIER: 100
  INCLUDE_BUILDING_LABELS: False
  INCLUDE_UNLABELED: False
  INCLUDE_UNLABELED_VALIDATION: False

AUGMENTATION:
  CROP_SIZE: 256
  IMAGE_OVERSAMPLING_TYPE: 'importance'   # [none, importance]
  RANDOM_FLIP: True
  RANDOM_ROTATE: True
  COLOR_SHIFT: False
  GAMMA_CORRECTION: False

CONSISTENCY_TRAINER:
  LOSS_FACTOR: 0.1
  WEIGHT_DECAY: 0.998
  LOSS_TYPE: 'PowerJaccardLoss'
""")

write("debug.yaml", """
_BASE_: "base.yaml"
DEBUG: True
""")

write("unet.yaml", """
_BASE_: "base.yaml"
DEBUG: True

MODEL:
  TYPE: 'unet'
""")

write("siamese.yaml", """
_BASE_: "base.yaml"
DEBUG: False

MODEL:
  TYPE: 'siameseunet'
""")

write("baseline_dualstream.yaml", """
_BASE_: "base.yaml"
DEBUG: False

MODEL:
  TYPE: 'dualstreamunet'

DATALOADER:
  INPUT_MODE: 's1s2'
""")

write("baseline_dualstream_gamma.yaml", """
# Reference inherited from a misspelled 'baseline_duastream.yaml'; fixed.
_BASE_: "baseline_dualstream.yaml"
DEBUG: False

AUGMENTATION:
  GAMMA_CORRECTION: True
""")

write("baseline_unet.yaml", """
_BASE_: "base.yaml"
DEBUG: True

MODEL:
  TYPE: 'unet'
  IN_CHANNELS: 4

DATALOADER:
  INPUT_MODE: 's2'
""")

write("baseline_unet_gamma.yaml", """
# Reference inherited from itself (infinite recursion); fixed to baseline_unet.
_BASE_: "baseline_unet.yaml"
DEBUG: False

AUGMENTATION:
  GAMMA_CORRECTION: True
""")

write("baseline_siamese.yaml", """
_BASE_: "base.yaml"
DEBUG: True

MODEL:
  TYPE: 'siameseunet'
  IN_CHANNELS: 4

DATALOADER:
  INPUT_MODE: 's2'
""")

write("baseline_siamese_gamma.yaml", """
_BASE_: "baseline_siamese.yaml"
DEBUG: False

AUGMENTATION:
  GAMMA_CORRECTION: True
""")

write("dtsiamese.yaml", """
_BASE_: "base.yaml"
DEBUG: False

MODEL:
  TYPE: 'dtsiameseunet'

DATALOADER:
  INCLUDE_BUILDING_LABELS: True
""")

write("dtsiamese_ssl.yaml", """
_BASE_: "base.yaml"
DEBUG: False

MODEL:
  TYPE: 'dtsiameseunet'
  ENABLE_SEMANTIC_CHANGE_LOSS: True

DATALOADER:
  INCLUDE_BUILDING_LABELS: True
  INCLUDE_UNLABELED: True
  INCLUDE_UNLABELED_VALIDATION: True

CONSISTENCY_TRAINER:
  LOSS_FACTOR: 0.1
  LOSS_TYPE: 'PowerJaccardLoss'
""")

write("dtsiamese_ssl_test.yaml", """
_BASE_: "base.yaml"
DEBUG: False

MODEL:
  TYPE: 'dtsiameseunet'
  ENABLE_SEMANTIC_CHANGE_LOSS: True

DATALOADER:
  INCLUDE_BUILDING_LABELS: True
  INCLUDE_UNLABELED: True
  INCLUDE_UNLABELED_VALIDATION: False

CONSISTENCY_TRAINER:
  LOSS_FACTOR: 0.1
  LOSS_TYPE: 'PowerJaccardLoss'
""")

write("siamese_mmcr_base.yaml", """
# Semi-supervised cross-modal consistency base (WhateverNet, Siamese streams).
_BASE_: "base.yaml"
DEBUG: False

TRAINER:
  BATCH_SIZE: 4

MODEL:
  TYPE: 'whatevernet'

DATALOADER:
  INPUT_MODE: 's1s2'
  INCLUDE_UNLABELED: True
  INCLUDE_UNLABELED_VALIDATION: False

CONSISTENCY_TRAINER:
  LOSS_FACTOR: 0.0
  LOSS_TYPE: 'PowerJaccardLoss'
""")

write("unet_mmcr_base.yaml", """
# Semi-supervised cross-modal consistency base (WhateverNet2, early fusion).
_BASE_: "base.yaml"
DEBUG: False

TRAINER:
  BATCH_SIZE: 8

MODEL:
  TYPE: 'whatevernet2'

DATALOADER:
  NUM_WORKER: 4
  INPUT_MODE: 's1s2'
  INCLUDE_UNLABELED: True
  INCLUDE_UNLABELED_VALIDATION: False

CONSISTENCY_TRAINER:
  LOSS_FACTOR: 0.0
  LOSS_TYPE: 'PowerJaccardLoss'
""")

# Alpha sweeps over the consistency loss factor.
for alpha, tag in [(0.1, "0100"), (0.5, "0500"), (0.9, "0900"), (0.99, "0990")]:
    for gamma in (False, True):
        suffix = "_gamma" if gamma else ""
        body = f"""
_BASE_: "siamese_mmcr_base.yaml"
DEBUG: False

CONSISTENCY_TRAINER:
  LOSS_FACTOR: {alpha}
"""
        if gamma:
            body += """
AUGMENTATION:
  GAMMA_CORRECTION: True
"""
        write(f"siamese_mmcr_alpha{tag}{suffix}.yaml", body)

write("siamese_mmcr_alpha0500_16batch.yaml", """
_BASE_: "siamese_mmcr_base.yaml"
DEBUG: False

TRAINER:
  BATCH_SIZE: 16

CONSISTENCY_TRAINER:
  LOSS_FACTOR: 0.5
""")

for alpha, tag in [(0.5, "0500"), (0.9, "0900"), (0.99, "0990")]:
    write(f"unet_mmcr_alpha{tag}.yaml", f"""
_BASE_: "unet_mmcr_base.yaml"
DEBUG: False

CONSISTENCY_TRAINER:
  LOSS_FACTOR: {alpha}
""")

# Reference filename has 'mmrc' typo (configs/unet_mmrc_alpha0100.yaml); kept
# so existing launch commands keep working.
write("unet_mmrc_alpha0100.yaml", """
_BASE_: "unet_mmcr_base.yaml"
DEBUG: False

CONSISTENCY_TRAINER:
  LOSS_FACTOR: 0.1
""")

write("whatevernet_debug.yaml", """
_BASE_: "base.yaml"
DEBUG: True

TRAINER:
  BATCH_SIZE: 2

MODEL:
  TYPE: 'whatevernet'
  IN_CHANNELS: 3
  OUT_CHANNELS: 1
  TOPOLOGY: [64, 128]

DATALOADER:
  INPUT_MODE: 's1s2'
  INCLUDE_UNLABELED: True
  INCLUDE_UNLABELED_VALIDATION: False

CONSISTENCY_TRAINER:
  LOSS_FACTOR: 0.9
  LOSS_TYPE: 'PowerJaccardLoss'
""")

print(f"wrote {len(list(OUT.glob('*.yaml')))} configs to {OUT}")
