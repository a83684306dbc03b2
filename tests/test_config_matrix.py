"""Experiment-grid smoke tests: every shipped config family must train and
evaluate end-to-end (2 steps on the fixture, CPU) under its intended regime
and input mode — catching config/model/regime wiring drift."""

import os

import jax
import numpy as np
import pytest

from multimodal_siamese_cd_tpu import evaluation, train_lib
from multimodal_siamese_cd_tpu.config import load_cfg
from multimodal_siamese_cd_tpu.data.dataset import MultimodalCDDataset
from multimodal_siamese_cd_tpu.data.loader import TrainLoader
from multimodal_siamese_cd_tpu.data.synthetic import fixture_cfg_overrides

# (config name, regime) — one representative per experiment family
GRID = [
    ("siamese", "supervised"),                 # siameseunet, s1s2
    ("unet", "supervised"),                    # early-fusion unet
    ("baseline_unet", "supervised"),           # s2-only input mode
    ("baseline_siamese_gamma", "supervised"),  # gamma augmentation on
    ("baseline_dualstream", "supervised"),     # dual-stream late fusion
    ("siamese_mmcr_alpha0500", "semisupervised"),   # whatevernet + unlabeled
    ("unet_mmcr_alpha0900", "semisupervised"),      # whatevernet2 family
    ("dtsiamese", "dualtask"),                 # dual-task w/ building labels
    # dual-task model under the semisup trainer (reference pairing per
    # BASELINE.json: dtsiamese_ssl.yaml -> train_semisupervised.py)
    ("dtsiamese_ssl_test", "semisupervised"),
]


@pytest.mark.parametrize("config_name,regime", GRID)
def test_shipped_config_trains_and_evals(config_name, regime,
                                         fixture_dataset, tmp_path):
    cfg = load_cfg(config_name)
    cfg.merge_from_list(fixture_cfg_overrides())
    cfg.MODEL.TOPOLOGY = [4, 8]
    cfg.TRAINER.BATCH_SIZE = 2
    cfg.TRAINER.PRECISION = "fp32"
    cfg.PATHS.OUTPUT = str(tmp_path)
    cfg.PATHS.DATASET = str(fixture_dataset)
    os.makedirs(tmp_path, exist_ok=True)

    model, state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    step_fn = train_lib.make_train_step(model, cfg, regime)
    ds = MultimodalCDDataset(cfg, "training", return_stack=True, crop_only=True)
    loader = TrainLoader(ds, cfg.TRAINER.BATCH_SIZE, num_workers=0, seed=0,
                         drop_last=False)
    rng = jax.random.PRNGKey(7)
    losses = []
    for i, batch in enumerate(loader):
        state, m = step_fn(state, batch["stack"], batch["is_labeled"], rng)
        losses.append(float(m["loss"]))
        if i == 1:
            break
    assert all(np.isfinite(losses)), (config_name, losses)

    ds_val = MultimodalCDDataset(cfg, "validation", no_augmentations=True,
                                 dataset_mode="first_last",
                                 disable_multiplier=True, disable_unlabeled=True)
    result = evaluation.inference_loop(model, state, ds_val)
    f1, precision, recall = result["change"]
    assert 0.0 <= f1 <= 1.0, (config_name, f1)
