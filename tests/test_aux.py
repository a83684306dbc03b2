"""Aux subsystem tests: resume-from-checkpoint, logging facade, distributed
helpers, visualization/PNG, spacenet7 + dataset_helpers utilities."""

import json
import os

import jax
import numpy as np
import pytest

from multimodal_siamese_cd_tpu import (
    checkpoints,
    dataset_helpers,
    png,
    train_lib,
    visualization,
    wandb_compat,
)
from multimodal_siamese_cd_tpu.config import load_cfg
from multimodal_siamese_cd_tpu.data.synthetic import fixture_cfg_overrides
from multimodal_siamese_cd_tpu.parallel import process_shard
from multimodal_siamese_cd_tpu.trainers import ProfilerHook, _create_or_resume


@pytest.fixture()
def cfg(fixture_dataset, tmp_path):
    c = load_cfg("debug")
    c.merge_from_list(fixture_cfg_overrides())
    c.MODEL.TOPOLOGY = [4, 8]
    c.MODEL.TYPE = "siameseunet"
    c.TRAINER.PRECISION = "fp32"
    c.PATHS.OUTPUT = str(tmp_path)
    c.PATHS.DATASET = str(fixture_dataset)
    os.makedirs(tmp_path, exist_ok=True)
    return c


def test_resume_from_checkpoint(cfg):
    _, state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    checkpoints.save_checkpoint(state, epoch=3, step=77, cfg=cfg)
    cfg.TRAINER.RESUME_CHECKPOINT = 3
    model, state2, start_step = _create_or_resume(cfg)
    assert start_step == 77
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_create_without_resume(cfg):
    model, state, start_step = _create_or_resume(cfg)
    assert start_step == 0


def test_profiler_hook_noop_without_dir(cfg):
    hook = ProfilerHook(cfg)
    for step in range(50):
        hook.step(step)
    hook.close()  # no trace dir configured: must be a clean no-op


def test_jsonl_logging_sink(tmp_path):
    wandb_compat.init("runx", config={"A": 1}, mode="jsonl", out_dir=tmp_path)
    wandb_compat.log({"loss": 0.5, "step": 1})
    wandb_compat.log({"loss": np.float32(0.25), "step": 2})
    wandb_compat.finish()
    lines = [json.loads(l) for l in
             (tmp_path / "logs" / "runx.jsonl").read_text().splitlines()]
    assert lines[0]["_event"] == "init"
    assert lines[1]["loss"] == 0.5
    assert lines[2]["loss"] == 0.25


def test_process_shard_single_host():
    sl = process_shard(10)
    assert sl == slice(0, 10)


def test_png_roundtrip_rgb(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(20, 30, 3), dtype=np.uint8)
    f = png.write_png(tmp_path / "x.png", img)
    back = png.read_png(f)
    np.testing.assert_array_equal(back, img)


def test_visualization_panels():
    img = np.random.default_rng(0).uniform(size=(10, 12, 6)).astype(np.float32)
    rgb = visualization.optical_rgb(img)
    assert rgb.shape == (10, 12, 3) and rgb.dtype == np.uint8
    sar = visualization.sar_gray(img)
    assert sar.shape == (10, 12, 3)
    pred = np.array([[1, 1, 0], [0, 1, 0]])
    gt = np.array([[1, 0, 0], [0, 1, 1]])
    cls = visualization.get_misclassifications(pred, gt)
    np.testing.assert_array_equal(cls, [[1, 2, 0], [0, 1, 3]])
    colored = visualization.classification_rgb(cls)
    assert colored.shape == (2, 3, 3)
    grid = visualization.compose_grid([[rgb, sar], [colored]])
    assert grid.ndim == 3 and grid.shape[2] == 3


def test_dataset_helpers_on_fixture(fixture_dataset):
    aois = dataset_helpers.aoi_ids(str(fixture_dataset))
    assert len(aois) == 5
    aoi = aois[0]
    ts = dataset_helpers.get_timeseries(str(fixture_dataset), aoi)
    assert len(ts) == 3
    assert dataset_helpers.length_timeseries(str(fixture_dataset), aoi) == 3
    assert dataset_helpers.duration_timeseries(str(fixture_dataset), aoi) == 2
    assert dataset_helpers.date2index([2019, 1]) == 0
    assert dataset_helpers.date2str([2019, 3]) == "19-03"
    labeled = [a for a in aois
               if dataset_helpers.metadata(str(fixture_dataset))[a][0]["buildings"]]
    change = dataset_helpers.generate_change_label(str(fixture_dataset), labeled[0])
    assert change.dtype == np.uint8 and change.sum() > 0
    transform, crs = dataset_helpers.get_geo(str(fixture_dataset), aoi)
    assert str(crs) == "EPSG:4326"


def test_split_generators(fixture_dataset):
    train, test = dataset_helpers.generate_train_test_split(
        str(fixture_dataset), split=0.4, seed=7)
    assert set(train) | set(test) == set(dataset_helpers.aoi_ids(str(fixture_dataset)))
    assert not set(train) & set(test)
