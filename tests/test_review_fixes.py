"""Regression tests for the round-1 code-review findings."""

import os

import jax
import numpy as np
import pytest

from multimodal_siamese_cd_tpu import geofiles, train_lib
from multimodal_siamese_cd_tpu.config import CfgNode, load_cfg
from multimodal_siamese_cd_tpu.data.cache import SceneCache
from multimodal_siamese_cd_tpu.data.dataset import MultimodalCDDataset
from multimodal_siamese_cd_tpu.data.synthetic import TRAIN_AOIS, fixture_cfg_overrides


@pytest.fixture()
def cfg(fixture_dataset, tmp_path):
    c = load_cfg("debug")
    c.merge_from_list(fixture_cfg_overrides())
    c.MODEL.TOPOLOGY = [4, 8]
    c.MODEL.TYPE = "siameseunet"
    c.TRAINER.PRECISION = "fp32"
    c.TRAINER.BATCH_SIZE = 2
    c.PATHS.OUTPUT = str(tmp_path)
    c.PATHS.DATASET = str(fixture_dataset)
    os.makedirs(tmp_path, exist_ok=True)
    return c


def test_resume_continues_epoch_numbering(cfg, capsys):
    """Resumed runs must continue from the restored epoch, not retrain a
    full EPOCHS schedule (review finding 1)."""
    from multimodal_siamese_cd_tpu import trainers, wandb_compat

    cfg.DEBUG = False
    cfg.TRAINER.EPOCHS = 1
    cfg.SAVE_CHECKPOINTS = [1, 2]
    cfg.LOG_FREQ = 1000
    wandb_compat.init(cfg.NAME, mode="disabled", out_dir=cfg.PATHS.OUTPUT)
    trainers.run_supervised(cfg)

    cfg2 = cfg.clone()
    cfg2.TRAINER.EPOCHS = 2
    # 'latest' must discover checkpoint 1 itself (explicit-epoch resume is
    # covered by test_aux.py::test_resume_from_checkpoint)
    cfg2.TRAINER.RESUME_CHECKPOINT = 'latest'
    trainers.run_supervised(cfg2)
    out = capsys.readouterr().out
    wandb_compat.finish()
    # second run must start at epoch 2 and never re-run epoch 1
    assert "Starting epoch 2/2" in out
    assert out.count("Starting epoch 1/") == 1  # only from the first run
    from pathlib import Path

    assert (Path(cfg.PATHS.OUTPUT) / "networks"
            / f"{cfg.NAME}_checkpoint2.pt").exists()


def test_quoted_numeric_strings_stay_strings():
    """Programmatic string values are NEVER coerced (round-3 review: the old
    `_convert` sci-notation coercion mangled explicitly quoted YAML strings;
    bare `1e-4` now resolves to float at the YAML layer instead — see
    tests/test_config.py::test_sci_notation_floats_quoted_vs_bare)."""
    c = CfgNode({"A": "1e-4", "B": "12345", "C": "(1,2)", "D": "None",
                 "E": "2E5", "F": "1.5e-3", "G": "0.5"})
    for key, raw in [("A", "1e-4"), ("B", "12345"), ("C", "(1,2)"),
                     ("D", "None"), ("E", "2E5"), ("F", "1.5e-3"),
                     ("G", "0.5")]:
        assert c[key] == raw and isinstance(c[key], str)


def test_numeric_path_survives_setup(tmp_path, monkeypatch):
    from argparse import Namespace
    from pathlib import Path

    from multimodal_siamese_cd_tpu import experiment_manager as em

    numeric_dir = tmp_path / "12345"
    numeric_dir.mkdir()
    monkeypatch.chdir(Path(__file__).resolve().parent.parent)
    cfg = em.setup_cfg(Namespace(config_file="debug", opts=[],
                                 output_dir=str(numeric_dir),
                                 dataset_dir=str(numeric_dir)))
    assert isinstance(cfg.PATHS.OUTPUT, str)
    assert Path(cfg.PATHS.DATASET).exists()


def test_wire_dtype_follows_cache_dtype(cfg):
    """f16 wire only when the cache itself is f16 (review finding 3)."""
    ds16 = MultimodalCDDataset(cfg, "training", return_stack=True, crop_only=True)
    assert ds16[0]["stack"].dtype == np.float16
    cfg32 = cfg.clone()
    cfg32.DATALOADER.CACHE_DTYPE = "float32"
    ds32 = MultimodalCDDataset(cfg32, "training", return_stack=True, crop_only=True)
    assert ds32[0]["stack"].dtype == np.float32
    cfg_off = cfg.clone()
    cfg_off.DATALOADER.SCENE_CACHE = False
    ds_off = MultimodalCDDataset(cfg_off, "training", return_stack=True,
                                 crop_only=True)
    assert ds_off[0]["stack"].dtype == np.float32


def test_cache_concurrent_build_safe(fixture_dataset, tmp_path):
    """Two builders racing on the same cache entry must both succeed with a
    valid file (unique tmp names + atomic replace, review finding 2)."""
    import threading

    meta = geofiles.load_json(fixture_dataset / "metadata.json")
    caches = [SceneCache(fixture_dataset, meta, [0, 1], [2, 1, 0, 3],
                         cache_dir=tmp_path / "shared") for _ in range(2)]
    ts = meta[TRAIN_AOIS[0]][0]
    results = [None, None]

    def build(i):
        results[i] = caches[i].load(TRAIN_AOIS[0], "s2", ts["year"], ts["month"])

    threads = [threading.Thread(target=build, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    np.testing.assert_array_equal(results[0], results[1])
    # no stray tmp files left behind
    leftovers = [p for p in (tmp_path / "shared").iterdir()
                 if not (p.suffix in (".npy", ".json"))]
    assert not leftovers


def test_profiler_hook_fires_on_stride(cfg, tmp_path, monkeypatch):
    """START must trigger with >= so STEPS_PER_EXECUTION strides don't skip
    it (review finding 6)."""
    from multimodal_siamese_cd_tpu.trainers import ProfilerHook

    events = []
    monkeypatch.setattr(jax.profiler, "start_trace",
                        lambda d: events.append(("start", d)))
    monkeypatch.setattr(jax.profiler, "stop_trace",
                        lambda: events.append(("stop",)))
    cfg.TRAINER.PROFILE_DIR = str(tmp_path)
    hook = ProfilerHook(cfg)
    for step in range(4, 64, 4):  # strides of 4: never equals 10 exactly
        hook.step(step)
    hook.close()
    assert ("start", str(tmp_path)) in events
    assert ("stop",) in events


def test_semisup_window_means_masking():
    """Component-loss means must ignore batches lacking the partition
    (review finding 8)."""
    from multimodal_siamese_cd_tpu.trainers import _semisup_window_means

    sets = {
        "fusion_loss": [0.8, 0.0], "stream1_loss": [0.6, 0.0],
        "stream2_loss": [0.4, 0.0], "sup_loss": [0.5, 0.0],
        "cons_loss": [0.0, 0.3], "loss": [0.5, 0.3],
    }
    label_counts = [(2.0, 0.0), (0.0, 2.0)]  # batch1 all labeled, batch2 none
    out = _semisup_window_means(sets, label_counts)
    assert out["fusion_loss"] == pytest.approx(0.8)   # not dragged to 0.4
    assert out["cons_loss"] == pytest.approx(0.3)
    assert out["loss"] == pytest.approx(0.4)
    assert out["labeled_percentage"] == pytest.approx(50.0)


def test_dropout_resamples_each_step():
    """Round-2 advisor finding: the trainer hands the SAME PRNGKey(SEED) to
    every optimizer step, so dropout must be decorrelated by folding in the
    step counter inside the step body (train_lib fold_in(rng, state.step)).
    Pin that siamunet_diff — the only dropout-using model — actually sees a
    different mask at consecutive step counters, and the identical mask when
    the counter repeats (determinism)."""
    cfg = load_cfg("debug")
    cfg.MODEL.TYPE = "siamunet_diff"
    cfg.TRAINER.PRECISION = "fp32"
    cfg.TRAINER.BATCH_SIZE = 2
    # identity augmentation: any loss difference is dropout's alone
    for k in ("RANDOM_FLIP", "RANDOM_ROTATE", "COLOR_SHIFT",
              "GAMMA_CORRECTION"):
        setattr(cfg.AUGMENTATION, k, False)

    model, state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    step = train_lib.make_supervised_train_step(model, cfg, mesh=None,
                                                jit=False)
    host = np.random.default_rng(0)
    stack = np.asarray(host.uniform(0, 1, (2, 15, 32, 32)), np.float32)
    stack[:, 12:] = (stack[:, 12:] > 0.8).astype(np.float32)
    lab = np.ones((2,), np.float32)
    rng = jax.random.PRNGKey(cfg.SEED)

    _, m_a = step(state, stack, lab, rng)
    _, m_b = step(state, stack, lab, rng)
    assert float(m_a["loss"]) == float(m_b["loss"])  # same counter: same mask

    bumped = state.replace(step=state.step + 1)
    _, m_next = step(bumped, stack, lab, rng)
    assert float(m_next["loss"]) != float(m_a["loss"])  # resampled mask
