"""AOT serving bundle: export -> load -> predict parity with the live model."""

import numpy as np
import pytest


def _cfg(model_type="siameseunet"):
    from multimodal_siamese_cd_tpu.config import load_cfg

    cfg = load_cfg("base")
    cfg.MODEL.TYPE = model_type
    cfg.MODEL.TOPOLOGY = [8, 16]
    cfg.TRAINER.PRECISION = "fp32"
    return cfg


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    import jax
    from multimodal_siamese_cd_tpu import serving, train_lib

    cfg = _cfg()
    model, state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    path = tmp_path_factory.mktemp("serving") / "bundle.zip"
    serving.export_serving_bundle(model, state, cfg, path,
                                  buckets=((32, 32), (64, 64)))
    return cfg, model, state, path


def test_bucket_sized_scene_matches_live_forward(bundle):
    from multimodal_siamese_cd_tpu import serving, train_lib

    cfg, model, state, path = bundle
    served = serving.load_serving_bundle(path)
    rng = np.random.default_rng(3)
    x1 = rng.uniform(0, 1, (32, 32, 6)).astype(np.float32)
    x2 = rng.uniform(0, 1, (32, 32, 6)).astype(np.float32)

    got = served.predict(x1, x2)
    want = np.asarray(train_lib.eval_forward(
        model, state.params, state.batch_stats, x1[None], x2[None]))[0, ..., 0]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_padded_routing_and_crop(bundle):
    """A 40x56 scene routes to the 64-bucket, zero-pads trailing edges and
    crops back — same protocol as evaluation.pad_to_bucket."""
    from multimodal_siamese_cd_tpu import serving, train_lib

    cfg, model, state, path = bundle
    served = serving.load_serving_bundle(path)
    rng = np.random.default_rng(5)
    x1 = rng.uniform(0, 1, (40, 56, 6)).astype(np.float32)
    x2 = rng.uniform(0, 1, (40, 56, 6)).astype(np.float32)

    got = served.predict(x1, x2)
    assert got.shape == (40, 56)
    pad = lambda a: np.pad(a, ((0, 24), (0, 8), (0, 0)))[None]
    want = np.asarray(train_lib.eval_forward(
        model, state.params, state.batch_stats,
        pad(x1), pad(x2)))[0, :40, :56, 0]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_oversized_scene_raises(bundle):
    from multimodal_siamese_cd_tpu import serving

    _, _, _, path = bundle
    served = serving.load_serving_bundle(path)
    x = np.zeros((100, 100, 6), np.float32)
    with pytest.raises(ValueError, match="exceeds every exported bucket"):
        served.predict(x, x)


def test_channel_mismatch_raises(bundle):
    from multimodal_siamese_cd_tpu import serving

    _, _, _, path = bundle
    served = serving.load_serving_bundle(path)
    x = np.zeros((32, 32, 4), np.float32)
    with pytest.raises(ValueError, match="expected 6 channels"):
        served.predict(x, x)


def test_corrupt_bundle_raises_named_valueerror(tmp_path):
    """Garbage or member-stripped bundle files must raise a ValueError that
    names the bundle (raw BadZipFile/KeyError identify neither the file
    nor that a serving bundle is involved); a missing file keeps its
    FileNotFoundError."""
    import zipfile

    from multimodal_siamese_cd_tpu import serving

    f = tmp_path / "b.zip"
    with pytest.raises(FileNotFoundError):
        serving.load_serving_bundle(f)
    f.write_bytes(b"PKgarbage" * 50)
    with pytest.raises(ValueError, match="serving bundle .*b.zip"):
        serving.load_serving_bundle(f)
    with zipfile.ZipFile(f, "w") as z:   # valid zip, missing members
        z.writestr("meta.json", "{}")
    with pytest.raises(ValueError, match="serving bundle .*b.zip"):
        serving.load_serving_bundle(f)


def test_multihead_model_serves_first_head(tmp_path):
    """WhateverNet's eval forward returns the fusion head only; the bundle
    must serve exactly that (first tuple element + sigmoid)."""
    import jax
    from multimodal_siamese_cd_tpu import serving, train_lib

    cfg = _cfg("whatevernet")
    model, state = train_lib.create_train_state(cfg, jax.random.PRNGKey(1))
    path = tmp_path / "wn.zip"
    serving.export_serving_bundle(model, state, cfg, path,
                                  buckets=((32, 32),))
    served = serving.load_serving_bundle(path)

    rng = np.random.default_rng(7)
    x1 = rng.uniform(0, 1, (32, 32, 6)).astype(np.float32)
    x2 = rng.uniform(0, 1, (32, 32, 6)).astype(np.float32)
    got = served.predict(x1, x2)
    want = np.asarray(train_lib.eval_forward(
        model, state.params, state.batch_stats, x1[None], x2[None]))[0, ..., 0]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_cli_roundtrip(tmp_path):
    """tools/export_serving.py end to end against a saved checkpoint."""
    import subprocess
    import sys
    from pathlib import Path

    import jax
    from multimodal_siamese_cd_tpu import checkpoints, train_lib
    from multimodal_siamese_cd_tpu.config import load_cfg

    cfg = load_cfg("debug")
    cfg.NAME = "debug"
    cfg.PATHS.OUTPUT = str(tmp_path)
    cfg.PATHS.DATASET = str(tmp_path)
    cfg.TRAINER.PRECISION = "fp32"
    model, state = train_lib.create_train_state(cfg, jax.random.PRNGKey(2))
    checkpoints.save_checkpoint(state, 1, 7, cfg)

    repo = Path(__file__).resolve().parent.parent
    dest = tmp_path / "bundle.zip"
    proc = subprocess.run(
        [sys.executable, str(repo / "tools" / "export_serving.py"),
         "-c", "debug", "-p", "proj", "-o", str(tmp_path), "-d", str(tmp_path),
         "--dest", str(dest), "--epoch", "1", "--buckets", "32",
         "--platforms", "cpu", "TRAINER.PRECISION", "fp32"],
        capture_output=True, text=True,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"})
    assert proc.returncode == 0, proc.stderr
    assert dest.exists()

    from multimodal_siamese_cd_tpu import serving
    served = serving.load_serving_bundle(dest)
    x = np.random.default_rng(0).uniform(0, 1, (32, 32, 6)).astype(np.float32)
    probs = served.predict(x, x)
    assert probs.shape == (32, 32)
    assert np.all((probs >= 0) & (probs <= 1))


def test_bf16_weights_bundle(bundle, tmp_path):
    """bf16 weight storage: roughly half the bundle, predictions within
    bf16 weight-rounding of the fp32 bundle."""
    from multimodal_siamese_cd_tpu import serving

    cfg, model, state, fp32_path = bundle
    path = tmp_path / "bf16.zip"
    serving.export_serving_bundle(model, state, cfg, path,
                                  buckets=((32, 32),), weights_dtype="bf16")
    small = serving.load_serving_bundle(path)
    full = serving.load_serving_bundle(fp32_path)
    assert small.meta["weights_dtype"] == "bf16"
    assert len(small.meta["bf16_leaves"]) > 0

    rng = np.random.default_rng(5)
    x1 = rng.uniform(0, 1, (32, 32, 6)).astype(np.float32)
    x2 = rng.uniform(0, 1, (32, 32, 6)).astype(np.float32)
    np.testing.assert_allclose(small.predict(x1, x2), full.predict(x1, x2),
                               atol=0.02)


def test_batched_artifacts_predict_batch(tmp_path):
    """Batched buckets: predict_batch must match per-scene predict for a
    mixed-size, partial-final-chunk workload."""
    import jax
    from multimodal_siamese_cd_tpu import serving, train_lib

    cfg = _cfg()
    model, state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    path = tmp_path / "batched.zip"
    serving.export_serving_bundle(model, state, cfg, path,
                                  buckets=((32, 32), (64, 64)),
                                  batch_sizes=(1, 4))
    served = serving.load_serving_bundle(path)
    assert served.batch_sizes == [1, 4]

    rng = np.random.default_rng(9)
    sizes = [(32, 32), (30, 28), (64, 64), (40, 50), (32, 32), (33, 40)]
    pairs = [
        (rng.uniform(0, 1, (h, w, 6)).astype(np.float32),
         rng.uniform(0, 1, (h, w, 6)).astype(np.float32))
        for h, w in sizes]

    batch_out = served.predict_batch(pairs)
    for (x1, x2), got in zip(pairs, batch_out):
        assert got.shape == x1.shape[:2]
        np.testing.assert_allclose(got, served.predict(x1, x2), atol=1e-6)


def test_batch_one_always_exported(tmp_path):
    """predict() routes through the batch-1 artifact, so export must
    force-include batch size 1 even when the caller asks only for larger
    batches (review finding)."""
    import jax
    from multimodal_siamese_cd_tpu import serving, train_lib

    cfg = _cfg()
    model, state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    path = tmp_path / "nob1.zip"
    serving.export_serving_bundle(model, state, cfg, path,
                                  buckets=((32, 32),), batch_sizes=(4,))
    served = serving.load_serving_bundle(path)
    assert served.batch_sizes == [1, 4]
    rng = np.random.default_rng(2)
    x1 = rng.uniform(0, 1, (32, 32, 6)).astype(np.float32)
    x2 = rng.uniform(0, 1, (32, 32, 6)).astype(np.float32)
    assert served.predict(x1, x2).shape == (32, 32)
