"""Pallas ops tests (interpret mode on CPU; hardware validation happens in
the bench/eval paths on the real chip)."""

import numpy as np
import pytest

from multimodal_siamese_cd_tpu.ops.confusion import (
    confusion_counts,
    confusion_counts_pallas,
    reference_counts,
)


@pytest.mark.parametrize("n,n_thr", [(100, 1), (1000, 3), (300000, 2)])
def test_pallas_confusion_matches_reference(n, n_thr):
    rng = np.random.default_rng(n)
    y_true = (rng.uniform(size=n) > 0.8).astype(np.float32)
    y_prob = rng.uniform(size=n).astype(np.float32)
    valid = (rng.uniform(size=n) > 0.1).astype(np.float32)
    thr = np.linspace(0.3, 0.7, n_thr).astype(np.float32)
    got = confusion_counts_pallas(y_true, y_prob, thr, valid, interpret=True)
    want = reference_counts(y_true, y_prob, thr, valid)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), w)


def test_pallas_confusion_no_mask():
    rng = np.random.default_rng(1)
    y_true = (rng.uniform(size=4096) > 0.5).astype(np.float32)
    y_prob = rng.uniform(size=4096).astype(np.float32)
    thr = np.array([0.5], np.float32)
    got = confusion_counts_pallas(y_true, y_prob, thr, interpret=True)
    want = reference_counts(y_true, y_prob, thr)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), w)
    total = sum(float(np.asarray(g)[0]) for g in got)
    assert total == 4096


def test_dispatcher_fallback_on_cpu():
    y_true = np.array([1.0, 0.0, 1.0, 0.0], np.float32)
    y_prob = np.array([0.9, 0.9, 0.1, 0.1], np.float32)
    tp, tn, fp, fn = confusion_counts(y_true, y_prob, np.array([0.5]))
    assert (float(tp[0]), float(tn[0]), float(fp[0]), float(fn[0])) == (1, 1, 1, 1)


def test_pallas_conv3x3_matches_lax_conv():
    # archived experiment (tools/pallas_conv3x3_experiment.py — final
    # negative, see BASELINE.md); the correctness pin stays so the worked
    # DMA/tap-pack example keeps compiling in interpret mode
    import jax
    import jax.numpy as jnp

    from conftest import import_tool

    mod = import_tool("pallas_conv3x3_experiment")
    conv3x3_pallas, conv3x3_reference = (mod.conv3x3_pallas,
                                         mod.conv3x3_reference)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(2, 32, 64, 128)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 128, 16)) * 0.05, jnp.float32)
    got = conv3x3_pallas(x, w, tile_rows=16, interpret=True)
    want = conv3x3_reference(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16))
    diff = np.abs(np.asarray(got, np.float32)
                  - np.asarray(want, np.float32)).max()
    assert diff < 0.05, diff
