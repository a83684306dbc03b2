"""Metric tests: confusion-count correctness (incl. the FP/FN fix vs the
reference), threshold semantics, padded-scene masking, numpy prob metrics."""

import numpy as np
import pytest

from multimodal_siamese_cd_tpu import metrics


def test_confusion_counts_correct():
    y_true = np.array([1, 1, 0, 0, 1, 0], np.float32)
    y_pred = np.array([0.9, 0.2, 0.8, 0.1, 0.7, 0.3], np.float32)
    m = metrics.MultiThresholdMetric([0.5])
    m.add_sample(y_true, y_pred)
    # pred@0.5: [1, 0, 1, 0, 1, 0]
    assert float(m.TP[0]) == 2   # true=1, pred=1
    assert float(m.FP[0]) == 1   # true=0, pred=1  (reference swaps this)
    assert float(m.FN[0]) == 1   # true=1, pred=0
    assert float(m.TN[0]) == 2
    assert float(m.precision[0]) == pytest.approx(2 / 3)
    assert float(m.recall[0]) == pytest.approx(2 / 3)
    assert float(m.compute_f1()[0]) == pytest.approx(2 / 3)
    fpr, fnr = m.compute_basic_metrics()
    assert float(fpr[0]) == pytest.approx(1 / 3)
    assert float(fnr[0]) == pytest.approx(1 / 3)


def test_f1_invariant_to_reference_swap():
    """The reference's swapped FP/FN leaves F1 unchanged; verify our F1 equals
    the F1 computed with the swapped formulas."""
    rng = np.random.default_rng(0)
    y_true = (rng.uniform(size=500) > 0.8).astype(np.float32)
    y_pred = rng.uniform(size=500).astype(np.float32)
    m = metrics.MultiThresholdMetric([0.3, 0.5, 0.7])
    m.add_sample(y_true, y_pred)
    ours = np.asarray(m.compute_f1())
    # swapped-definition F1 (reference metrics.py:30-31,64-66)
    tp, fp_sw, fn_sw = np.asarray(m.TP), np.asarray(m.FN), np.asarray(m.FP)
    p = tp / np.clip(tp + fp_sw, 1e-4, None)
    r = tp / np.clip(tp + fn_sw, 1e-4, None)
    theirs = 2 * p * r / np.clip(p + r, 1e-4, None)
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)


def test_multi_threshold_accumulation():
    m = metrics.MultiThresholdMetric(np.linspace(0.2, 0.8, 4))
    rng = np.random.default_rng(1)
    total = np.zeros(4)
    for _ in range(3):
        y_true = (rng.uniform(size=50) > 0.5).astype(np.float32)
        y_pred = rng.uniform(size=50).astype(np.float32)
        m.add_sample(y_true, y_pred)
        total += y_true.sum()
    # TP+FN per threshold equals total positives
    np.testing.assert_allclose(np.asarray(m.TP + m.FN), total, rtol=1e-6)


def test_valid_mask_excludes_padding():
    y_true = np.array([[1, 0], [1, 1]], np.float32)
    y_pred = np.array([[0.9, 0.9], [0.9, 0.9]], np.float32)
    valid = np.array([[1, 1], [0, 0]], np.float32)  # second row is padding
    m = metrics.MultiThresholdMetric([0.5])
    m.add_sample(y_true, y_pred, valid_mask=valid)
    assert float(m.TP[0]) == 1
    assert float(m.FP[0]) == 1
    assert float(m.FN[0]) == 0
    assert float(m.TN[0]) == 0


def test_threshold_edge_matches_torch_round_semantics():
    import torch

    y_pred = np.array([0.5, 0.49999, 0.50001], np.float32)
    y_true = np.ones(3, np.float32)
    m = metrics.MultiThresholdMetric([0.5])
    m.add_sample(y_true, y_pred)
    ref_pred = (torch.from_numpy(y_pred) - 0.5 + 0.5).round().bool().numpy()
    assert float(m.TP[0]) == ref_pred.sum()


def test_numpy_prob_metrics():
    y_prob = np.array([0.9, 0.6, 0.4, 0.1])
    y_true = np.array([True, False, True, False])
    assert metrics.true_positives_from_prob(y_prob, y_true) == 1
    assert metrics.false_positives_from_prob(y_prob, y_true) == 1
    assert metrics.false_negatives_from_prob(y_prob, y_true) == 1
    assert metrics.precision_from_prob(y_prob, y_true) == pytest.approx(0.5)
    assert metrics.precsision_from_prob(y_prob, y_true) == pytest.approx(0.5)  # sic alias
    assert metrics.recall_from_prob(y_prob, y_true) == pytest.approx(0.5)
    assert metrics.f1_score_from_prob(y_prob, y_true) == pytest.approx(0.5)
    assert metrics.root_mean_square_error(np.array([1.0, 0.0]),
                                          np.array([0.0, 0.0])) == pytest.approx(np.sqrt(0.5))


def test_confusion_jittable():
    import jax

    fn = jax.jit(lambda t, p: metrics.confusion_at_thresholds(t, p, np.array([0.5])))
    tp, tn, fp, fn_ = fn(np.ones(8, np.float32), np.full(8, 0.9, np.float32))
    assert float(tp[0]) == 8
