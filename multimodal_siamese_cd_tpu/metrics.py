"""Evaluation metrics.

Port surface from the reference (utils/metrics.py):

  * :class:`MultiThresholdMetric` — confusion counts accumulated over
    samples at T thresholds (metrics.py:5-66). Implemented as a functional
    accumulator over jnp arrays so it can live inside jitted eval steps,
    with an optional validity mask for padded scenes (XLA needs static
    shapes, so variable-size eval scenes are padded and masked instead).
    The reference's FP/FN formulas are swapped (metrics.py:30-31 counts
    ``y_true & ~pred`` as FP); this implementation uses the correct
    definitions, so F1 matches the reference exactly while precision and
    recall are swapped relative to its (mislabeled) logs.
  * functional threshold metrics in jnp (metrics.py:69-113),
  * numpy probability metrics used by offline assessment
    (metrics.py:116-150), including the reference's ``precsision_from_prob``
    spelling, kept as an alias.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

CLAMP = 10e-05  # reference denominator clamp (metrics.py:39,49,65)


class MultiThresholdMetric:
    """Accumulates TP/TN/FP/FN per threshold across added samples.

    Thresholding replicates the reference's round-offset formulation
    ``round(y_pred - threshold + 0.5)`` (metrics.py:26) including its
    banker's-rounding edge behaviour at exact threshold equality.
    """

    def __init__(self, thresholds):
        self._thresholds = jnp.asarray(thresholds, jnp.float32).reshape(-1)
        n = self._thresholds.shape[0]
        self.TP = jnp.zeros((n,), jnp.float32)
        self.TN = jnp.zeros((n,), jnp.float32)
        self.FP = jnp.zeros((n,), jnp.float32)
        self.FN = jnp.zeros((n,), jnp.float32)

    @property
    def thresholds(self):
        return self._thresholds

    def add_sample(self, y_true, y_pred, valid_mask=None) -> None:
        tp, tn, fp, fn = confusion_at_thresholds(
            y_true, y_pred, self._thresholds, valid_mask)
        # route through add_counts so the stored totals are ALWAYS host
        # float64: a jnp `+` here would silently demote totals accumulated
        # by the fused path back to float32 when the two paths mix. Stack
        # first so the device-to-host transfer is ONE fetch, not four — on
        # the tunneled TPU each fetch is a ~25 ms RTT, so four serial
        # fetches per scene cost ~100 ms on the item-path eval
        counts = np.asarray(jnp.stack([tp, tn, fp, fn]))
        self.add_counts(*counts)

    def add_counts(self, tp, tn, fp, fn) -> None:
        """Accumulate precomputed per-threshold ``(n_thresholds,)`` counts —
        the fused eval path (evaluation.py) computes confusion on device
        inside the forward dispatch and ships only these sums. Host-side
        float64 accumulation keeps the STORED totals exact past float32's
        2^24 integer range (a multi-thousand-scene split exceeds it in TN);
        the derived metrics below still compute in float32 like the
        reference's torch path — a bounded one-time ~1e-7 rounding at the
        division, not the unbounded drift of float32 accumulation."""
        self.TP = np.asarray(self.TP, np.float64) + np.asarray(tp, np.float64)
        self.TN = np.asarray(self.TN, np.float64) + np.asarray(tn, np.float64)
        self.FP = np.asarray(self.FP, np.float64) + np.asarray(fp, np.float64)
        self.FN = np.asarray(self.FN, np.float64) + np.asarray(fn, np.float64)

    @property
    def precision(self):
        return self.TP / jnp.clip(self.TP + self.FP, CLAMP, None)

    @property
    def recall(self):
        return self.TP / jnp.clip(self.TP + self.FN, CLAMP, None)

    def compute_basic_metrics(self):
        """False positive rate and false negative rate (metrics.py:53-62)."""
        false_pos_rate = self.FP / (self.FP + self.TN)
        false_neg_rate = self.FN / (self.FN + self.TP)
        return false_pos_rate, false_neg_rate

    def compute_f1(self):
        p, r = self.precision, self.recall
        return 2 * p * r / jnp.clip(p + r, CLAMP, None)


def confusion_at_thresholds(y_true, y_pred, thresholds, valid_mask=None):
    """Pure function computing (TP, TN, FP, FN) summed over all elements of
    one sample, per threshold. Jit/vmap friendly; used by the fused eval path.
    """
    t = jnp.asarray(y_true).reshape(-1)[None, :] > 0.5
    p = jnp.asarray(y_pred).reshape(-1)[None, :]
    thr = jnp.asarray(thresholds, jnp.float32).reshape(-1, 1)
    pred = jnp.round(p - thr + 0.5) >= 1.0
    if valid_mask is None:
        valid = jnp.ones(t.shape[1:], jnp.float32)[None, :]
    else:
        valid = jnp.asarray(valid_mask, jnp.float32).reshape(-1)[None, :]
    tp = jnp.sum((t & pred) * valid, axis=1)
    tn = jnp.sum((~t & ~pred) * valid, axis=1)
    fp = jnp.sum((~t & pred) * valid, axis=1)
    fn = jnp.sum((t & ~pred) * valid, axis=1)
    return tp, tn, fp, fn


# --- functional rounded-probability metrics (reference metrics.py:69-113) ----

def true_pos(y_true, y_pred, dim=0):
    return jnp.sum(y_true * jnp.round(y_pred), axis=dim)


def false_pos(y_true, y_pred, dim=0):
    return jnp.sum((1.0 - y_true) * jnp.round(y_pred), axis=dim)


def false_neg(y_true, y_pred, dim=0):
    return jnp.sum(y_true * (1.0 - jnp.round(y_pred)), axis=dim)


def precision(y_true, y_pred, dim):
    tp = true_pos(y_true, y_pred, dim)
    fp = false_pos(y_true, y_pred, dim)
    return tp / jnp.clip(tp + fp, CLAMP, None)


def recall(y_true, y_pred, dim):
    tp = true_pos(y_true, y_pred, dim)
    fn = false_neg(y_true, y_pred, dim)
    return tp / jnp.clip(tp + fn, CLAMP, None)


def f1_score(gts, preds, multi_threshold_mode: bool = False, dim=(-1, -2),
             **legacy):
    # accept the reference API's misspelled keyword (utils/metrics.py:97),
    # like the precsision_from_prob alias below
    multi_threshold_mode = legacy.pop("multi_threashold_mode",
                                      multi_threshold_mode)
    if legacy:
        raise TypeError(f"unexpected keyword arguments: {sorted(legacy)}")
    gts = jnp.asarray(gts, jnp.float32)
    preds = jnp.asarray(preds, jnp.float32)
    if multi_threshold_mode:
        gts = jnp.broadcast_to(gts[:, None, ...], preds.shape)
    r = recall(gts, preds, dim)
    p = precision(gts, preds, dim)
    return 2.0 * r * p / jnp.clip(r + p, CLAMP, None)


# --- numpy probability metrics for offline assessment ------------------------
# (reference metrics.py:116-150)

def true_positives_from_prob(y_prob: np.ndarray, y_true: np.ndarray,
                             threshold: float = 0.5):
    y_pred = y_prob > threshold
    return np.sum(np.logical_and(y_pred, y_true))


def false_positives_from_prob(y_prob: np.ndarray, y_true: np.ndarray,
                              threshold: float = 0.5):
    y_pred = y_prob > threshold
    return np.sum(np.logical_and(y_pred, np.logical_not(y_true)))


def false_negatives_from_prob(y_prob: np.ndarray, y_true: np.ndarray,
                              threshold: float = 0.5):
    y_pred = y_prob > threshold
    return np.sum(np.logical_and(np.logical_not(y_pred), y_true))


def precision_from_prob(y_prob: np.ndarray, y_true: np.ndarray,
                        threshold: float = 0.5):
    tp = true_positives_from_prob(y_prob, y_true, threshold)
    fp = false_positives_from_prob(y_prob, y_true, threshold)
    return tp / (tp + fp)


# The reference spells it 'precsision_from_prob' (metrics.py:137); keep the
# alias so code written against the reference API works.
precsision_from_prob = precision_from_prob


def recall_from_prob(y_prob: np.ndarray, y_true: np.ndarray,
                     threshold: float = 0.5):
    tp = true_positives_from_prob(y_prob, y_true, threshold)
    fn = false_negatives_from_prob(y_prob, y_true, threshold)
    return tp / (tp + fn)


def f1_score_from_prob(y_prob: np.ndarray, y_true: np.ndarray,
                       threshold: float = 0.5):
    p = precision_from_prob(y_prob, y_true, threshold)
    r = recall_from_prob(y_prob, y_true, threshold)
    return 2 * (p * r) / (p + r)


def root_mean_square_error(y_pred: np.ndarray, y_true: np.ndarray):
    return np.sqrt(np.sum(np.square(y_pred - y_true)) / np.size(y_true))


def strict_confusion_counts(y_true, y_prob, valid=None, threshold=0.5):
    """Jit/vmap-friendly ``(tp, fp, fn)`` at one threshold with the offline
    protocol's STRICT comparison (``pred = prob > thr``, ``gt = label >
    0.5``) — the ``*_from_prob`` semantics above, NOT
    :func:`confusion_at_thresholds`' round-offset parity with the torch
    training metric. Used by the fused dual-task assessment path."""
    t = jnp.asarray(y_true).reshape(-1) > 0.5
    pred = jnp.asarray(y_prob).reshape(-1) > threshold
    if valid is None:
        v = jnp.ones(t.shape, jnp.float32)
    else:
        v = jnp.asarray(valid, jnp.float32).reshape(-1)
    tp = jnp.sum((t & pred) * v)
    fp = jnp.sum((~t & pred) * v)
    fn = jnp.sum((t & ~pred) * v)
    return tp, fp, fn


def prob_metrics_from_counts(tp, fp, fn):
    """``(f1, precision, recall)`` from pooled strict-threshold confusion
    counts — the exact composition of the ``*_from_prob`` functions over
    pixel-pooled arrays: thresholding-then-summing commutes with pooling,
    so streaming count accumulation reproduces the reference's pooled-pixel
    protocol (same float64 divisions, same unclamped denominators)."""
    p = tp / (tp + fp)
    r = tp / (tp + fn)
    return 2 * (p * r) / (p + r), p, r
