"""Segmentation loss functions.

Same registry strings and formulas as the reference
(utils/loss_functions.py:6-198), re-expressed in JAX with one structural
change for TPU: every criterion accepts an optional per-sample ``mask``
and reduces via masked (weighted) sums. Boolean row indexing like the
reference's ``logits[is_labeled]`` (train_semisupervised.py:85-104) produces
dynamic shapes that cannot be jitted; a {0,1} mask over the batch axis is
numerically identical for these ratio losses and keeps the whole train step
one static XLA program.

All criteria take logits and apply sigmoid internally, except the MSE /
'L2' criterion which is applied to whatever it is given (the consistency
trainer feeds it probabilities, train_semisupervised.py:101-104).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import nn as jnn

EPS = 1e-6


def _flat_masked(y: jnp.ndarray, mask: jnp.ndarray | None) -> jnp.ndarray:
    """Flatten; if mask given, zero out unselected samples.

    ``mask`` is per-sample over the leading (batch) axis with values in
    {0, 1}; it broadcasts across the remaining axes.
    """
    if mask is None:
        return y.reshape(-1)
    mask = mask.reshape(mask.shape + (1,) * (y.ndim - mask.ndim)).astype(y.dtype)
    return (y * mask).reshape(-1)


def _mask_count(shape, mask) -> jnp.ndarray:
    """Number of selected elements (for mean-type losses). Each mask entry
    covers the axes it does NOT span (``_flat_masked`` broadcasts the same
    way), so a (B,) per-sample mask counts H*W*C elements per selected
    sample and a (B,H,W) spatial mask counts C per selected pixel."""
    if mask is None:
        count = 1
        for d in shape:
            count *= d
        return jnp.asarray(count, jnp.float32)
    per_entry = 1
    for d in shape[mask.ndim:]:
        per_entry *= d
    return jnp.sum(mask.astype(jnp.float32)) * per_entry


# --- binary criteria (sigmoid inside) ----------------------------------------

def bce_with_logits_loss(y_logit, y_true, mask=None):
    """Mean binary cross entropy on logits (torch BCEWithLogitsLoss parity).

    Uses the numerically stable max(x,0) - x*z + log1p(exp(-|x|)) form.
    """
    x = y_logit
    z = y_true
    elem = jnp.maximum(x, 0) - x * z + jnp.log1p(jnp.exp(-jnp.abs(x)))
    elem = _flat_masked(elem, mask)
    return jnp.sum(elem) / jnp.maximum(_mask_count(y_logit.shape, mask), 1.0)


def soft_dice_loss(y_logit, y_true, mask=None):
    """reference loss_functions.py:36-44."""
    p = _flat_masked(jnn.sigmoid(y_logit), mask)
    t = _flat_masked(y_true, mask)
    intersection = jnp.sum(p * t)
    return 1.0 - (2.0 * intersection + EPS) / (jnp.sum(p) + jnp.sum(t) + EPS)


def soft_dice_squared_sum_loss(y_logit, y_true, mask=None):
    """reference loss_functions.py:48-56 — author-flagged as broken and
    currently identical to soft_dice_loss; identity preserved for parity."""
    return soft_dice_loss(y_logit, y_true, mask)


def jaccard_like_loss(y_logit, y_true, mask=None):
    """reference loss_functions.py:117-126."""
    p = _flat_masked(jnn.sigmoid(y_logit), mask)
    t = _flat_masked(y_true, mask)
    intersection = jnp.sum(p * t)
    denom = jnp.sum(p * p) + jnp.sum(t * t) - intersection + EPS
    return 1.0 - (2.0 * intersection) / denom


def dice_like_loss(y_logit, y_true, mask=None):
    """reference loss_functions.py:129-138."""
    p = _flat_masked(jnn.sigmoid(y_logit), mask)
    t = _flat_masked(y_true, mask)
    intersection = jnp.sum(p * t)
    denom = jnp.sum(p * p) + jnp.sum(t * t) + EPS
    return 1.0 - (2.0 * intersection) / denom


def power_jaccard_loss(y_logit, y_true, mask=None):
    """The default training loss (reference loss_functions.py:141-150;
    base.yaml MODEL.LOSS_TYPE)."""
    p = _flat_masked(jnn.sigmoid(y_logit), mask)
    t = _flat_masked(y_true, mask)
    intersection = jnp.sum(p * t)
    denom = jnp.sum(p * p) + jnp.sum(t * t) - intersection + EPS
    return 1.0 - intersection / denom


def iou_loss(y_logit, y_true, mask=None):
    """reference loss_functions.py:153-162."""
    p = _flat_masked(jnn.sigmoid(y_logit), mask)
    t = _flat_masked(y_true, mask)
    intersection = jnp.sum(p * t)
    union = jnp.sum(p) + jnp.sum(t) - intersection + EPS
    return 1.0 - intersection / union


def jaccard_like_balanced_loss(y_logit, y_true, mask=None):
    """reference loss_functions.py:165-181.

    With masking, the negative term treats unselected elements as
    (1-p)=(1-t)=0, matching row selection."""
    p = _flat_masked(jnn.sigmoid(y_logit), mask)
    t = _flat_masked(y_true, mask)
    one = _flat_masked(jnp.ones_like(y_true), mask)
    intersection = jnp.sum(p * t)
    denom = jnp.sum(p * p) + jnp.sum(t * t) - intersection + EPS
    piccard = 2.0 * intersection / denom
    np_, nt = one - p, one - t
    neg_intersection = jnp.sum(np_ * nt)
    neg_denom = jnp.sum(np_ * np_) + jnp.sum(nt * nt) - neg_intersection
    n_piccard = 2.0 * neg_intersection / neg_denom
    return 1.0 - piccard - n_piccard


def soft_dice_loss_balanced(y_logit, y_true, mask=None):
    """reference loss_functions.py:184-198."""
    p = _flat_masked(jnn.sigmoid(y_logit), mask)
    t = _flat_masked(y_true, mask)
    one = _flat_masked(jnp.ones_like(y_true), mask)
    intersection = jnp.sum(p * t)
    dice_pos = 2.0 * intersection / (jnp.sum(p) + jnp.sum(t) + EPS)
    neg_intersection = jnp.sum((one - p) * (one - t))
    dice_neg = 2.0 * neg_intersection / (jnp.sum(one - p) + jnp.sum(one - t) + EPS)
    return 1.0 - dice_pos - dice_neg


def mean_square_error_loss(y_pred, y_true, mask=None):
    """torch nn.MSELoss parity ('MeanSquareErrorLoss' and 'L2' registry keys,
    reference loss_functions.py:22-29). Applied to inputs as-is (no sigmoid)."""
    d = _flat_masked((y_pred - y_true) ** 2, mask)
    return jnp.sum(d) / jnp.maximum(_mask_count(y_pred.shape, mask), 1.0)


# --- multi-class criteria (softmax over the channel axis) --------------------
# NHWC layout on TPU: channels last, so softmax/reductions use axis=-1
# (the reference is NCHW with dim=1, loss_functions.py:59-114).

def cross_entropy_loss(y_logit, y_true, mask=None,
                       negative_weight: float = 1.0, positive_weight: float = 1.0):
    """Weighted multi-class cross entropy (torch nn.CrossEntropyLoss parity,
    reference loss_functions.py:9-13). ``y_logit``: (..., C); ``y_true``:
    integer class indices (...,). Weighted-mean normalization matches torch:
    sum(w[t]*nll) / sum(w[t])."""
    weights = jnp.asarray([negative_weight, positive_weight], y_logit.dtype)
    n_cls = y_logit.shape[-1]
    if n_cls < 2:
        # a 1-channel softmax is identically 1 and class index 1 would clip
        # — the reference's torch path fails the same way; fail clearly
        raise ValueError(
            "CrossEntropyLoss needs multi-class logits (C >= 2, got "
            f"{n_cls}); the binary change heads use BCEWithLogitsLoss / "
            "the Jaccard-family losses")
    if n_cls > 2:
        weights = jnp.concatenate(
            [weights, jnp.ones((n_cls - 2,), y_logit.dtype)])
    logp = jnn.log_softmax(y_logit, axis=-1)
    if y_true.ndim == y_logit.ndim and y_true.shape[-1] == 1:
        y_true = y_true[..., 0]  # accept the trainers' (..., 1) label plane
    y_idx = y_true.astype(jnp.int32)
    nll = -jnp.take_along_axis(logp, y_idx[..., None], axis=-1)[..., 0]
    w = weights[y_idx]
    if mask is not None:
        m = mask.reshape(mask.shape + (1,) * (nll.ndim - mask.ndim))
        w = w * m.astype(w.dtype)
    return jnp.sum(w * nll) / jnp.maximum(jnp.sum(w), EPS)


def soft_dice_loss_multi_class(y_logit, y_true, mask=None):
    """reference loss_functions.py:59-69 (sum dims are batch+spatial)."""
    return 1.0 - jnp.mean(_soft_dice_multi_class_terms(y_logit, y_true, mask))


def _soft_dice_multi_class_terms(y_logit, y_true, mask):
    """Shared per-class dice terms of the two multi-class dice losses."""
    p = jnn.softmax(y_logit, axis=-1)
    if mask is not None:
        m = mask.reshape(mask.shape + (1,) * (p.ndim - mask.ndim)).astype(p.dtype)
        p, y_true = p * m, y_true * m
    sum_dims = tuple(range(y_logit.ndim - 1))
    intersection = jnp.sum(y_true * p, axis=sum_dims)
    denom = jnp.clip(jnp.sum(y_true, axis=sum_dims) + jnp.sum(p, axis=sum_dims),
                     EPS, None)
    return 2.0 * intersection / denom


def soft_dice_loss_multi_class_debug(y_logit, y_true, mask=None):
    """reference loss_functions.py:72-83 — also returns per-class terms."""
    dice = _soft_dice_multi_class_terms(y_logit, y_true, mask)
    return 1.0 - jnp.mean(dice), 1.0 - dice


def generalized_soft_dice_loss_multi_class(y_logit, y_true, mask=None):
    """reference loss_functions.py:86-99."""
    p = jnn.softmax(y_logit, axis=-1)
    if mask is not None:
        m = mask.reshape(mask.shape + (1,) * (p.ndim - mask.ndim)).astype(p.dtype)
        p, y_true = p * m, y_true * m
    eps = 1e-12
    sum_dims = tuple(range(y_logit.ndim - 1))
    ysum = jnp.sum(y_true, axis=sum_dims)
    wc = 1.0 / (ysum ** 2 + eps)
    intersection = jnp.sum(jnp.sum(y_true * p, axis=sum_dims) * wc)
    denom = jnp.sum((ysum + jnp.sum(p, axis=sum_dims)) * wc)
    return 1.0 - 2.0 * intersection / denom


def jaccard_like_loss_multi_class(y_logit, y_true, mask=None):
    """reference loss_functions.py:102-114."""
    p = jnn.softmax(y_logit, axis=-1)
    if mask is not None:
        m = mask.reshape(mask.shape + (1,) * (p.ndim - mask.ndim)).astype(p.dtype)
        p, y_true = p * m, y_true * m
    sum_dims = tuple(range(y_logit.ndim - 1))
    intersection = jnp.sum(y_true * p, axis=sum_dims)
    denom = (jnp.sum(y_true ** 2 + p ** 2, axis=sum_dims)
             + jnp.sum(y_true * p, axis=sum_dims) + EPS)
    return 1.0 - jnp.mean(2.0 * intersection / denom)


# --- registry -----------------------------------------------------------------

def get_criterion(loss_type: str, negative_weight: float = 1.0,
                  positive_weight: float = 1.0):
    """Loss registry keyed by the reference's config strings
    (loss_functions.py:6-33)."""
    if loss_type == 'BCEWithLogitsLoss':
        return bce_with_logits_loss
    if loss_type == 'CrossEntropyLoss':
        def weighted_ce(y_logit, y_true, mask=None):
            return cross_entropy_loss(y_logit, y_true, mask,
                                      negative_weight, positive_weight)
        return weighted_ce
    if loss_type == 'SoftDiceLoss':
        return soft_dice_loss
    if loss_type == 'SoftDiceSquaredSumLoss':
        return soft_dice_squared_sum_loss
    if loss_type == 'SoftDiceBalancedLoss':
        return soft_dice_loss_balanced
    if loss_type == 'PowerJaccardLoss':
        return power_jaccard_loss
    if loss_type in ('MeanSquareErrorLoss', 'L2'):
        return mean_square_error_loss
    if loss_type == 'IoULoss':
        return iou_loss
    if loss_type == 'DiceLikeLoss':
        return dice_like_loss
    raise Exception(f'unknown loss {loss_type}')
