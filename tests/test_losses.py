"""Loss function tests: hand-computed values, torch-formula cross-checks,
masked-reduction equivalence to boolean row selection, registry parity."""

import numpy as np
import pytest
import torch

from multimodal_siamese_cd_tpu import losses

RNG = np.random.default_rng(7)
LOGITS = RNG.standard_normal((4, 8, 8, 1)).astype(np.float32)
TARGETS = (RNG.uniform(size=(4, 8, 8, 1)) > 0.7).astype(np.float32)


def _torch_reference(loss_type, logits, targets):
    """Reference formulas (utils/loss_functions.py) evaluated in torch."""
    x = torch.from_numpy(logits)
    t = torch.from_numpy(targets)
    eps = 1e-6
    p = torch.sigmoid(x).flatten()
    tf = t.flatten()
    inter = (p * tf).sum()
    if loss_type == 'BCEWithLogitsLoss':
        return torch.nn.BCEWithLogitsLoss()(x, t)
    if loss_type in ('SoftDiceLoss', 'SoftDiceSquaredSumLoss'):
        return 1 - ((2.0 * inter + eps) / (p.sum() + tf.sum() + eps))
    if loss_type == 'PowerJaccardLoss':
        denom = (p ** 2 + tf ** 2).sum() - inter + eps
        return 1 - inter / denom
    if loss_type == 'IoULoss':
        union = (p + tf).sum() - inter + eps
        return 1 - inter / union
    if loss_type == 'DiceLikeLoss':
        return 1 - (2.0 * inter) / ((p ** 2 + tf ** 2).sum() + eps)
    if loss_type == 'SoftDiceBalancedLoss':
        dice_pos = 2.0 * inter / (p.sum() + tf.sum() + eps)
        ni = ((1 - p) * (1 - tf)).sum()
        dice_neg = 2 * ni / ((1 - p).sum() + (1 - tf).sum() + eps)
        return 1 - dice_pos - dice_neg
    if loss_type in ('MeanSquareErrorLoss', 'L2'):
        return torch.nn.MSELoss()(torch.sigmoid(x), torch.sigmoid(t))
    raise KeyError(loss_type)


@pytest.mark.parametrize("loss_type", [
    'BCEWithLogitsLoss', 'SoftDiceLoss', 'SoftDiceSquaredSumLoss',
    'PowerJaccardLoss', 'IoULoss', 'DiceLikeLoss', 'SoftDiceBalancedLoss',
])
def test_registry_matches_torch_formulas(loss_type):
    criterion = losses.get_criterion(loss_type)
    ours = float(criterion(LOGITS, TARGETS))
    ref = float(_torch_reference(loss_type, LOGITS, TARGETS))
    assert ours == pytest.approx(ref, rel=1e-5, abs=1e-6)


def test_mse_on_probs():
    # The consistency trainer feeds sigmoid probabilities to 'L2'
    # (train_semisupervised.py:101-104) — criterion must not re-sigmoid.
    criterion = losses.get_criterion('L2')
    a = 1 / (1 + np.exp(-LOGITS))
    b = 1 / (1 + np.exp(-TARGETS))
    ours = float(criterion(a, b))
    ref = float(torch.nn.MSELoss()(torch.from_numpy(a), torch.from_numpy(b)))
    assert ours == pytest.approx(ref, rel=1e-6)


def test_power_jaccard_hand_value():
    logits = np.array([[100.0, -100.0]], dtype=np.float32)  # probs ~ [1, 0]
    targets = np.array([[1.0, 0.0]], dtype=np.float32)
    # intersection=1, denom = (1+0)+(1+0)-1+eps = 1+eps → loss ~ 0
    assert float(losses.power_jaccard_loss(logits, targets)) == pytest.approx(0.0, abs=1e-5)
    targets_bad = np.array([[0.0, 1.0]], dtype=np.float32)
    # intersection=0 → loss = 1
    assert float(losses.power_jaccard_loss(logits, targets_bad)) == pytest.approx(1.0, abs=1e-5)


@pytest.mark.parametrize("loss_type", [
    'BCEWithLogitsLoss', 'SoftDiceLoss', 'PowerJaccardLoss', 'IoULoss',
    'DiceLikeLoss', 'SoftDiceBalancedLoss', 'L2',
])
def test_masked_equals_row_selection(loss_type):
    """Masked reduction must equal boolean-indexing the selected rows
    (the reference's logits[is_labeled] pattern)."""
    criterion = losses.get_criterion(loss_type)
    mask = np.array([1, 0, 1, 0], dtype=np.float32)
    sel = mask.astype(bool)
    masked = float(criterion(LOGITS, TARGETS, mask=mask))
    selected = float(criterion(LOGITS[sel], TARGETS[sel]))
    assert masked == pytest.approx(selected, rel=1e-5, abs=1e-6)


def test_cross_entropy_weighted_matches_torch():
    logits = RNG.standard_normal((2, 4, 4, 2)).astype(np.float32)
    target = RNG.integers(0, 2, size=(2, 4, 4)).astype(np.int64)
    ours = float(losses.cross_entropy_loss(logits, target,
                                           negative_weight=1.0, positive_weight=3.0))
    # torch wants NCHW
    ref = float(torch.nn.CrossEntropyLoss(weight=torch.tensor([1.0, 3.0]))(
        torch.from_numpy(logits).permute(0, 3, 1, 2), torch.from_numpy(target)))
    assert ours == pytest.approx(ref, rel=1e-5)


def test_multiclass_dice_matches_torch():
    logits = RNG.standard_normal((2, 4, 4, 3)).astype(np.float32)
    y = np.eye(3, dtype=np.float32)[RNG.integers(0, 3, size=(2, 4, 4))]
    ours = float(losses.soft_dice_loss_multi_class(logits, y))
    p = torch.softmax(torch.from_numpy(logits).permute(0, 3, 1, 2), dim=1)
    yt = torch.from_numpy(y).permute(0, 3, 1, 2)
    sum_dims = (0, 2, 3)
    inter = (yt * p).sum(dim=sum_dims)
    denom = (yt.sum(dim=sum_dims) + p.sum(dim=sum_dims)).clamp(1e-6)
    ref = float(1 - (2.0 * inter / denom).mean())
    assert ours == pytest.approx(ref, rel=1e-5)


def test_unknown_loss_raises():
    with pytest.raises(Exception, match="unknown loss"):
        losses.get_criterion('NotALoss')


def test_losses_are_jittable_and_differentiable():
    import jax

    for loss_type in ['PowerJaccardLoss', 'BCEWithLogitsLoss', 'IoULoss']:
        criterion = losses.get_criterion(loss_type)
        grad_fn = jax.jit(jax.grad(lambda x: criterion(x, TARGETS)))
        g = grad_fn(LOGITS)
        assert g.shape == LOGITS.shape
        assert np.isfinite(np.asarray(g)).all()


def test_masked_empty_selection_is_finite():
    """All-zero mask (no labeled samples in batch) must stay finite so the
    semi-supervised fallback arithmetic works under jit."""
    import jax

    criterion = losses.get_criterion('PowerJaccardLoss')
    mask = np.zeros((4,), np.float32)
    val = float(criterion(LOGITS, TARGETS, mask=mask))
    assert np.isfinite(val)
    g = jax.grad(lambda x: criterion(x, TARGETS, mask=mask))(LOGITS)
    assert np.isfinite(np.asarray(g)).all()
