"""Augmentations: host-side crop pipeline + device-side jitted graph.

The reference runs everything per sample in Python workers
(utils/augmentations.py:6-32: crop -> flip -> rotate -> color-shift ->
gamma). Here the pipeline is split TPU-first:

  * **Host** (this module, numpy): cropping only — it must see the
    variable-size scene. ImportanceRandomCrop's 20-candidate label sums
    (augmentations.py:129-142, the reference's CPU hot spot) use direct
    per-window ``count_nonzero`` — measured FASTER than the integral-image
    variant it replaced, whose full-scene cumsum dominated at production
    scene sizes (see :func:`choose_crop_offset`).
  * **Device** (:func:`device_augment_batch`, jax): flips / rot90 / gamma /
    color-shift as one vmapped graph keyed by a PRNG key, fused by XLA into
    the training step — these are pure memory ops + elementwise math, free
    on TPU compared to per-sample numpy.

The host classes also implement flip/rot/color/gamma in numpy so the
host-only path (``compose_transformations``) reproduces the complete
reference pipeline for direct dataset users and for distribution tests.

All transforms operate on ``(imgs, buildings, change)`` tuples of HWC
float32 arrays — the same tuple routing as the reference (datasets.py:
149-150). ColorShift follows the sane semantics (jitter imagery, never
labels); the reference's tuple-position bug that would photometrically
jitter building labels (SURVEY defect 9) is not reproduced, and no shipped
config enables COLOR_SHIFT.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

IMPORTANCE_SAMPLE_SIZE = 20   # reference augmentations.py:132
IMPORTANCE_BALANCING = 5      # reference augmentations.py:133


def compose_transformations(cfg, no_augmentations: bool, rng: np.random.Generator | None = None,
                            crop_only: bool = False):
    """Build the host-side transform pipeline (reference augmentations.py:6-32).

    ``crop_only=True`` stops after the crop — used when the geometric /
    photometric tail runs on device instead.
    """
    rng = rng or np.random.default_rng()
    if no_augmentations:
        return Compose([EnsureFloat32()])

    transformations = []
    if cfg.AUGMENTATION.IMAGE_OVERSAMPLING_TYPE == 'none':
        transformations.append(UniformCrop(cfg.AUGMENTATION.CROP_SIZE, rng))
    else:
        transformations.append(ImportanceRandomCrop(cfg.AUGMENTATION.CROP_SIZE, rng))

    if not crop_only:
        if cfg.AUGMENTATION.RANDOM_FLIP:
            transformations.append(RandomFlip(rng))
        if cfg.AUGMENTATION.RANDOM_ROTATE:
            transformations.append(RandomRotate(rng))
        if cfg.AUGMENTATION.COLOR_SHIFT:
            transformations.append(ColorShift(rng))
        if cfg.AUGMENTATION.GAMMA_CORRECTION:
            transformations.append(GammaCorrection(rng))

    transformations.append(EnsureFloat32())
    return Compose(transformations)


class Compose:
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, args):
        for t in self.transforms:
            args = t(args)
        return args


class EnsureFloat32:
    """Terminal transform: contiguous float32 HWC arrays. (The reference ends
    with Numpy2Torch/CHW, augmentations.py:35-41; this framework is
    channels-last end to end.)"""

    def __call__(self, args):
        return tuple(np.ascontiguousarray(a, dtype=np.float32) for a in args)


def choose_crop_offset(label2d, height: int, width: int, crop_size: int,
                       rng: np.random.Generator, importance: bool,
                       window_count=None) -> tuple[int, int]:
    """Pick a crop origin: uniform, or importance-weighted by change-label
    window sums (reference augmentations.py:107-142 semantics) — the SINGLE
    implementation of the weighting scheme; the class-based transforms below
    delegate here. ``label2d`` may be any integer/float/bool 2-D array (or
    None for uniform). This is the loader's crop-first fast path: candidate
    scoring touches only the label plane, never the imagery.

    ``window_count(y, x, s)`` — an optional callable returning the positive-
    pixel count of the window at ``(y, x)`` — replaces ``label2d`` so callers
    can score candidates without materializing a full-scene label plane
    (dataset._get_cropped computes ``b2 > b1`` per window; O(crop²) per
    sample instead of O(scene²)). Draw order and weights are identical
    either way."""
    limit_y = max(1, height - crop_size)
    limit_x = max(1, width - crop_size)
    if not importance or (label2d is None and window_count is None):
        return int(rng.integers(0, limit_y)), int(rng.integers(0, limit_x))
    ys = rng.integers(0, limit_y, size=IMPORTANCE_SAMPLE_SIZE)
    xs = rng.integers(0, limit_x, size=IMPORTANCE_SAMPLE_SIZE)
    s = min(crop_size, height, width)
    if window_count is None:
        # Direct window counts beat an integral image for 20 candidates: 20
        # SIMD count_nonzero passes over 256² bools ≈ 1.3 MB touched, vs two
        # full-scene cumsum passes (the profiled hot spot).
        def window_count(y, x, s):
            return np.count_nonzero(label2d[y:y + s, x:x + s])
    sums = np.array([window_count(y, x, s)
                     for y, x in zip(ys, xs)], np.float64)
    weights = sums + IMPORTANCE_BALANCING
    weights /= weights.sum()
    idx = rng.choice(IMPORTANCE_SAMPLE_SIZE, p=weights)
    return int(ys[idx]), int(xs[idx])


class UniformCrop:
    """Random crop of all three tuple members (reference augmentations.py:107-126)."""

    def __init__(self, crop_size: int, rng: np.random.Generator):
        self.crop_size = crop_size
        self.rng = rng

    @staticmethod
    def crop_at(args, y: int, x: int, size: int):
        imgs, buildings, change = args
        return (imgs[y:y + size, x:x + size],
                buildings[y:y + size, x:x + size],
                change[y:y + size, x:x + size])

    def _label_plane(self, args):
        return None  # uniform: the label never influences the offset

    def __call__(self, args):
        height, width = args[2].shape[:2]
        label = self._label_plane(args)  # scene-sized reduce — compute once
        y, x = choose_crop_offset(label, height, width,
                                  self.crop_size, self.rng,
                                  importance=label is not None)
        return self.crop_at(args, y, x, self.crop_size)


class ImportanceRandomCrop(UniformCrop):
    """Positive-pixel oversampling crop (reference augmentations.py:129-142):
    sample 20 candidate crops, pick one with probability proportional to
    (change-label sum + 5). Delegates to :func:`choose_crop_offset` so the
    weighting scheme lives in exactly one place."""

    def _label_plane(self, args):
        change = args[2]
        return change.sum(axis=-1) if change.ndim == 3 else change


class RandomFlip:
    """Independent H/V flips of all tuple members (reference augmentations.py:44-64)."""

    def __init__(self, rng: np.random.Generator):
        self.rng = rng

    def __call__(self, args):
        horizontal = self.rng.choice([True, False])
        vertical = self.rng.choice([True, False])
        out = args
        if horizontal:
            out = tuple(np.flip(a, axis=1) for a in out)
        if vertical:
            out = tuple(np.flip(a, axis=0) for a in out)
        return tuple(a.copy() for a in out)


class RandomRotate:
    """k in {1,2,3} 90-degree rotations — never identity (reference
    augmentations.py:67-74 draws randint(1, 4))."""

    def __init__(self, rng: np.random.Generator):
        self.rng = rng

    def __call__(self, args):
        k = int(self.rng.integers(1, 4))
        return tuple(np.rot90(a, k, axes=(0, 1)).copy() for a in args)


class ColorShift:
    """Per-channel uniform scaling of the imagery stack, clipped to [0, 1]
    (reference augmentations.py:77-88; applied to imagery only — labels are
    never photometrically jittered)."""

    def __init__(self, rng: np.random.Generator, min_factor: float = 0.5,
                 max_factor: float = 1.5):
        self.rng = rng
        self.min_factor = min_factor
        self.max_factor = max_factor

    def __call__(self, args):
        imgs, buildings, change = args
        factors = self.rng.uniform(self.min_factor, self.max_factor, imgs.shape[-1])
        imgs = np.clip(imgs * factors[None, None, :], 0, 1).astype(np.float32)
        return imgs, buildings, change


class GammaCorrection:
    """Per-channel gamma on the imagery stack, clipped to [0, 1] (reference
    augmentations.py:91-103; gamma on {0,1} building labels is the identity,
    so restricting it to imagery is behavior-preserving)."""

    def __init__(self, rng: np.random.Generator, gain: float = 1,
                 min_gamma: float = 0.25, max_gamma: float = 2):
        self.rng = rng
        self.min_gamma = min_gamma
        self.max_gamma = max_gamma

    def __call__(self, args):
        imgs, buildings, change = args
        gamma = self.rng.uniform(self.min_gamma, self.max_gamma, imgs.shape[-1])
        imgs = np.clip(np.power(imgs, gamma[None, None, :]), 0, 1).astype(np.float32)
        return imgs, buildings, change


# ---------------------------------------------------------------------------
# Device-side augmentation graph
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("flip", "rotate", "color_shift", "gamma", "n_img_channels"),
)
def device_augment_batch(stack, rng, *, flip: bool, rotate: bool,
                         color_shift: bool, gamma: bool, n_img_channels: int):
    """Jitted per-sample geometric + photometric augmentation.

    ``stack``: (B, S, S, C_total), i.e. AFTER train_lib.wire_to_nhwc — square
    crops; imagery channels first
    (``n_img_channels`` of them), label channels after. Geometric ops apply
    to all channels jointly (labels transform with the imagery, matching the
    reference's joint-stack augmentation, datasets.py:149-150); photometric
    ops apply to imagery channels only. Distributions match the reference:
    independent 0.5 H/V flips, rot90 k∈{1,2,3}, per-channel color factor
    U[0.5, 1.5], per-channel gamma U[0.25, 2].

    Implementation note (TPU): everything is batch-level select/reverse/
    transpose — no vmapped ``lax.switch`` (whose three materialized branches
    cost ~3 ms/step at batch 8). rot90^k decomposes into a conditional
    transpose plus conditional axis reverses:
    rot1 = rev_H ∘ T, rot2 = rev_H ∘ rev_W, rot3 = rev_W ∘ T — so the whole
    geometric stage is 5 fused elementwise passes.
    """
    b = stack.shape[0]
    k_flip, k_rot, k_color, k_gamma = jax.random.split(rng, 4)
    x = stack

    def sel(mask, transformed, original):
        return jnp.where(mask[:, None, None, None], transformed, original)

    if flip:
        do_h, do_v = jax.random.bernoulli(k_flip, 0.5, (2, b))
        x = sel(do_h, x[:, :, ::-1], x)
        x = sel(do_v, x[:, ::-1], x)
    if rotate:
        k = jax.random.randint(k_rot, (b,), 1, 4)
        do_t = (k % 2) == 1           # rot1, rot3 transpose
        rev_h = k <= 2                # rot1, rot2 reverse rows
        rev_w = k >= 2                # rot2, rot3 reverse cols
        x = sel(do_t, jnp.swapaxes(x, 1, 2), x)   # needs square crops
        x = sel(rev_h, x[:, ::-1], x)
        x = sel(rev_w, x[:, :, ::-1], x)
    if color_shift or gamma:
        imgs = x[..., :n_img_channels]
        rest = x[..., n_img_channels:]
        if color_shift:
            factors = jax.random.uniform(k_color, (b, 1, 1, n_img_channels),
                                         minval=0.5, maxval=1.5,
                                         dtype=imgs.dtype)
            imgs = jnp.clip(imgs * factors, 0.0, 1.0)
        if gamma:
            g = jax.random.uniform(k_gamma, (b, 1, 1, n_img_channels),
                                   minval=0.25, maxval=2.0, dtype=imgs.dtype)
            imgs = jnp.clip(jnp.power(imgs, g), 0.0, 1.0)
        x = jnp.concatenate([imgs, rest], axis=-1)
    return x
