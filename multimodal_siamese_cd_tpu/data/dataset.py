"""MultimodalCDDataset — the SpaceNet7 bitemporal S1+S2 dataset.

Same constructor and sampling semantics as the reference
(utils/datasets.py:65-193): AOI split lists from the config, optional
unlabeled AOIs for semi-supervised runs, TRAINING_MULTIPLIER epoch
inflation, per-sample timestamp-pair sampling ('first_last' or random
sorted pair), construction-only change labels (t1==0 ∧ t2==1), and the
same sample dict keys.

TPU-native differences:
  * arrays are HWC float32 numpy (channels-last; the reference yields CHW
    torch tensors via Numpy2Torch),
  * scenes come from the packed :class:`~.cache.SceneCache` instead of
    per-item rasterio decodes,
  * randomness uses an explicit ``np.random.Generator`` seeded from
    ``cfg.SEED`` (deterministic per dataset instance) instead of global
    numpy state,
  * ``crop_only=True`` defers flips/rot/photometric augs to the device
    graph (:func:`~.augmentations.device_augment_batch`); default False
    reproduces the full reference host pipeline.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from .. import geofiles
from . import augmentations
from .cache import SceneCache


class MultimodalCDDataset:
    def __init__(self, cfg, run_type: str, no_augmentations: bool = False,
                 dataset_mode: str = None, disable_multiplier: bool = False,
                 disable_unlabeled: bool = False, crop_only: bool = False,
                 return_stack: bool = False, seed: int | None = None):
        self.cfg = cfg
        self.return_stack = return_stack
        self.run_type = run_type
        self.root_path = Path(cfg.PATHS.DATASET)
        self.metadata = geofiles.load_json(self.root_path / 'metadata.json')

        self.s1_band_indices = list(cfg.DATALOADER.S1_BANDS)
        self.s2_band_indices = list(cfg.DATALOADER.S2_BANDS)
        self.dataset_mode = (cfg.DATALOADER.DATASET_MODE if dataset_mode is None
                             else dataset_mode)
        self.include_building_labels = cfg.DATALOADER.INCLUDE_BUILDING_LABELS

        self.no_augmentations = no_augmentations
        self.crop_only = crop_only and not no_augmentations
        self.rng = np.random.default_rng(
            cfg.get('SEED', 7) if seed is None else seed)
        self.transform = augmentations.compose_transformations(
            cfg, no_augmentations, rng=self.rng, crop_only=self.crop_only)

        # AOI split selection (reference datasets.py:79-97)
        if run_type == 'training':
            self.aoi_ids = list(cfg.DATASET.TRAINING_IDS)
        elif run_type == 'validation':
            self.aoi_ids = list(cfg.DATASET.VALIDATION_IDS)
        else:
            self.aoi_ids = list(cfg.DATASET.TEST_IDS)
        self.labeled = [True] * len(self.aoi_ids)

        if ((cfg.DATALOADER.INCLUDE_UNLABELED or
             cfg.DATALOADER.INCLUDE_UNLABELED_VALIDATION) and not disable_unlabeled):
            aoi_ids_unlabelled = []
            if cfg.DATALOADER.INCLUDE_UNLABELED:
                aoi_ids_unlabelled += list(cfg.DATASET.UNLABELED_IDS)
            if cfg.DATALOADER.INCLUDE_UNLABELED_VALIDATION:
                aoi_ids_unlabelled += list(cfg.DATASET.VALIDATION_IDS)
            aoi_ids_unlabelled = sorted(aoi_ids_unlabelled)
            self.aoi_ids.extend(aoi_ids_unlabelled)
            self.labeled.extend([False] * len(aoi_ids_unlabelled))

        if not disable_multiplier:
            self.aoi_ids = self.aoi_ids * cfg.DATALOADER.TRAINING_MULTIPLIER
            self.labeled = self.labeled * cfg.DATALOADER.TRAINING_MULTIPLIER

        self.length = len(self.aoi_ids)
        self.cache = SceneCache.from_cfg(cfg, self.metadata)

    # -- timestamp selection (reference datasets.py:115-124) -------------------
    def _eligible_timestamps(self, aoi_id: str, labeled: bool) -> list[tuple[int, int]]:
        ts = self.metadata[aoi_id]
        if labeled:
            return [(t['year'], t['month']) for t in ts
                    if t['s1'] and t['s2'] and t['buildings'] and not t['masked']]
        return [(t['year'], t['month']) for t in ts if t['s1'] and t['s2']]

    def _pick_pair(self, timestamps: list, rng: np.random.Generator) -> tuple:
        if self.dataset_mode == 'first_last':
            return timestamps[0], timestamps[-1]
        i, j = sorted(rng.integers(0, len(timestamps), size=2))
        return timestamps[i], timestamps[j]

    # -- raw loads --------------------------------------------------------------
    def _load_change_label(self, aoi_id, year_t1, month_t1, year_t2, month_t2):
        b1 = self.cache.load(aoi_id, 'buildings', year_t1, month_t1)
        b2 = self.cache.load(aoi_id, 'buildings', year_t2, month_t2)
        change = np.logical_and(b1 == 0, b2 == 1)  # construction only
        return change.astype(np.float32)

    # -- item assembly (reference datasets.py:111-181) ---------------------------
    def __getitem__(self, index: int) -> dict:
        return self.get(index)

    def get(self, index: int, rng: np.random.Generator | None = None,
            out: np.ndarray | None = None) -> dict:
        """Like ``__getitem__`` but with an explicit PRNG — loader worker
        threads pass per-batch generators so multi-threaded epochs stay
        deterministic regardless of scheduling.

        ``out`` (only honored when :meth:`stack_spec` is non-None): a
        preallocated planar ``(C, S, S)`` array the crop stack is assembled
        into in place — the loader passes rows of one batch buffer, skipping
        the per-sample allocation and the collate copy."""
        if rng is None:
            rng, transform = self.rng, self.transform
        else:
            transform = None  # built lazily — the crop-only path never uses it

        aoi_id = self.aoi_ids[index]
        labeled = self.labeled[index]
        timestamps = self._eligible_timestamps(aoi_id, labeled)
        (year_t1, month_t1), (year_t2, month_t2) = self._pick_pair(timestamps, rng)

        if not self.no_augmentations:
            # Crop-first fast path: choose the crop from the (cheap, uint8)
            # label plane, then slice+convert only 256² windows out of the
            # memmapped scenes — never materializing full float32 scenes.
            return self._get_cropped(aoi_id, labeled, year_t1, month_t1,
                                     year_t2, month_t2, rng, transform, out)

        if transform is None:
            transform = augmentations.compose_transformations(
                self.cfg, self.no_augmentations, rng=rng, crop_only=self.crop_only)

        img_s1_t1 = self.cache.load(aoi_id, 's1', year_t1, month_t1)
        img_s2_t1 = self.cache.load(aoi_id, 's2', year_t1, month_t1)
        img_s1_t2 = self.cache.load(aoi_id, 's1', year_t2, month_t2)
        img_s2_t2 = self.cache.load(aoi_id, 's2', year_t2, month_t2)

        h, w = img_s1_t1.shape[:2]
        if labeled:
            change = self._load_change_label(aoi_id, year_t1, month_t1,
                                             year_t2, month_t2)
            if self.include_building_labels:
                b1 = self.cache.load(aoi_id, 'buildings', year_t1, month_t1)
                b2 = self.cache.load(aoi_id, 'buildings', year_t2, month_t2)
                buildings = np.concatenate((b1, b2), axis=-1).astype(np.float32)
            else:
                buildings = np.zeros((h, w, 2), np.float32)
        else:
            change = np.zeros((h, w, 1), np.float32)
            buildings = np.zeros((h, w, 2), np.float32)

        imgs = np.concatenate((img_s1_t1, img_s1_t2, img_s2_t1, img_s2_t2), axis=-1)
        imgs, buildings, change = transform((imgs, buildings, change))

        if self.return_stack:
            # Joint planar (8+2+1, S, S) stack for the device-side
            # augmentation graph; the jitted train step transposes to NHWC
            # and splits it by static channel counts.
            return {
                'stack': np.ascontiguousarray(np.concatenate(
                    (imgs, buildings, change), axis=-1).transpose(2, 0, 1)),
                'aoi_id': aoi_id,
                'year_t1': year_t1, 'month_t1': month_t1,
                'year_t2': year_t2, 'month_t2': month_t2,
                'is_labeled': labeled,
            }

        x_t1, x_t2 = self._split_imgs(imgs)

        item = {
            'x_t1': np.ascontiguousarray(x_t1),
            'x_t2': np.ascontiguousarray(x_t2),
            'y_change': np.ascontiguousarray(change),
            'aoi_id': aoi_id,
            'year_t1': year_t1,
            'month_t1': month_t1,
            'year_t2': year_t2,
            'month_t2': month_t2,
            'is_labeled': labeled,
        }
        if self.include_building_labels:
            item['y_sem_t1'] = np.ascontiguousarray(buildings[..., :1])
            item['y_sem_t2'] = np.ascontiguousarray(buildings[..., 1:])
        return item


    def _split_imgs(self, imgs: np.ndarray):
        """Split the concatenated imagery block into (x_t1, x_t2) per
        DATALOADER.INPUT_MODE (single home for the channel arithmetic; the
        jitted-step twin lives in train_lib.split_stack)."""
        n_s1 = len(self.s1_band_indices)
        n_s2 = len(self.s2_band_indices)
        img_s1_t1, img_s1_t2 = imgs[..., :n_s1], imgs[..., n_s1:2 * n_s1]
        img_s2_t1 = imgs[..., 2 * n_s1:2 * n_s1 + n_s2]
        img_s2_t2 = imgs[..., 2 * n_s1 + n_s2:2 * n_s1 + 2 * n_s2]
        mode = self.cfg.DATALOADER.INPUT_MODE
        if mode == 's1':
            return img_s1_t1, img_s1_t2
        if mode == 's2':
            return img_s2_t1, img_s2_t2
        return (np.concatenate((img_s1_t1, img_s2_t1), axis=-1),
                np.concatenate((img_s1_t2, img_s2_t2), axis=-1))

    def _get_cropped(self, aoi_id, labeled, year_t1, month_t1, year_t2,
                     month_t2, rng, transform, out=None) -> dict:
        """Training-path item assembly via windowed cache reads."""
        crop = self.cfg.AUGMENTATION.CROP_SIZE
        importance = self.cfg.AUGMENTATION.IMAGE_OVERSAMPLING_TYPE != 'none'
        if not (self.return_stack and self.crop_only):
            out = None  # in-place assembly exists only for the stack fast path

        if labeled:
            # (H, W) storage-dtype (uint8) planes. The construction-only
            # change plane (t1==0 ∧ t2==1 over {0,1} rasters) is exactly
            # b2 > b1, but it is only ever consumed inside crop-sized
            # windows — the 20 importance candidates and the chosen crop —
            # so it is computed per window: O(crop²) per sample instead of
            # the O(scene²) full-scene compare (which was ~40% of the
            # per-sample budget at 1000² scenes).
            b1 = self.cache.load_raw_planar(aoi_id, 'buildings',
                                            year_t1, month_t1)[0]
            b2 = self.cache.load_raw_planar(aoi_id, 'buildings',
                                            year_t2, month_t2)[0]
            h, w = b1.shape

            def change_window_count(y, x, s):
                return np.count_nonzero(b2[y:y + s, x:x + s] > b1[y:y + s, x:x + s])
        else:
            h, w, _ = self.cache.scene_shape(aoi_id, 's1', year_t1, month_t1)
            change_window_count = None

        if h < crop or w < crop:
            raise ValueError(
                f"AOI {aoi_id} scene ({h}x{w}) is smaller than "
                f"AUGMENTATION.CROP_SIZE={crop}; shrink the crop or exclude "
                f"the AOI (batches must be uniformly sized)")
        y0, x0 = augmentations.choose_crop_offset(
            None, h, w, crop, rng, importance and labeled,
            window_count=change_window_count)
        s = crop
        n_s1 = len(self.s1_band_indices)
        n_s2 = len(self.s2_band_indices)
        n_img = 2 * n_s1 + 2 * n_s2

        def planar_win(modality, year, month):
            return self.cache.load_raw_planar(aoi_id, modality, year, month,
                                              window=(y0, y0 + s, x0, x0 + s))

        # Assemble the joint PLANAR (C, S, S) stack straight into one buffer
        # — each slot assignment is a contiguous-run copy per channel
        # (planar src -> planar dst; the old channel-interleaved layout's
        # stride-13 dst scatter cost 16x more — see cache.py). float16 wire
        # format when the scene cache is float16 (then it's lossless —
        # labels are exact in f16 too) while halving host->device bytes;
        # full-precision caches (CACHE_DTYPE float32 / SCENE_CACHE False)
        # keep an f32 wire so the precision knob stays meaningful. Steps
        # transpose to NHWC + upcast on device (train_lib.wire_to_nhwc).
        f16_wire = self.cache.enabled and np.dtype(self.cache.dtype) == np.float16
        if out is not None:
            stack = out  # one row of the loader's preallocated batch buffer
            # np.empty-backed: label planes not written below must be zeroed
            # (planar layout: zeroing whole planes is contiguous and cheap,
            # and the imagery planes get overwritten right after).
            if not (labeled and self.include_building_labels):
                stack[n_img:].fill(0)
        else:
            stack = np.zeros((n_img + 3, s, s),
                             np.float16 if f16_wire else np.float32)
        stack[:n_s1] = planar_win('s1', year_t1, month_t1)
        stack[n_s1:2 * n_s1] = planar_win('s1', year_t2, month_t2)
        stack[2 * n_s1:2 * n_s1 + n_s2] = planar_win('s2', year_t1, month_t1)
        stack[2 * n_s1 + n_s2:n_img] = planar_win('s2', year_t2, month_t2)
        if labeled:
            b1_win = b1[y0:y0 + s, x0:x0 + s]
            b2_win = b2[y0:y0 + s, x0:x0 + s]
            if self.include_building_labels:
                stack[n_img] = b1_win
                stack[n_img + 1] = b2_win
            stack[n_img + 2] = b2_win > b1_win

        # Remaining (post-crop) transforms: identity for crop_only; host
        # flips/rot/photometric otherwise (cheap on 256² crops, f32; the
        # host transform classes are (H, W, C) — transpose around them).
        if not self.crop_only:
            if transform is None:
                transform = augmentations.compose_transformations(
                    self.cfg, False, rng=rng, crop_only=False)
            post = augmentations.Compose(
                [t for t in transform.transforms
                 if not isinstance(t, augmentations.UniformCrop)])
            hwc = stack.transpose(1, 2, 0)
            imgs, buildings, change = post(
                (hwc[..., :n_img], hwc[..., n_img:n_img + 2],
                 hwc[..., n_img + 2:]))
            stack = np.ascontiguousarray(np.concatenate(
                (imgs, buildings, change), axis=-1).transpose(2, 0, 1))

        if self.return_stack:
            return {
                'stack': stack if out is not None
                else np.ascontiguousarray(stack),  # f16 iff crop_only
                'aoi_id': aoi_id,
                'year_t1': year_t1, 'month_t1': month_t1,
                'year_t2': year_t2, 'month_t2': month_t2,
                'is_labeled': labeled,
            }
        # item API stays (H, W, C) float32
        stack = stack.astype(np.float32, copy=False).transpose(1, 2, 0)
        imgs = stack[..., :n_img]
        buildings = stack[..., n_img:n_img + 2]
        change = stack[..., n_img + 2:]

        x_t1, x_t2 = self._split_imgs(imgs)
        item = {
            'x_t1': np.ascontiguousarray(x_t1),
            'x_t2': np.ascontiguousarray(x_t2),
            'y_change': np.ascontiguousarray(change),
            'aoi_id': aoi_id,
            'year_t1': year_t1, 'month_t1': month_t1,
            'year_t2': year_t2, 'month_t2': month_t2,
            'is_labeled': labeled,
        }
        if self.include_building_labels:
            item['y_sem_t1'] = np.ascontiguousarray(buildings[..., :1])
            item['y_sem_t2'] = np.ascontiguousarray(buildings[..., 1:])
        return item

    def supports_eval_wire(self) -> bool:
        """THE eligibility predicate for the fused wire eval fast path —
        the single source both evaluation.py callers (run_measurer,
        dualtask_quantitative_counts) and :meth:`eval_wire`'s own guard
        consult, so a new ineligibility condition added here can never
        desync a caller into a mid-stream None wire."""
        return self.cache.enabled and self.no_augmentations

    def eval_wire(self, index: int, bucket: int = 64,
                  sem: bool = False) -> dict | None:
        """Planar, bucket-padded full-scene eval wires — the run_measurer
        fast path (evaluation.py). Assembles straight from the planar scene
        cache in the cache's STORAGE dtype (f16 by default — values are
        exactly representable there, so the device-side upcast reproduces
        the float32 item path bit-for-bit) with uint8 label/valid planes:
        ~4x less host->device wire than padded float32 items and no full-
        scene float32 materialization on the host.

        Returns None when the scene cache is disabled OR the dataset is in
        augmentation mode (callers fall back to the ``__getitem__`` item
        path — an aug-mode item is a random CROP, so the full-scene wire
        would silently change what run_measurer evaluates). Keys:
        ``x1``/``x2`` (C, Hp, Wp) planar padded imagery, ``y``/``valid``
        (Hp, Wp) uint8, ``shape`` (h, w) true scene size, plus the item
        metadata fields. ``sem=True`` additionally ships ``ysem1``/``ysem2``
        (Hp, Wp) uint8 building rasters (the dual-task assessment's
        semantic ground truths — cache stores buildings as uint8 {0,1}, so
        the device-side ``> 0.5`` reproduces the float32 item path's
        thresholding exactly).
        """
        if not self.supports_eval_wire():
            return None
        rng = self.rng
        aoi_id = self.aoi_ids[index]
        labeled = self.labeled[index]
        timestamps = self._eligible_timestamps(aoi_id, labeled)
        (year_t1, month_t1), (year_t2, month_t2) = self._pick_pair(timestamps, rng)

        mode = self.cfg.DATALOADER.INPUT_MODE
        modalities = {'s1': ['s1'], 's2': ['s2']}.get(mode, ['s1', 's2'])

        def planar_x(year, month):
            planes = [self.cache.load_raw_planar(aoi_id, m, year, month)
                      for m in modalities]
            c = sum(p.shape[0] for p in planes)
            h, w = planes[0].shape[1:]
            hp, wp = -(-h // bucket) * bucket, -(-w // bucket) * bucket
            out = np.zeros((c, hp, wp), planes[0].dtype)
            c0 = 0
            for p in planes:
                out[c0:c0 + p.shape[0], :h, :w] = p
                c0 += p.shape[0]
            return out, (h, w)

        x1, (h, w) = planar_x(year_t1, month_t1)
        x2, _ = planar_x(year_t2, month_t2)
        hp, wp = x1.shape[1:]
        y = np.zeros((hp, wp), np.uint8)
        wire = {
            'x1': x1, 'x2': x2, 'y': y, 'shape': (h, w),
            'aoi_id': aoi_id, 'year_t1': year_t1, 'month_t1': month_t1,
            'year_t2': year_t2, 'month_t2': month_t2, 'is_labeled': labeled,
        }
        if sem:
            wire['ysem1'] = np.zeros((hp, wp), np.uint8)
            wire['ysem2'] = np.zeros((hp, wp), np.uint8)
        if labeled:
            b1 = self.cache.load_raw_planar(aoi_id, 'buildings',
                                            year_t1, month_t1)[0]
            b2 = self.cache.load_raw_planar(aoi_id, 'buildings',
                                            year_t2, month_t2)[0]
            # construction-only change over {0,1} rasters == b2 > b1
            np.greater(b2, b1, out=y[:h, :w])
            if sem:
                wire['ysem1'][:h, :w] = b1
                wire['ysem2'][:h, :w] = b2
        valid = np.zeros((hp, wp), np.uint8)
        valid[:h, :w] = 1
        wire['valid'] = valid
        return wire

    def stack_spec(self):
        """``((C, S, S), dtype)`` of the training ``'stack'`` item when the
        crop-first fast path is active, else None. Non-None tells the loader
        it may preallocate ONE batch buffer and call ``get(i, rng,
        out=buffer[k])`` to assemble each sample in place — eliminating the
        per-sample allocation + memset and the ``np.stack`` collate copy."""
        if self.no_augmentations or not self.return_stack or not self.crop_only:
            return None
        s = self.cfg.AUGMENTATION.CROP_SIZE
        n_img = 2 * len(self.s1_band_indices) + 2 * len(self.s2_band_indices)
        f16 = self.cache.enabled and np.dtype(self.cache.dtype) == np.float16
        return (n_img + 3, s, s), (np.float16 if f16 else np.float32)

    def get_aoi_ids(self) -> list:
        # sorted: set order varies with PYTHONHASHSEED across runs
        return sorted(set(self.aoi_ids))

    def get_index(self, aoi_id: str):
        """Linear AOI lookup (reference datasets.py:183-187)."""
        for index, candidate in enumerate(self.aoi_ids):
            if aoi_id == candidate:
                return index
        return None

    def __len__(self) -> int:
        return self.length

    def __iter__(self):
        for i in range(self.length):
            yield self[i]

    def __str__(self) -> str:
        return f'Dataset with {self.length} samples.'
