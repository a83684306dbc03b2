"""Synthetic SpaceNet7-layout dataset fixture generator.

Builds a tiny on-disk dataset tree matching the layout the reference
dataset expects (utils/datasets.py:17,31,37,43: ``metadata.json`` at the
root, per-AOI ``s1/ s2/ buildings/`` directories with
``{mod}_{aoi}_{year}_{month:02d}.tif`` files), used by the test suite and
by the benchmark harness when no real dataset is present.

Building footprints are random rectangles that accumulate over time, so
every (t1 < t2) pair has genuine construction-only change
(``t1 == 0 ∧ t2 == 1``, reference datasets.py:48-52).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from .. import geofiles
from ..geotiff import Affine

# Default fixture AOIs, named after real SpaceNet7 AOIs so the shipped
# config split lists resolve against the fixture (base.yaml DATASET lists).
TRAIN_AOIS = ['L15-0331E-1257N_1327_3160_13', 'L15-0361E-1300N_1446_2989_13']
VAL_AOIS = ['L15-0358E-1220N_1433_3310_13']
TEST_AOIS = ['L15-0357E-1223N_1429_3296_13']
UNLABELED_AOIS = ['L15-0369E-1244N_1479_3214_13']

N_S1_BANDS = 2
N_S2_BANDS = 4


def _make_buildings(rng: np.random.Generator, h: int, w: int, n_steps: int) -> list[np.ndarray]:
    """A time series of binary building rasters; footprints only ever grow."""
    current = np.zeros((h, w), dtype=np.uint8)
    series = []
    for _ in range(n_steps):
        for _ in range(rng.integers(1, 4)):
            bh = int(rng.integers(3, max(4, h // 6)))
            bw = int(rng.integers(3, max(4, w // 6)))
            i = int(rng.integers(0, h - bh))
            j = int(rng.integers(0, w - bw))
            current[i:i + bh, j:j + bw] = 1
        series.append(current.copy())
    return series


def generate_fixture_dataset(
    root: Path,
    seed: int = 7,
    scene_size: tuple[int, int] = (80, 96),
    n_timestamps: int = 3,
    aois: dict | None = None,
    with_nans: bool = True,
) -> dict:
    """Write a synthetic dataset tree under ``root``; returns the metadata."""
    rng = np.random.default_rng(seed)
    root = Path(root)
    root.mkdir(parents=True, exist_ok=True)

    if aois is None:
        aois = {aoi: True for aoi in TRAIN_AOIS + VAL_AOIS + TEST_AOIS}
        aois.update({aoi: False for aoi in UNLABELED_AOIS})

    transform = Affine.from_origin(10.0, 50.0, 4.77e-5, 4.77e-5)
    metadata: dict = {}
    for aoi_idx, (aoi_id, labeled) in enumerate(aois.items()):
        h = scene_size[0] + 8 * (aoi_idx % 3)   # vary shapes to exercise padding
        w = scene_size[1] + 8 * (aoi_idx % 2)
        buildings = _make_buildings(rng, h, w, n_timestamps)
        timestamps = []
        for t in range(n_timestamps):
            year = 2019 + (t // 12)
            month = 1 + (t % 12)
            base = buildings[t].astype(np.float32)

            s1 = rng.uniform(0, 0.6, size=(h, w, N_S1_BANDS)).astype(np.float32)
            s1 += 0.3 * base[:, :, None]
            s2 = rng.uniform(0, 0.4, size=(h, w, N_S2_BANDS)).astype(np.float32)
            s2 += 0.4 * base[:, :, None]
            if with_nans and t == 0:
                # A few NaNs and >1 values: exercises nan_to_num + clip
                # (reference datasets.py:33-34).
                s1[0, 0, 0] = np.nan
                s2[0, 1, 0] = 1.7

            geofiles.write_tif(root / aoi_id / 's1' / f's1_{aoi_id}_{year}_{month:02d}.tif',
                               s1, transform, 'EPSG:4326')
            geofiles.write_tif(root / aoi_id / 's2' / f's2_{aoi_id}_{year}_{month:02d}.tif',
                               s2, transform, 'EPSG:4326')
            has_buildings = bool(labeled)
            if has_buildings:
                geofiles.write_tif(
                    root / aoi_id / 'buildings' / f'buildings_{aoi_id}_{year}_{month:02d}.tif',
                    buildings[t], transform, 'EPSG:4326')
            timestamps.append({
                'year': year, 'month': month,
                's1': True, 's2': True,
                'buildings': has_buildings,
                'masked': False,
            })
        metadata[aoi_id] = timestamps

    geofiles.write_json(root / 'metadata.json', metadata)
    return metadata


def fixture_cfg_overrides() -> list:
    """``merge_from_list`` pairs that point a config's AOI splits at the
    default fixture AOIs (and shrink crops to fixture scale)."""
    return [
        'DATASET.TRAINING_IDS', repr(TRAIN_AOIS),
        'DATASET.VALIDATION_IDS', repr(VAL_AOIS),
        'DATASET.TEST_IDS', repr(TEST_AOIS),
        'DATASET.UNLABELED_IDS', repr(UNLABELED_AOIS),
        'AUGMENTATION.CROP_SIZE', '32',
        'DATALOADER.TRAINING_MULTIPLIER', '2',
        'DATALOADER.NUM_WORKER', '0',
    ]
