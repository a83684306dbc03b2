"""Raw SpaceNet7 (Planet) dataset helpers.

Port of the live surface of utils/spacenet7_helpers.py:6-108: date parsing,
AOI enumeration over the raw SpaceNet7 train/test tree, UDM-mask checks,
Planet mosaic + rasterized label loading, construction-only change labels,
and the split-printing utilities that generated the config AOI lists.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from . import geofiles


def file2date(file: Path) -> tuple:
    """``global_monthly_{year}_{month}_mosaic_{aoi}`` -> (year, month)
    (reference spacenet7_helpers.py:6-9)."""
    name_parts = Path(file).stem.split('_')
    return int(name_parts[2]), int(name_parts[3])


def get_all_aoi_ids(spacenet7_path: str, dataset: str = 'train') -> list:
    parent = Path(spacenet7_path) / dataset
    return sorted(f.name for f in parent.iterdir() if f.is_dir())


def get_dataset(spacenet7_path: str, aoi_id: str) -> str:
    return 'train' if aoi_id in get_all_aoi_ids(spacenet7_path, 'train') else 'test'


def is_masked(spacenet7_path: str, aoi_id: str, year: int, month: int) -> bool:
    folder = (Path(spacenet7_path) / get_dataset(spacenet7_path, aoi_id)
              / aoi_id / 'UDM_masks')
    return (folder / f'global_monthly_{year}_{month:02d}_mosaic_{aoi_id}_UDM.tif').exists()


def get_all_dates(spacenet7_path: str, aoi_id: str, sort_by_date: bool = True) -> list:
    folder = (Path(spacenet7_path) / get_dataset(spacenet7_path, aoi_id)
              / aoi_id / 'images_masked')
    dates = [file2date(f) for f in folder.glob('**/*') if f.is_file()]
    dates = [(y, m) for y, m in dates if not is_masked(spacenet7_path, aoi_id, y, m)]
    if sort_by_date:
        dates.sort(key=lambda d: d[0] * 12 + d[1])
    return dates


def get_date_from_index(spacenet7_path: str, aoi_id: str, index: int) -> tuple:
    return get_all_dates(spacenet7_path, aoi_id, sort_by_date=True)[index]


def load_planet_mosaic(spacenet7_path: str, aoi_id: str, year: int, month: int) -> np.ndarray:
    folder = (Path(spacenet7_path) / get_dataset(spacenet7_path, aoi_id)
              / aoi_id / 'images_masked')
    img, _, _ = geofiles.read_tif(
        folder / f'global_monthly_{year}_{month:02d}_mosaic_{aoi_id}.tif')
    return img


def get_shape(spacenet7_path: str, aoi_id: str) -> tuple:
    year, month = get_date_from_index(spacenet7_path, aoi_id, 0)
    img = load_planet_mosaic(spacenet7_path, aoi_id, year, month)
    return img.shape[0], img.shape[1]


def load_semantics_label(spacenet7_path: str, aoi_id: str, year: int, month: int) -> np.ndarray:
    folder = (Path(spacenet7_path) / get_dataset(spacenet7_path, aoi_id)
              / aoi_id / 'labels_raster')
    label, _, _ = geofiles.read_tif(
        folder / f'global_monthly_{year}_{month:02d}_mosaic_{aoi_id}_Buildings.tif')
    return (label > 0)[:, :, 0].astype(np.float32)


def compute_change(semantics_t1: np.ndarray, semantics_t2: np.ndarray) -> np.ndarray:
    """Construction-only change (reference spacenet7_helpers.py:64-66)."""
    return np.logical_and(semantics_t1 == 0, semantics_t2 == 1).astype(np.float32)


def load_change_label_dates(spacenet7_path: str, aoi_id: str, year_t1: int,
                            month_t1: int, year_t2: int, month_t2: int) -> np.ndarray:
    return compute_change(
        load_semantics_label(spacenet7_path, aoi_id, year_t1, month_t1),
        load_semantics_label(spacenet7_path, aoi_id, year_t2, month_t2))


def load_change_label_indices(spacenet7_path: str, aoi_id: str,
                              index_t1: int, index_t2: int) -> np.ndarray:
    year_t1, month_t1 = get_date_from_index(spacenet7_path, aoi_id, index_t1)
    year_t2, month_t2 = get_date_from_index(spacenet7_path, aoi_id, index_t2)
    return load_change_label_dates(spacenet7_path, aoi_id, year_t1, month_t1,
                                   year_t2, month_t2)


def training_validation_split(spacenet7_path: str, split: float = 0.3,
                              seed: int = 7) -> tuple[list, list]:
    """The split generator that produced the config AOI lists (reference
    spacenet7_helpers.py:84-97); returns (training, validation).

    Reproduction-faithful: the reference drew from the legacy global
    MT19937 stream (``np.random.seed(seed); np.random.rand(n)``), so the
    same draw is taken from a private ``RandomState`` (bit-identical
    sequence, no global-state pollution) — regenerating splits yields the
    reference's exact AOI assignment for the same seed."""
    aoi_ids = get_all_aoi_ids(spacenet7_path, 'train')
    rand = np.random.RandomState(seed).rand(len(aoi_ids))
    validation = [a for a, r in zip(aoi_ids, rand) if r <= split]
    training = [a for a, r in zip(aoi_ids, rand) if r > split]
    return training, validation


def print_training_validation_split(spacenet7_path: str, split: float = 0.3,
                                    seed: int = 7) -> None:
    training, validation = training_validation_split(spacenet7_path, split, seed)
    print('--validation--')
    for aoi_id in validation:
        print(f"'{aoi_id}',")
    print('--training--')
    for aoi_id in training:
        print(f"'{aoi_id}',")


def print_test_aoi_ids(spacenet7_path: str) -> None:
    print('--test--')
    for aoi_id in get_all_aoi_ids(spacenet7_path, 'test'):
        print(f"'{aoi_id}',")
