"""Multi-model qualitative comparison figures CLI.

Rebuilds the reference qualitative_comparison.py against the live API
(its dataset symbol didn't exist — SURVEY defect 3), producing PNG grid
figures instead of matplotlib axes: per-AOI rows of [t1, t2, GT] followed
by one prediction column per config, with optional zoom windows and
TP/FP/FN coloring (reference qualitative_comparison.py:25-167).

CLI contract preserved (qualitative_comparison.py:170-186): ``-c`` takes a
LIST of config names.
"""

from pathlib import Path

import numpy as np

from multimodal_siamese_cd_tpu import (
    checkpoints,
    evaluation,
    experiment_manager,
    parsers,
    spacenet7,
    visualization,
)
from multimodal_siamese_cd_tpu.data.dataset import MultimodalCDDataset

def _predict_change(model, state, ds, aoi_id, cfg):
    index = ds.get_index(aoi_id)
    item = ds[index]
    probs = evaluation.scene_probabilities(model, state, item,
                                           bucket=evaluation.eval_bucket(cfg))
    return item, (probs > 0.5).astype(np.uint8)


def qualitative_comparison(config_names: list, output_dir: str, dataset_dir: str,
                           aoi_ids: list) -> Path:
    """(reference qualitative_comparison.py:25-69)"""
    rows = [[None] * (3 + len(config_names)) for _ in aoi_ids]
    for j, config_name in enumerate(config_names):
        print(config_name)
        cfg = experiment_manager.setup_cfg_manual(config_name, Path(output_dir),
                                                 Path(dataset_dir))
        ds = MultimodalCDDataset(cfg, 'test', dataset_mode='first_last',
                                 no_augmentations=True, disable_unlabeled=True,
                                 disable_multiplier=True)
        model, state, _ = checkpoints.load_checkpoint(cfg.INFERENCE_CHECKPOINT, cfg)
        for i, aoi_id in enumerate(aoi_ids):
            item, pred = _predict_change(model, state, ds, aoi_id, cfg)
            rows[i][3 + j] = visualization.gray_rgb(pred)
            if j == 0:
                rows[i][0] = visualization.imagery_panel(item['x_t1'], cfg)
                rows[i][1] = visualization.imagery_panel(item['x_t2'], cfg)
                rows[i][2] = visualization.gray_rgb(item['y_change'])
    out_file = Path(output_dir) / 'plots' / 'qualitative_comparison.png'
    return visualization.save_figure(
        out_file, rows, col_titles=['t1', 't2', 'GT'] + list(config_names),
        row_labels=list(aoi_ids))


def qualitative_comparison_zoom(config_names: list, output_dir: str,
                                dataset_dir: str, aoi_ids: list, zooms: list,
                                colored: bool = False) -> Path:
    """Zoomed comparison with optional TP/FP/FN coloring
    (reference qualitative_comparison.py:105-167). Zoom windows index into
    the processed scenes; GT comes from the dataset item itself."""
    rows = [[None] * (3 + len(config_names)) for _ in aoi_ids]
    for j, config_name in enumerate(config_names):
        print(config_name)
        cfg = experiment_manager.setup_cfg_manual(config_name, Path(output_dir),
                                                 Path(dataset_dir))
        ds = MultimodalCDDataset(cfg, 'test', dataset_mode='first_last',
                                 no_augmentations=True, disable_unlabeled=True,
                                 disable_multiplier=True)
        model, state, _ = checkpoints.load_checkpoint(cfg.INFERENCE_CHECKPOINT, cfg)
        for i, (aoi_id, zoom) in enumerate(zip(aoi_ids, zooms)):
            item, pred = _predict_change(model, state, ds, aoi_id, cfg)
            i_start, j_start, s = zoom
            if s is None:
                i_end, j_end = item['y_change'].shape[:2]
            else:
                i_end, j_end = i_start + s, j_start + s
            window = np.s_[i_start:i_end, j_start:j_end]
            gt = item['y_change'][..., 0][window]
            pred_w = pred[window]
            if colored:
                classification = visualization.get_misclassifications(pred_w, gt)
                rows[i][3 + j] = visualization.classification_rgb(classification)
            else:
                rows[i][3 + j] = visualization.gray_rgb(pred_w)
            if j == 0:
                rows[i][0] = visualization.imagery_panel(
                    item['x_t1'][window], cfg)
                rows[i][1] = visualization.imagery_panel(
                    item['x_t2'][window], cfg)
                rows[i][2] = visualization.gray_rgb(gt)
    suffix = 'zoom_colored' if colored else 'zoom'
    out_file = Path(output_dir) / 'plots' / f'qualitative_comparison_{suffix}.png'
    return visualization.save_figure(
        out_file, rows, col_titles=['t1', 't2', 'GT'] + list(config_names),
        row_labels=list(aoi_ids))


def qualitative_comparison_zoom_selector(output_dir: str, dataset_dir: str,
                                         aoi_ids: list, zooms: list) -> Path:
    """Zoom-window preview over the raw SpaceNet7 Planet data
    (reference qualitative_comparison.py:72-102)."""
    rows = []
    for aoi_id, zoom in zip(aoi_ids, zooms):
        i_start, j_start, s = zoom
        if s is None:
            i_end, j_end = spacenet7.get_shape(dataset_dir, aoi_id)
        else:
            i_end, j_end = i_start + s, j_start + s
        window = np.s_[i_start:i_end, j_start:j_end]
        row = [None] * 5
        for index in (0, -1):
            year, month = spacenet7.get_date_from_index(dataset_dir, aoi_id, index)
            img = spacenet7.load_planet_mosaic(dataset_dir, aoi_id, year, month)
            row[0 if index == 0 else 2] = visualization.to_uint8(
                img[window][:, :, :3], 0, max(float(img.max()), 1.0))
            gt_sem = spacenet7.load_semantics_label(dataset_dir, aoi_id, year, month)
            row[1 if index == 0 else 3] = visualization.gray_rgb(gt_sem[window])
        gt_change = spacenet7.load_change_label_indices(dataset_dir, aoi_id, 0, -1)
        row[4] = visualization.gray_rgb(gt_change[window])
        rows.append(row)
    out_file = Path(output_dir) / 'plots' / 'zoom_selector.png'
    return visualization.save_figure(
        out_file, rows,
        col_titles=['planet t1', 'sem t1', 'planet t2', 'sem t2', 'change'],
        row_labels=list(aoi_ids))


# Default AOI/zoom selections from the reference __main__
# (qualitative_comparison.py:219-228).
DEFAULT_AOI_IDS = [
    'L15-0457E-1135N_1831_3648_13',
    'L15-1479E-1101N_5916_3785_13',
    'L15-1672E-1207N_6691_3363_13',
]
DEFAULT_ZOOMS = [
    (400, 100, 200),
    (0, 0, 300),
    (0, 150, 750),
]

if __name__ == '__main__':
    args = parsers.comparison_argument_parser().parse_known_args()[0]
    qualitative_comparison_zoom(args.config_files, args.output_dir,
                                args.dataset_dir, DEFAULT_AOI_IDS,
                                DEFAULT_ZOOMS, colored=True)
