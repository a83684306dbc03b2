"""Dual-task model assessment CLI (change / change-from-semantics / semantics).

Rebuilds the reference assessment_semantics.py against the live API (its
dataset symbol didn't exist and the aux head was accessed through the
DataParallel wrapper without ``.module`` — SURVEY defects 3 and 6).
Quantitative protocol preserved (assessment_semantics.py:99-152): pixel
probabilities pooled over all scenes of the split, thresholded at 0.5 with
the numpy metrics, three blocks printed (Change / Change Sem / Sem).

CLI (assessment_semantics.py:155-171): ``-c <config> -o <out> -d <data>
[-r validation]``.
"""

from pathlib import Path

import numpy as np

from multimodal_siamese_cd_tpu import (
    checkpoints,
    evaluation,
    experiment_manager,
    metrics,
    parsers,
    visualization,
)
from multimodal_siamese_cd_tpu.data.dataset import MultimodalCDDataset

def _dataset(cfg, run_type):
    return MultimodalCDDataset(cfg, run_type, dataset_mode='first_last',
                               no_augmentations=True, disable_unlabeled=True,
                               disable_multiplier=True)


def qualitative_assessment_change(cfg, run_type: str = 'test') -> None:
    """(reference assessment_semantics.py:11-50)"""
    model, state, _ = checkpoints.load_checkpoint(cfg.INFERENCE_CHECKPOINT, cfg)
    for item in _dataset(cfg, run_type):
        out = evaluation.dualtask_scene_outputs(
            model, state, item, bucket=evaluation.eval_bucket(cfg))
        panels = [[
            visualization.imagery_panel(item['x_t1'], cfg),
            visualization.imagery_panel(item['x_t2'], cfg),
            visualization.gray_rgb(item['y_change']),
            visualization.gray_rgb(out['change_sem']),
            visualization.gray_rgb(out['change']),
        ]]
        out_file = (Path(cfg.PATHS.OUTPUT) / 'plots' / 'assessment_change_ssl'
                    / f"{item['aoi_id']}.png")
        visualization.save_figure(
            out_file, panels, title=f"{cfg.NAME} {item['aoi_id']}",
            col_titles=['t1', 't2', 'GT change', 'change from sem', 'change'])


def qualitative_assessment_sem(cfg, run_type: str = 'validation') -> None:
    """(reference assessment_semantics.py:53-96)"""
    model, state, _ = checkpoints.load_checkpoint(cfg.INFERENCE_CHECKPOINT, cfg)
    for item in _dataset(cfg, run_type):
        out = evaluation.dualtask_scene_outputs(
            model, state, item, bucket=evaluation.eval_bucket(cfg))
        panels = [
            [visualization.imagery_panel(item['x_t1'], cfg),
             visualization.gray_rgb(item['y_sem_t1']),
             visualization.gray_rgb(out['sem_t1'])],
            [visualization.imagery_panel(item['x_t2'], cfg),
             visualization.gray_rgb(item['y_sem_t2']),
             visualization.gray_rgb(out['sem_t2'])],
        ]
        out_file = (Path(cfg.PATHS.OUTPUT) / 'plots' / 'assessment_sem_ssl'
                    / f"{item['aoi_id']}.png")
        visualization.save_figure(
            out_file, panels, title=f"{cfg.NAME} {item['aoi_id']}",
            col_titles=['image', 'GT sem', 'pred sem'],
            row_labels=['t1', 't2'])


def quantitative_assessment(cfg, run_type: str = 'validation') -> None:
    """(reference assessment_semantics.py:99-152)

    Fast path: when the scene cache is live, the pooled-pixel protocol runs
    fused on device (evaluation.dualtask_quantitative_counts) — streaming
    confusion counts instead of materializing every probability raster on
    host (O(1) memory vs memory ∝ split size), same pooled metrics
    (thresholding-then-summing commutes with pixel pooling). Cache-disabled
    datasets fall back to the reference-shaped raster pooling below."""
    print(cfg.NAME)
    model, state, _ = checkpoints.load_checkpoint(cfg.INFERENCE_CHECKPOINT, cfg)
    ds = _dataset(cfg, run_type)

    bucket = evaluation.eval_bucket(cfg)
    counts = evaluation.dualtask_quantitative_counts(model, state, ds,
                                                     bucket=bucket)
    if counts is not None:
        for title, key in (('Change', 'change'), ('Change Sem', 'change_sem'),
                           ('Sem', 'sem')):
            f1, p, r = metrics.prob_metrics_from_counts(*counts[key])
            print(f'--{title}--')
            print(f'F1 score: {f1:.3f} - Precision: {p:.3f} - Recall {r:.3f}')
        return

    predictions_change, predictions_change_sem, predictions_sem = [], [], []
    ground_truths_change, ground_truths_sem = [], []
    for item in ds:
        out = evaluation.dualtask_scene_outputs(model, state, item,
                                                bucket=bucket)
        ground_truths_sem.extend([item['y_sem_t1'].ravel(), item['y_sem_t2'].ravel()])
        ground_truths_change.append(item['y_change'].ravel())
        predictions_change.append(out['change'].ravel())
        predictions_change_sem.append(out['change_sem'].ravel())
        predictions_sem.extend([out['sem_t1'].ravel(), out['sem_t2'].ravel()])

    predictions_change = np.concatenate(predictions_change)
    predictions_change_sem = np.concatenate(predictions_change_sem)
    ground_truths_change = np.concatenate(ground_truths_change) > 0.5

    print('--Change--')
    f1 = metrics.f1_score_from_prob(predictions_change, ground_truths_change)
    p = metrics.precision_from_prob(predictions_change, ground_truths_change)
    r = metrics.recall_from_prob(predictions_change, ground_truths_change)
    print(f'F1 score: {f1:.3f} - Precision: {p:.3f} - Recall {r:.3f}')

    print('--Change Sem--')
    f1 = metrics.f1_score_from_prob(predictions_change_sem, ground_truths_change)
    p = metrics.precision_from_prob(predictions_change_sem, ground_truths_change)
    r = metrics.recall_from_prob(predictions_change_sem, ground_truths_change)
    print(f'F1 score: {f1:.3f} - Precision: {p:.3f} - Recall {r:.3f}')

    predictions_sem = np.concatenate(predictions_sem)
    ground_truths_sem = np.concatenate(ground_truths_sem) > 0.5

    print('--Sem--')
    f1 = metrics.f1_score_from_prob(predictions_sem, ground_truths_sem)
    p = metrics.precision_from_prob(predictions_sem, ground_truths_sem)
    r = metrics.recall_from_prob(predictions_sem, ground_truths_sem)
    print(f'F1 score: {f1:.3f} - Precision: {p:.3f} - Recall {r:.3f}')


if __name__ == '__main__':
    parser = parsers.assessment_argument_parser()
    parser.set_defaults(run_type='validation')
    args = parser.parse_known_args()[0]
    cfg = experiment_manager.setup_cfg(args)
    quantitative_assessment(cfg, run_type=args.run_type)
    # qualitative_assessment_change(cfg, run_type=args.run_type)
    # qualitative_assessment_sem(cfg, run_type=args.run_type)
