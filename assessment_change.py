"""Offline change-detection assessment CLI.

Rebuilds the reference assessment_change.py working: its quantitative path
called a nonexistent ``evaluation.inference_loop`` and ``SpaceNet7CDDataset``
(reference assessment_change.py:15,56,59 — SURVEY defect 3); here both exist.

Usage (same CLI contract, assessment_change.py:64-86):
``python assessment_change.py -c <config> -o <out-dir> -d <dataset-dir>
[-r test] [KEY VALUE ...]`` — loads ``{out}/networks/{name}_checkpoint
{INFERENCE_CHECKPOINT}.pt``.
"""

from pathlib import Path

from multimodal_siamese_cd_tpu import (
    checkpoints,
    evaluation,
    experiment_manager,
    parsers,
    visualization,
)
from multimodal_siamese_cd_tpu.data.dataset import MultimodalCDDataset


def qualitative_assessment(cfg, run_type: str = 'test') -> None:
    """Per-AOI figure: inputs, GT + predicted semantics, GT + predicted
    change (reference assessment_change.py:10-48), written as PNG grids."""
    print(cfg.NAME)
    model, state, _ = checkpoints.load_checkpoint(cfg.INFERENCE_CHECKPOINT, cfg)
    ds = MultimodalCDDataset(cfg, run_type, dataset_mode='first_last',
                             no_augmentations=True, disable_unlabeled=True,
                             disable_multiplier=True)
    for item in ds:
        aoi_id = item['aoi_id']
        out = evaluation.dualtask_scene_outputs(
            model, state, item, bucket=evaluation.eval_bucket(cfg))
        panels = [
            [visualization.imagery_panel(item['x_t1'], cfg),
             visualization.gray_rgb(item['y_sem_t1']),
             visualization.gray_rgb(out['sem_t1']),
             visualization.gray_rgb(item['y_change'])],
            [visualization.imagery_panel(item['x_t2'], cfg),
             visualization.gray_rgb(item['y_sem_t2']),
             visualization.gray_rgb(out['sem_t2']),
             visualization.gray_rgb(out['change'])],
        ]
        out_file = Path(cfg.PATHS.OUTPUT) / 'plots' / 'change' / cfg.NAME / f'{aoi_id}.png'
        visualization.save_figure(out_file, panels)


def quantitative_assessment(cfg, run_type: str = 'test') -> None:
    """F1/precision/recall over the split (reference assessment_change.py:51-61)."""
    print(cfg.NAME)
    model, state, _ = checkpoints.load_checkpoint(cfg.INFERENCE_CHECKPOINT, cfg)
    ds = MultimodalCDDataset(cfg, run_type, no_augmentations=True,
                             dataset_mode='first_last', disable_multiplier=True,
                             disable_unlabeled=True)
    data = evaluation.inference_loop(model, state, ds,
                                     bucket=evaluation.eval_bucket(cfg))
    f1, precision, recall = data['change']
    print(f'F1 score: {f1:.3f} - Precision: {precision:.3f} - Recall {recall:.3f}')


if __name__ == '__main__':
    args = parsers.assessment_argument_parser().parse_known_args()[0]
    cfg = experiment_manager.setup_cfg(args)
    quantitative_assessment(cfg, run_type=args.run_type)
