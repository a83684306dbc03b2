"""Visual dataset spot-check CLI.

Rebuilds the reference sanity_check.py working: it referenced a
nonexistent ``SpaceNet7S1S2Dataset`` and ``split_item_x`` (reference
sanity_check.py:12,16 — SURVEY defect 3). Writes PNG panels of S2/S1
imagery at both timestamps plus the change label for a few samples.

Usage: ``python sanity_check.py -c <config> -d <dataset-dir> [-n 5]``
(the reference hardcoded its config and relied on a config-resolved
dataset path; an explicit ``-d`` keeps this runnable anywhere).
"""

import argparse
from pathlib import Path

from multimodal_siamese_cd_tpu import experiment_manager, visualization
from multimodal_siamese_cd_tpu.data.dataset import MultimodalCDDataset


def sanity_check_dataset(config_name: str, dataset_dir: str = None,
                         run_type: str = 'training', n_samples: int = 5,
                         out_dir: str = 'sanity_checks'):
    cfg = experiment_manager.load_cfg(config_name)
    if dataset_dir is not None:
        cfg.PATHS.DATASET = str(dataset_dir)
    ds = MultimodalCDDataset(cfg, run_type, no_augmentations=False,
                             disable_multiplier=True)
    files = []
    for index in range(min(n_samples, len(ds))):
        item = ds[index]
        # one row per modality the config actually carries (items hold ONLY
        # the INPUT_MODE bands — a fixed [:, :, n_s1:] slice would truncate
        # 's2' configs and show optical bands as SAR)
        s1_t1, s2_t1 = visualization.split_modalities(item['x_t1'], cfg)
        s1_t2, s2_t2 = visualization.split_modalities(item['x_t2'], cfg)
        panels = []
        if s2_t1 is not None and s2_t1.shape[2] >= 3:
            panels.append([visualization.to_uint8(s2_t1[:, :, :3], 0, 0.3),
                           visualization.to_uint8(s2_t2[:, :, :3], 0, 0.3),
                           visualization.gray_rgb(item['y_change'])])
        if s1_t1 is not None:
            panels.append([visualization.sar_gray(s1_t1, 0),
                           visualization.sar_gray(s1_t2, 0)])
        if s2_t1 is None or s2_t1.shape[2] < 3:
            # no optical row — keep the change label visible alongside
            # whatever imagery the config does carry
            panels.insert(0, [visualization.imagery_panel(item['x_t1'], cfg),
                              visualization.imagery_panel(item['x_t2'], cfg),
                              visualization.gray_rgb(item['y_change'])])
        out_file = Path(out_dir) / f"{config_name}_{run_type}_{index}.png"
        files.append(visualization.save_figure(out_file, panels))
        print(f"wrote {files[-1]}")
    return files


if __name__ == '__main__':
    parser = argparse.ArgumentParser(description="Dataset sanity check")
    parser.add_argument('-c', '--config-file', dest='config_file', default='debug')
    parser.add_argument('-d', '--dataset-dir', dest='dataset_dir', default=None)
    parser.add_argument('-r', '--run-type', dest='run_type', default='training')
    parser.add_argument('-n', '--n-samples', dest='n_samples', type=int, default=5)
    parser.add_argument('-o', '--output-dir', dest='output_dir', default='sanity_checks')
    args = parser.parse_args()
    sanity_check_dataset(args.config_file, args.dataset_dir, args.run_type,
                         args.n_samples, args.output_dir)
