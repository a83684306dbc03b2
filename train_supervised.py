"""Supervised change-detection training CLI.

Same contract as the reference train_supervised.py:
``python train_supervised.py -c <config> -p <wandb-project> -o <out-dir>
-d <dataset-dir> [KEY VALUE ...]``.
"""

import os
import sys

from multimodal_siamese_cd_tpu import experiment_manager, parsers, trainers, wandb_compat

if __name__ == '__main__':
    args = parsers.training_argument_parser().parse_known_args()[0]
    cfg = experiment_manager.setup_cfg(args)

    trainers.seed_everything(cfg.SEED)

    wandb_compat.init(
        name=cfg.NAME,
        config=cfg,
        entity='multimodal_siamese_cd',
        project=args.project,
        tags=['ssl', 'cd', 'siamese', 'spacenet7'],
        mode='online' if not cfg.DEBUG else 'disabled',
        out_dir=cfg.PATHS.OUTPUT,
    )

    try:
        trainers.run_supervised(cfg)
    except KeyboardInterrupt:
        try:
            sys.exit(0)
        except SystemExit:
            os._exit(0)
    finally:
        wandb_compat.finish()
