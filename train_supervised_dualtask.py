"""Dual-task (change + building semantics) training CLI.

The reference's train_supervised_dualtask.py cannot start (it calls a
nonexistent parser, dataset class, and eval kwarg — SURVEY defect 2); this
is its intended behaviour rebuilt against the live API. Use a
dtsiameseunet config with INCLUDE_BUILDING_LABELS (e.g. dtsiamese).
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
        trainers.run_dualtask(cfg)
    except KeyboardInterrupt:
        try:
            sys.exit(0)
        except SystemExit:
            os._exit(0)
    finally:
        wandb_compat.finish()
