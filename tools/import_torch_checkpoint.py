#!/usr/bin/env python
"""Import a PyTorch reference checkpoint into this framework's format.

A user migrating from SebastianHafner/multimodal_siamese_cd brings trained
``{NAME}_checkpoint{epoch}.pt`` files written by the reference's
``save_checkpoint`` (utils/networks.py:30-38: torch-serialized
``{'step', 'network': DataParallel state_dict, 'optimizer': ...}``). This
tool ports the network weights (torch_port layout conversions; optimizer
moments are torch-layout and are NOT ported — fine-tuning restarts AdamW)
and writes a checkpoint this framework's trainers/assessment load natively:

    python tools/import_torch_checkpoint.py -c siamese -p sn7 -o runs/ \
        -d /data/sn7 \
        --src /torch_runs/networks/siamese_checkpoint100.pt --epoch 100

Afterwards ``assessment_change.py -c siamese -o runs/ -d /data/sn7
INFERENCE_CHECKPOINT 100`` (or resuming training with
``TRAINER.RESUME_CHECKPOINT 100``) uses the imported weights. Forward
parity of ported weights is pinned by tests/test_torch_parity.py.
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    import jax

    from multimodal_siamese_cd_tpu import checkpoints, torch_port, train_lib
    from multimodal_siamese_cd_tpu.experiment_manager import setup_cfg
    from multimodal_siamese_cd_tpu.parsers import training_argument_parser

    parser = training_argument_parser()
    parser.add_argument("--src", required=True,
                        help="reference .pt checkpoint file")
    parser.add_argument("--epoch", type=int, required=True,
                        help="epoch number for the written checkpoint name")
    args = parser.parse_args()
    cfg = setup_cfg(args)

    model, state = train_lib.create_train_state(cfg, jax.random.PRNGKey(cfg.SEED))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    ported, step = torch_port.load_reference_checkpoint(args.src, variables)
    state = state.replace(params=ported["params"],
                          batch_stats=ported["batch_stats"])

    out = checkpoints.save_checkpoint(state, args.epoch,
                                      int(step) if step is not None else 0,
                                      cfg)
    print(f"imported {args.src} (step {step}) -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
