#!/usr/bin/env python
"""Export a native checkpoint to the PyTorch reference's format.

The inverse of tools/import_torch_checkpoint.py: weights trained in this
framework become a ``{NAME}_checkpoint{epoch}.pt`` the reference's
``load_checkpoint`` (reference utils/networks.py:41-56) loads unmodified —
torch-serialized ``{'step', 'network': DataParallel state_dict,
'optimizer'}`` with ``module.``-prefixed keys. Optimizer moments are
jax-layout and are NOT exported (a fresh AdamW state_dict ships instead, so
fine-tuning on the torch side restarts the optimizer — same contract as the
import direction).

    python tools/export_torch_checkpoint.py -c siamese -p sn7 -o runs/ \
        -d /data/sn7 --epoch 100 --dst /torch_runs/siamese_checkpoint100.pt

Forward parity of exported weights is pinned by tests/test_torch_parity.py
(strict torch ``load_state_dict`` + logits comparison against the
reference's own model classes).
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    from multimodal_siamese_cd_tpu import checkpoints, torch_port
    from multimodal_siamese_cd_tpu.experiment_manager import setup_cfg
    from multimodal_siamese_cd_tpu.parsers import training_argument_parser

    parser = training_argument_parser()
    parser.add_argument("--epoch", type=int, required=True,
                        help="epoch number of the native checkpoint to export")
    parser.add_argument("--dst", default=None,
                        help="output .pt path (default: "
                             "<OUTPUT>/networks/<NAME>_checkpoint<epoch>_torch.pt)")
    args = parser.parse_args()
    cfg = setup_cfg(args)

    _, state, step = checkpoints.load_checkpoint(args.epoch, cfg)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    dst = Path(args.dst) if args.dst else checkpoints.checkpoint_file(
        cfg, args.epoch).with_name(
        f"{cfg.NAME}_checkpoint{args.epoch}_torch.pt")
    dst.parent.mkdir(parents=True, exist_ok=True)
    torch_port.save_reference_checkpoint(variables, step, dst,
                                         lr=cfg.TRAINER.LR)
    print(f"exported epoch {args.epoch} (step {step}) -> {dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
