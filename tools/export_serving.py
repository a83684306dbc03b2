#!/usr/bin/env python
"""Export a trained checkpoint to a self-contained AOT serving bundle.

    python tools/export_serving.py -c siamese -o runs/ -d /data/sn7 \
        --dest siamese_serving.zip [--epoch 100] [--buckets 256,512,1024] \
        [--platforms tpu,cpu]

See multimodal_siamese_cd_tpu/serving.py for the bundle format.
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    from multimodal_siamese_cd_tpu import checkpoints, serving
    from multimodal_siamese_cd_tpu.experiment_manager import setup_cfg
    from multimodal_siamese_cd_tpu.parsers import training_argument_parser

    parser = training_argument_parser()
    parser.add_argument("--dest", required=True, help="output bundle path")
    parser.add_argument("--epoch", type=int, default=None,
                        help="checkpoint epoch (default INFERENCE_CHECKPOINT)")
    parser.add_argument("--buckets", default="256,512,1024",
                        help="comma-separated square bucket sizes")
    parser.add_argument("--platforms", default=None,
                        help="comma-separated export platforms (e.g. tpu,cpu)")
    parser.add_argument("--weights", default="fp32", choices=["fp32", "bf16"],
                        help="weight storage dtype (bf16 halves the bundle)")
    parser.add_argument("--batch-sizes", default="1",
                        help="comma-separated forward batch sizes, e.g. 1,8 "
                             "(predict_batch amortizes dispatch like eval's "
                             "group-of-8 batching)")
    args = parser.parse_args()
    if args.platforms:
        # Explicit target platforms: jax.export lowers for them from ANY
        # backend, so run the whole tool on the host CPU — an export box
        # need not have (or wait for) an attached TPU. Without --platforms
        # the bundle targets the local backend's platform, which must init.
        import jax

        jax.config.update("jax_platforms", "cpu")
    cfg = setup_cfg(args)

    epoch = args.epoch if args.epoch is not None else cfg.INFERENCE_CHECKPOINT
    model, state, step = checkpoints.load_checkpoint(epoch, cfg)
    buckets = [(int(s), int(s)) for s in args.buckets.split(",")]
    platforms = args.platforms.split(",") if args.platforms else None
    batch_sizes = [int(b) for b in args.batch_sizes.split(",")]

    path = serving.export_serving_bundle(
        model, state, cfg, args.dest, buckets=buckets, platforms=platforms,
        weights_dtype=args.weights, batch_sizes=batch_sizes)
    print(f"exported step-{step} checkpoint to {path} "
          f"({path.stat().st_size / 1e6:.1f} MB, buckets={buckets}, "
          f"batch_sizes={batch_sizes}, weights={args.weights})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
