#!/usr/bin/env python
"""Full-scene inference throughput (the eval/assessment path).

Measures eval_forward on padded 1024^2 scenes — the shape class real
SpaceNet7 AOIs land in — in scene-batched groups like evaluation.
run_measurer uses. Timing follows bench.py: chained dispatches, one host
fetch closes the window (block_until_ready resolves early on the tunneled
axon platform). Prints scenes/sec/chip and the patch-equivalent rate
(1024^2 = 16x a 256^2 patch) for comparison with training throughput.
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from multimodal_siamese_cd_tpu import train_lib
from multimodal_siamese_cd_tpu.config import load_cfg


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--scene", type=int, default=1024)
    p.add_argument("--group", type=int, default=None,
                   help="scenes per forward (default: the shipped adaptive "
                        "policy, evaluation.eval_group_limit)")
    p.add_argument("--calls", type=int, default=8)
    p.add_argument("--sol", action="store_true",
                   help="also print XLA cost-analysis FLOPs and the "
                        "effective TFLOP/s at the measured rate")
    args = p.parse_args()
    if args.group is None:
        from multimodal_siamese_cd_tpu.evaluation import eval_group_limit

        args.group = eval_group_limit((args.scene, args.scene))

    cfg = load_cfg("base")
    cfg.MODEL.TYPE = "siameseunet"
    model, state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    shape = (args.group, args.scene, args.scene, 6)
    x1 = np.asarray(rng.uniform(0, 1, shape), np.float32)
    x2 = np.asarray(rng.uniform(0, 1, shape), np.float32)
    x1d, x2d = jax.device_put(x1), jax.device_put(x2)

    probs = train_lib.eval_forward(model, state.params, state.batch_stats,
                                   x1d, x2d)
    float(np.asarray(probs[0, 0, 0, 0]))  # compile + sync

    t0 = time.perf_counter()
    for _ in range(args.calls):
        probs = train_lib.eval_forward(model, state.params, state.batch_stats,
                                       x1d, x2d)
    float(np.asarray(probs[0, 0, 0, 0]))
    dt = time.perf_counter() - t0

    n = args.calls * args.group
    sc_s = n / dt
    patch_eq = sc_s * (args.scene / 256) ** 2
    print(f"eval {args.scene}^2 scenes: {sc_s:.2f} scenes/s/chip "
          f"({dt / n * 1e3:.1f} ms/scene, {patch_eq:.0f} patch-equiv/s, "
          f"group={args.group})")

    if args.sol:
        # Speed-of-light accounting (same methodology as the train-step
        # budgets in BASELINE.md): XLA's analytical FLOP count for the
        # compiled eval forward divided by the measured wall time.
        # NOTE: lower().compile() does NOT reuse the timed run's in-memory
        # executable (jit's C++ cache is keyed separately from explicit
        # lowering), so on the tunneled rig --sol pays a second compile of
        # the eval forward after the measurement. The FLOP count needs the
        # compiled module either way; accept the cost rather than claim
        # reuse that doesn't happen.
        lowered = train_lib.eval_forward.lower(model, state.params,
                                               state.batch_stats, x1d, x2d)
        cost = lowered.compile().cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = float(cost.get("flops", 0.0))
        eff = flops * args.calls / dt / 1e12
        print(f"cost_analysis: {flops / 1e12:.3f} TFLOP/group "
              f"({flops / args.group / 1e9:.1f} GFLOP/scene) -> "
              f"{eff:.1f} effective TFLOP/s at the measured rate")
    return 0


if __name__ == "__main__":
    sys.exit(main())
