#!/usr/bin/env python
"""Segmented timing of the flagship training step on the real model:
augment / forward / forward+grads / full optimizer step, scan-fused and
host-fetch synced, at one or more batch sizes."""
import argparse, sys, time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax, jax.numpy as jnp, numpy as np
from jax import lax

from multimodal_siamese_cd_tpu import train_lib
from multimodal_siamese_cd_tpu.config import load_cfg
from multimodal_siamese_cd_tpu.losses import get_criterion


def timed(run, arg, n_calls=4):
    _ = float(jnp.sum(jax.tree_util.tree_leaves(run(arg))[0].ravel()[:1]))
    best = np.inf
    for _ in range(n_calls):
        t0 = time.perf_counter()
        out = run(arg)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].ravel()[:1]))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch-sizes", default="8,32")
    p.add_argument("--k", type=int, default=10)
    args = p.parse_args()
    K = args.k

    for bs in [int(b) for b in args.batch_sizes.split(",")]:
        cfg = load_cfg("base")
        cfg.MODEL.TYPE = "siameseunet"
        cfg.TRAINER.BATCH_SIZE = bs
        model, state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
        layout = train_lib.stack_layout(cfg)
        criterion = get_criterion(cfg.MODEL.LOSS_TYPE)
        rng = jax.random.PRNGKey(7)
        host = np.random.default_rng(0)
        stack = jnp.asarray(
            host.uniform(0, 1, (bs, 15, 256, 256)), jnp.float32)
        variables = {"params": state.params, "batch_stats": state.batch_stats}

        # _augment takes the planar wire and yields NHWC; fold back to the
        # wire layout so the scan carry keeps a fixed shape
        def aug_wire(s, i):
            a = train_lib._augment(s, jax.random.fold_in(rng, i), cfg, layout)
            return a, jnp.moveaxis(a, -1, -3).astype(s.dtype)

        @jax.jit
        def run_aug(stack):
            def f(s, i):
                _, s = aug_wire(s, i)
                return s, None
            s, _ = lax.scan(f, stack, jnp.arange(K))
            return s

        # every segment chains the (randomly parameterized) augmentation so
        # no iteration is loop-invariant — XLA would hoist a constant body
        # out of the scan and fake a K-times speedup.
        @jax.jit
        def run_fwd(stack):
            def f(carry, i):
                s, acc = carry
                a, s = aug_wire(s, i)
                x1, x2, y, *_ = train_lib.split_stack(a, layout)
                out, _ = train_lib._apply_train(
                    model, variables["params"], variables["batch_stats"],
                    x1.astype(jnp.bfloat16), x2.astype(jnp.bfloat16),
                    jax.random.fold_in(rng, i))
                return (s, acc + jnp.sum(out).astype(jnp.float32)), None
            (s, acc), _ = lax.scan(f, (stack, jnp.float32(0)), jnp.arange(K))
            return acc

        @jax.jit
        def run_grad(stack):
            def f(carry, i):
                s, acc = carry
                a, s = aug_wire(s, i)
                x1, x2, y, *_ = train_lib.split_stack(a, layout)

                def loss_fn(params):
                    out, new_stats = train_lib._apply_train(
                        model, params, variables["batch_stats"],
                        x1.astype(jnp.bfloat16), x2.astype(jnp.bfloat16),
                        jax.random.fold_in(rng, i))
                    return criterion(out, y), new_stats
                (l, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    variables["params"])
                gsum = sum(jnp.sum(g).astype(jnp.float32)
                           for g in jax.tree_util.tree_leaves(grads))
                return (s, acc + gsum + l), None
            (s, acc), _ = lax.scan(f, (stack, jnp.float32(0)), jnp.arange(K))
            return acc

        step_fn = train_lib.make_scanned_train_step(
            model, cfg, "supervised", mesh=None)
        stacks = jnp.tile(stack[None], (K, 1, 1, 1, 1))
        lab = jnp.ones((K, bs), jnp.float32)

        def run_full(_):
            nonlocal state
            state, m = step_fn(state, stacks, lab, rng)
            return m["loss"]

        t_aug = timed(run_aug, stack) / K
        t_fwd = timed(run_fwd, stack) / K
        t_grad = timed(run_grad, stack) / K
        t_full = timed(run_full, None) / K
        print(f"batch {bs:3d}: aug={t_aug*1e3:6.2f}  aug+fwd={t_fwd*1e3:6.2f}  "
              f"aug+fwd+bwd={t_grad*1e3:6.2f}  full={t_full*1e3:6.2f} ms/step  "
              f"({bs/t_full:6.1f} patches/s)")
        # NB: segments are NESTED — fwd/grad chain the augmentation too, so
        # read DIFFERENCES (fwd-aug = forward, grad-fwd = backward). The
        # carry fold-back in aug_wire (moveaxis+cast the production step
        # doesn't do) adds a constant per-iteration overhead to every
        # chained segment; it cancels in the differences but inflates the
        # absolute 'aug' number slightly. full = real production step
        # (aug + fwd + bwd + AdamW + BN-stat carry, planar xs input).


if __name__ == "__main__":
    main()
