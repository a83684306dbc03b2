#!/usr/bin/env python
"""Pallas probe: BatchNorm-backward stat reduce (s1 = sum(dy), s2 = sum(dy*x)
per channel, f32 accumulation over bf16 inputs).

In-model these appear as convert_reduce fusions at 211-480 GB/s (profiler,
BASELINE.md); the probe gates whether a streaming Pallas reduce gets closer
to the ~800 GB/s HBM floor before attempting a custom-vjp BN integration.

Shapes: the packed full-res activation (8, 128, 256, 128) — the dominant
BN-backward cost.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, W, C = 8, 128, 256, 128
ROW_BLOCK = 8  # rows of the flattened (B*H, W, C) view per grid step


def xla_reduce(dy, x):
    dyf = dy.astype(jnp.float32)
    return jnp.sum(dyf, axis=(0, 1, 2)), jnp.sum(dyf * x.astype(jnp.float32),
                                                 axis=(0, 1, 2))


def _kernel(dy_ref, x_ref, s1_ref, s2_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        s1_ref[:] = jnp.zeros_like(s1_ref)
        s2_ref[:] = jnp.zeros_like(s2_ref)

    dy = dy_ref[:].astype(jnp.float32)
    x = x_ref[:].astype(jnp.float32)
    s1_ref[:] += jnp.sum(dy, axis=(0, 1))[None]
    s2_ref[:] += jnp.sum(dy * x, axis=(0, 1))[None]


def pallas_reduce(dy, x):
    r = B * H
    dy = dy.reshape(r, W, C)
    x = x.reshape(r, W, C)
    grid = (r // ROW_BLOCK,)
    block = pl.BlockSpec((ROW_BLOCK, W, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    out_block = pl.BlockSpec((1, C), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    s1, s2 = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[block, block],
        out_specs=[out_block, out_block],
        out_shape=[jax.ShapeDtypeStruct((1, C), jnp.float32)] * 2,
    )(dy, x)
    return s1[0], s2[0]


def timed(fn, args, n1=100):
    # Keep the loop body live without touching the big operands: swap the
    # two inputs each iteration (buffer aliasing, free) and accumulate one
    # element of each reduce into a scalar carry. A chain that feeds the
    # result back scaled by 0.0 gets constant-folded and the reduce
    # loop-hoisted (measured >HBM-peak "bandwidth" — garbage).
    def run_n(n):
        @jax.jit
        def run(args):
            def body(c, _):
                a, b, acc = c
                s1, s2 = fn(a, b)
                return (b, a, acc + s1[0] + s2[0]), None
            (_, _, acc), _ = lax.scan(body, (*args, jnp.float32(0)), None,
                                      length=n)
            return acc
        _ = float(run(args))
        best = np.inf
        for _ in range(4):
            t0 = time.perf_counter()
            _ = float(run(args))
            best = min(best, time.perf_counter() - t0)
        return best
    return (run_n(2 * n1) - run_n(n1)) / n1


def main():
    rng = np.random.default_rng(0)
    dy = jnp.asarray(rng.normal(0, 1, (B, H, W, C)), jnp.bfloat16)
    x = jnp.asarray(rng.normal(0, 1, (B, H, W, C)), jnp.bfloat16)

    a1, a2 = jax.jit(xla_reduce)(dy, x)
    b1, b2 = jax.jit(pallas_reduce)(dy, x)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(b1), rtol=2e-2)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(b2), rtol=2e-2)
    print("pallas reduce matches XLA (bf16-noise tolerance)")

    nbytes = 2 * dy.size * dy.dtype.itemsize
    for name, fn in [("xla", xla_reduce), ("pallas", pallas_reduce)]:
        t = timed(fn, (dy, x))
        print(f"{name:8s} {t*1e3:7.3f} ms  {nbytes/t/1e9:6.1f} GB/s")


if __name__ == "__main__":
    main()
