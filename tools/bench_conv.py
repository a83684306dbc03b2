#!/usr/bin/env python
"""Microbenchmark of conv formulations for the U-Net's full-res levels.

The round-1 finding: XLA's 3x3 conv at 64ch@256px sustains only ~22 TFLOP/s
on v5e (vs 179 at 512ch@32px) because Cin=Cout=64 uses half of the MXU's
128-wide contraction/lane dimensions. Candidates measured here:

  A  baseline lax.conv 3x3, 64->64 @ 256px
  B  space-to-depth packed DENSE 3x3 conv, 256->256 @ 128px
     (exact reformulation of A; 25% weight density -> useful = raw * 0.25)
  C  space-to-depth packed PER-PHASE 4x conv2x2, 256->64 each @ 128px
     (exact reformulation of A; 56% density per conv, N=64)
  D  raw conv2x2 256->256 @ 128px (ceiling probe for packed shapes)
  E  raw conv3x3 128->128 @ 128px (round-1 reference point: ~108)
  F  raw conv3x3 256->256 @ 64px (packed target for the 128ch level)

Timing: lax.scan-chained applications per dispatch, host fetch to close the
window (block_until_ready resolves early on the tunneled axon platform).
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timed_tflops(fn, x, w, flops_per_call, n_iter=30, n_calls=3):
    """Sustained TFLOP/s of y = fn(x, w) chained n_iter times per dispatch."""

    def chain(carry, _):
        x, s = carry
        y = fn((x * (1.0 + 1e-24 * s)).astype(x.dtype), w)
        return (x, jnp.float32(jnp.sum(y[0, 0, 0, :1]))), None

    @jax.jit
    def run(x, w):
        (x_out, s), _ = lax.scan(chain, (x, jnp.float32(0)), None, length=n_iter)
        return s

    s = run(x, w)
    _ = float(s)  # compile + sync
    best = np.inf
    for _ in range(n_calls):
        t0 = time.perf_counter()
        s = run(x, w)
        _ = float(s)
        best = min(best, time.perf_counter() - t0)
    return flops_per_call * n_iter / best / 1e12


def conv(x, w, stride=1, padding="SAME"):
    return lax.conv_general_dilated(
        x, w, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)


def conv_flops(b, h, w_, cin, cout, k):
    return 2 * k * k * cin * cout * h * w_ * b


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    args = p.parse_args()
    b = args.batch
    rng = np.random.default_rng(0)

    def mk(shape):
        return jnp.asarray(rng.normal(0, 1, shape), jnp.bfloat16)

    useful = conv_flops(b, 256, 256, 64, 64, 3)  # FLOPs of the logical op A

    results = {}

    # A: baseline
    x = mk((b, 256, 256, 64)); w = mk((3, 3, 64, 64))
    results["A_conv3x3_64ch_256px"] = (timed_tflops(
        lambda x, w: conv(x, w), x, w, useful), 1.0)

    # B: packed dense 3x3 (raw 4x the useful FLOPs)
    xp = mk((b, 128, 128, 256)); wp = mk((3, 3, 256, 256))
    raw = conv_flops(b, 128, 128, 256, 256, 3)
    results["B_packed_dense3x3_256ch_128px"] = (timed_tflops(
        lambda x, w: conv(x, w), xp, wp, raw), useful / raw)

    # C: per-phase 4x conv2x2 (each raw 16/9 over its useful share)
    wq = mk((2, 2, 256, 64))

    def per_phase(x, w):
        ys = [conv(x, w, padding=[(pad_t, 1 - pad_t), (pad_l, 1 - pad_l)])
              for pad_t in (1, 0) for pad_l in (1, 0)]
        return jnp.concatenate(ys, axis=-1)

    raw_c = 4 * conv_flops(b, 128, 128, 256, 64, 2)
    results["C_packed_4phase_conv2x2"] = (timed_tflops(
        per_phase, xp, wq, raw_c), useful / raw_c)

    # D: ceiling probe conv2x2 256->256 @128px
    wd = mk((2, 2, 256, 256))
    raw_d = conv_flops(b, 128, 128, 256, 256, 2)
    results["D_conv2x2_256ch_128px_raw"] = (timed_tflops(
        lambda x, w: conv(x, w), xp, wd, raw_d), None)

    # E: reference point 128ch@128px
    xe = mk((b, 128, 128, 128)); we = mk((3, 3, 128, 128))
    results["E_conv3x3_128ch_128px_raw"] = (timed_tflops(
        lambda x, w: conv(x, w), xe, we,
        conv_flops(b, 128, 128, 128, 128, 3)), None)

    # F: packed target for the 128ch level: 512ch@64px
    xf = mk((b, 64, 64, 512)); wf = mk((3, 3, 512, 512))
    results["F_conv3x3_512ch_64px_raw"] = (timed_tflops(
        lambda x, w: conv(x, w), xf, wf,
        conv_flops(b, 64, 64, 512, 512, 3)), None)

    print(f"# backend={jax.default_backend()} batch={b}")
    for name, (tf, frac) in results.items():
        extra = f"  useful={tf * frac:6.1f}" if frac else ""
        print(f"{name:36s} raw={tf:6.1f} TF/s{extra}")


if __name__ == "__main__":
    main()
