#!/usr/bin/env python
"""Staggered (2,3)-window packed conv probe.

The shipped packed layout (models/packed.py) runs the 64ch@256px conv as a
(3,3) conv over 128 lanes with 50%-dense weights — 2x the logical FLOPs.
This probes an exact reformulation at 1.33x: DoubleConv's first conv maps
the packed tensor to a STAGGERED packing (even logical rows at packed row
i, odd logical rows at packed row i+1 -> height H'+1, one spurious slot at
each end), where both output phases share a single 2-row window, so the
weights are a 75%-dense (2,3) kernel; the second conv consumes the
staggered tensor with another 75%-dense (2,3) kernel and restores the
standard packing. Spurious slots are zeroed by a fused row/channel-group
mask so 'SAME' zero padding is reproduced exactly.

Derivation (packed channel = di*C + c, X'[i, di] = X[2i+di]):
  conv1 out[i] = sum_{p in 0,1} Ws1[p] . X'[i-1+p], i = 0..H' (pad 1/1):
    out[i, g0] = Y[2i]   -> p0: (di1)->W0;            p1: (di0)->W1, (di1)->W2
    out[i, g1] = Y[2i-1] -> p0: (di0)->W0, (di1)->W1; p1: (di0)->W2
  conv2 out[i] = sum_{p in 0,1} Ws2[p] . S[i+p], i = 0..H'-1 (VALID):
    out[i, g0] = Y[2i]   -> p0: (di0)->W1, (di1)->W0; p1: (di1)->W2
    out[i, g1] = Y[2i+1] -> p0: (di0)->W0;            p1: (di0)->W2, (di1)->W1

Run on the TPU for timing; pass --verify for the CPU exactness check.
"""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

DN = ("NHWC", "HWIO", "NHWC")


def conv(x, w, padding):
    return lax.conv_general_dilated(x, w, (1, 1), padding,
                                    dimension_numbers=DN)


def pack(x):
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w, c).transpose(0, 1, 3, 2, 4).reshape(
        b, h // 2, w, 2 * c)


def unpack(xp):
    b, hh, w, c2 = xp.shape
    c = c2 // 2
    return xp.reshape(b, hh, w, 2, c).transpose(0, 1, 3, 2, 4).reshape(
        b, 2 * hh, w, c)


def pack33(w):  # the shipped (3,3) 50%-dense packing
    _, _, ci, co = w.shape
    wp = jnp.zeros((3, 3, 2 * ci, 2 * co), w.dtype)
    for oi in range(2):
        for di in range(2):
            for p in (-1, 0, 1):
                k = 2 * p + di - oi + 1
                if 0 <= k <= 2:
                    wp = wp.at[p + 1, :, di * ci:(di + 1) * ci,
                               oi * co:(oi + 1) * co].set(w[k])
    return wp


def stag1(w):
    """(3,3,Ci,Co) -> (2,3,2Ci,2Co): unstaggered packed -> staggered."""
    _, _, ci, co = w.shape
    z = jnp.zeros_like(w[0])
    return jnp.stack([
        jnp.concatenate([jnp.concatenate([z, w[0]], -1),         # di0 -> (g0, g1)
                         jnp.concatenate([w[0], w[1]], -1)], 1),  # di1
        jnp.concatenate([jnp.concatenate([w[1], w[2]], -1),
                         jnp.concatenate([w[2], z], -1)], 1),
    ])


def stag2(w):
    """(3,3,Ci,Co) -> (2,3,2Ci,2Co): staggered -> unstaggered packed."""
    _, _, ci, co = w.shape
    z = jnp.zeros_like(w[0])
    return jnp.stack([
        jnp.concatenate([jnp.concatenate([w[1], w[0]], -1),
                         jnp.concatenate([w[0], z], -1)], 1),
        jnp.concatenate([jnp.concatenate([z, w[2]], -1),
                         jnp.concatenate([w[2], w[1]], -1)], 1),
    ])


def zero_spurious(s):
    """Zero staggered slots [0, g1] and [H', g0] (fused iota masks)."""
    hp, c2 = s.shape[1], s.shape[3]
    c = c2 // 2
    row = lax.broadcasted_iota(jnp.int32, s.shape, 1)
    ch = lax.broadcasted_iota(jnp.int32, s.shape, 3)
    spur = ((row == 0) & (ch >= c)) | ((row == hp - 1) & (ch < c))
    return jnp.where(spur, jnp.zeros((), s.dtype), s)


def stag_conv1(xp, w1s):
    s = conv(xp, w1s, ((1, 1), (1, 1)))
    return zero_spurious(s)


def stag_conv2(s, w2s):
    return conv(s, w2s, ((0, 0), (1, 1)))


def verify():
    rng = np.random.default_rng(0)
    B, H, W, C = 2, 16, 12, 8
    x = jnp.asarray(rng.normal(0, 1, (B, H, W, C)), jnp.float32)
    w1 = jnp.asarray(rng.normal(0, 1, (3, 3, C, C)) / 8, jnp.float32)
    w2 = jnp.asarray(rng.normal(0, 1, (3, 3, C, C)) / 8, jnp.float32)

    ref = conv(jnp.maximum(conv(x, w1, "SAME"), 0.0), w2, "SAME")

    xp = pack(x)
    s = stag_conv1(xp, stag1(w1))
    s = zero_spurious(jnp.maximum(s, 0.0))  # relu keeps zeros zero anyway
    got = unpack(stag_conv2(s, stag2(w2)))
    err = float(jnp.max(jnp.abs(got - ref)))
    print(f"staggered doubleconv exactness: max|err| = {err:.2e}")
    assert err < 1e-4, err

    # packed (3,3) path for reference
    p = unpack(conv(jnp.maximum(conv(xp, pack33(w1), "SAME"), 0.0),
                    pack33(w2), "SAME"))
    err2 = float(jnp.max(jnp.abs(p - ref)))
    print(f"shipped packed33 exactness:     max|err| = {err2:.2e}")


def timed(fn, x, n1):
    def run_n(n):
        @jax.jit
        def run(x):
            y, _ = lax.scan(lambda x, _: (fn(x), None), x, None, length=n)
            return y
        _ = float(jnp.sum(run(x)[0, 0, 0, :1]))
        best = np.inf
        for _ in range(4):
            t0 = time.perf_counter()
            _ = float(jnp.sum(run(x)[0, 0, 0, :1]))
            best = min(best, time.perf_counter() - t0)
        return best
    return (run_n(2 * n1) - run_n(n1)) / n1


def bench():
    rng = np.random.default_rng(0)
    B, HP, W, C2 = 8, 128, 256, 128
    useful = 2 * 2 * 9 * 64 * 64 * 256 * 256 * B  # two convs
    xp = jnp.asarray(rng.normal(0, 1, (B, HP, W, C2)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(0, 1, (3, 3, 64, 64)) / 24, jnp.float32)
    w2 = jnp.asarray(rng.normal(0, 1, (3, 3, 64, 64)) / 24, jnp.float32)

    w1p, w2p = (pack33(w1).astype(jnp.bfloat16),
                pack33(w2).astype(jnp.bfloat16))
    w1s, w2s = (stag1(w1).astype(jnp.bfloat16),
                stag2(w2).astype(jnp.bfloat16))

    def dc_packed(x):
        return conv(jnp.maximum(conv(x, w1p, "SAME"), 0), w2p, "SAME")

    def dc_stag(x):
        s = zero_spurious(jnp.maximum(stag_conv1(x, w1s), 0))
        return stag_conv2(s, w2s)

    for name, fn in [("packed33", dc_packed), ("staggered", dc_stag)]:
        t = timed(fn, xp, 60)
        print(f"{name} doubleconv fwd:      {t*1e3:6.3f} ms  "
              f"useful {useful/t/1e12:6.1f} TF/s")

    for name, fn in [("packed33", dc_packed), ("staggered", dc_stag)]:
        def loss(x):
            y = fn(x)
            return 0.5 * jnp.sum((y * y).astype(jnp.float32))
        t = timed(jax.grad(loss), xp, 25)
        print(f"{name} doubleconv fwd+dgrad: {t*1e3:6.3f} ms  "
              f"useful {2*useful/t/1e12:6.1f} TF/s")

    # full grad incl. weight grads, through the packing transforms (params
    # are the logical (3,3,64,64) kernels, like the model's)
    for name, mk1, mk2, c1, c2 in [
            ("packed33", lambda w: pack33(w).astype(jnp.bfloat16),
             lambda w: pack33(w).astype(jnp.bfloat16),
             lambda x, w: conv(x, w, "SAME"), lambda x, w: conv(x, w, "SAME")),
            ("staggered", lambda w: stag1(w).astype(jnp.bfloat16),
             lambda w: stag2(w).astype(jnp.bfloat16),
             stag_conv1, stag_conv2)]:
        def loss(x, w1, w2):
            y = c2(zero_spurious(jnp.maximum(c1(x, mk1(w1)), 0)), mk2(w2))
            return 0.5 * jnp.sum((y * y).astype(jnp.float32))

        def step(x):
            gx, g1, g2 = jax.grad(loss, argnums=(0, 1, 2))(x, w1, w2)
            return gx + jnp.sum(g1).astype(jnp.bfloat16) \
                + jnp.sum(g2).astype(jnp.bfloat16)

        t = timed(step, xp, 20)
        print(f"{name} doubleconv full grad: {t*1e3:6.3f} ms  "
              f"useful {3*useful/t/1e12:6.1f} TF/s")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--verify", action="store_true")
    args = ap.parse_args()
    if args.verify:
        jax.config.update("jax_platforms", "cpu")
        verify()
    else:
        verify()
        bench()
