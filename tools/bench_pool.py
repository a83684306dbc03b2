#!/usr/bin/env python
"""Packed max-pool backward probe.

The shipped packed_max_pool backward (autodiff) costs ~0.8 ms/application
at bs8 full-res: the binary channel-max vjp materializes two pred masks
and re-reads the activations, and the horizontal window pool lowers to
select_and_scatter. This probes a custom-vjp with a hand-written backward
reproducing the EXACT autodiff semantics (0.5/0.5 tie split for the
channel max, first-column routing for the horizontal window) in one
fused elementwise pass over strided column slices.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def pool_ref(xp):
    c = xp.shape[-1] // 2
    v = jnp.maximum(xp[..., :c], xp[..., c:])
    w = v.shape[2] - v.shape[2] % 2
    v = v[:, :, :w]
    return nn.max_pool(v, (1, 2), strides=(1, 2))


@jax.custom_vjp
def pool_fast(xp):
    return pool_ref(xp)


def _pool_fwd(xp):
    return pool_ref(xp), xp


def _pool_bwd(xp, gy):
    c = xp.shape[-1] // 2
    w = xp.shape[2] - xp.shape[2] % 2
    x0, x1 = xp[..., :c], xp[..., c:]
    v = jnp.maximum(x0, x1)
    ve, vo = v[:, :, 0:w:2], v[:, :, 1:w:2]
    # horizontal window: select_and_scatter routes ties to the FIRST column
    ge = jnp.where(ve >= vo, gy, jnp.zeros((), gy.dtype))
    go = gy - ge
    # interleave columns back: (B, H, W/2, 2, C) -> (B, H, W, C)
    gv = jnp.stack([ge, go], axis=3).reshape(gy.shape[0], gy.shape[1],
                                             w, c)
    if w != xp.shape[2]:
        gv = jnp.pad(gv, ((0, 0), (0, 0), (0, xp.shape[2] - w), (0, 0)))
    # channel max: jnp.maximum vjp splits ties 0.5/0.5
    half = jnp.asarray(0.5, gy.dtype)
    s0 = jnp.where(x0 == x1, half,
                   jnp.where(x0 > x1, jnp.ones((), gy.dtype),
                             jnp.zeros((), gy.dtype)))
    g0 = gv * s0
    g1 = gv - g0
    return (jnp.concatenate([g0, g1], axis=-1),)


pool_fast.defvjp(_pool_fwd, _pool_bwd)


def verify():
    rng = np.random.default_rng(0)
    xp = jnp.asarray(rng.normal(0, 1, (2, 8, 10, 6)), jnp.float32)
    # inject exact ties, incl. relu-style zero plateaus
    xp = jnp.where(xp < 0.3, jnp.zeros((), xp.dtype), xp)
    gy = jnp.asarray(rng.normal(0, 1, (2, 8, 5, 3)), jnp.float32)

    y_ref, vjp_ref = jax.vjp(pool_ref, xp)
    y_new, vjp_new = jax.vjp(pool_fast, xp)
    np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_new))
    g_ref = vjp_ref(gy)[0]
    g_new = vjp_new(gy)[0]
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               atol=1e-6)
    print("pool_fast backward matches autodiff semantics exactly")


def timed(fn, x, n1):
    from jax import lax

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


def pool_reshape(xp):
    """Same pool as pool_ref but the horizontal window is reshape+reduce-max:
    no select_and_scatter in the backward (reduce_max's vjp is an eq-mask
    select that fuses; ties split evenly instead of first-column routing)."""
    c = xp.shape[-1] // 2
    v = jnp.maximum(xp[..., :c], xp[..., c:])
    w = v.shape[2] - v.shape[2] % 2
    v = v[:, :, :w]
    b, h = v.shape[0], v.shape[1]
    return jnp.max(v.reshape(b, h, w // 2, 2, c), axis=3)


def pool22_ref(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def pool22_reshape(x):
    b, h, w, c = x.shape
    return jnp.max(x.reshape(b, h // 2, 2, w // 2, 2, c), axis=(2, 4))


def bench():
    rng = np.random.default_rng(0)
    xp = jnp.asarray(rng.normal(0, 1, (8, 128, 256, 128)), jnp.bfloat16)

    for name, pool in [("autodiff", pool_ref), ("custom-vjp", pool_fast),
                       ("reshape-max", pool_reshape)]:
        def step(x):
            def loss(x):
                y = pool(x)
                return jnp.sum((y * y).astype(jnp.float32))
            g = jax.grad(loss)(x)
            return x - 1e-6 * g
        t = timed(step, xp, 200)
        print(f"{name} pool fwd+bwd: {t*1e3:6.3f} ms")

    # unpacked 2x2 pool at the deeper levels (down2: 128ch@128px input)
    xd = jnp.asarray(rng.normal(0, 1, (8, 128, 128, 128)), jnp.bfloat16)
    for name, pool in [("2x2 window", pool22_ref),
                       ("2x2 reshape-max", pool22_reshape)]:
        def step(x):
            def loss(x):
                y = pool(x)
                return jnp.sum((y * y).astype(jnp.float32))
            g = jax.grad(loss)(x)
            return x - 1e-6 * g
        t = timed(step, xd, 200)
        print(f"{name} pool fwd+bwd: {t*1e3:6.3f} ms")


if __name__ == "__main__":
    verify()
    if jax.default_backend() != "cpu":
        bench()
