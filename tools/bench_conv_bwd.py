#!/usr/bin/env python
"""Fwd and fwd+bwd conv rates per U-Net level shape (honest chaining:
the conv output IS the next iteration's input, so nothing can be DCE'd
or hoisted; loss = 0.5*sum(y^2) so the backward cotangent is data-dependent)."""
import time
import jax, jax.numpy as jnp, numpy as np
from jax import lax

def conv(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

def timed(run, args, flops, n_iter):
    _ = jax.block_until_ready(run(*args)); _ = float(jnp.sum(run(*args)[0, 0, 0, :1]))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(*args)
        _ = float(jnp.sum(out[0, 0, 0, :1]))  # host fetch = sync
        best = min(best, time.perf_counter() - t0)
    return flops * n_iter / best / 1e12

rng = np.random.default_rng(0)
mk = lambda s: jnp.asarray(rng.normal(0, 0.05, s), jnp.bfloat16)
B, N_IT = 8, 20
print(f"# backend={jax.default_backend()} batch={B}")

for (h, c) in [(256, 64), (128, 128), (64, 256), (32, 512), (16, 512),
               (128, 256), (64, 512)]:
    x, w = mk((B, h, h, c)), mk((3, 3, c, c))
    f1 = 2 * 9 * c * c * h * h * B

    @jax.jit
    def run_fwd(x, w):
        def f(x, _):
            y = conv(x, w)
            return y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-3), None
        x, _ = lax.scan(f, x, None, length=N_IT)
        return x

    fwd = timed(run_fwd, (x, w), f1, N_IT)

    @jax.jit
    def run_both(x, w):
        def f(x, _):
            def loss(x, w):
                y = conv(x, w)
                return 0.5 * jnp.sum(y * y), y
            (l, y), gx = jax.value_and_grad(loss, has_aux=True)(x, w)
            del l, y
            return gx / jnp.maximum(jnp.max(jnp.abs(gx)), 1e-3), None
        x, _ = lax.scan(f, x, None, length=N_IT)
        return x

    both = timed(run_both, (x, w), 3 * f1, N_IT)
    print(f"{c:4d}ch @ {h:3d}px   fwd={fwd:6.1f} TF/s   fwd+bwd(dgrad only)={both:6.1f} TF/s")
