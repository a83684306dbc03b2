#!/usr/bin/env python
"""Per-conv cost via iteration-count differencing: cost(2N)-cost(N) cancels
every fixed per-dispatch cost; the chain is y=conv(y,w) with weights scaled
so activations neither explode nor vanish (no per-iter normalization)."""
import time
import jax, jax.numpy as jnp, numpy as np
from jax import lax

def conv(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

def t_of(n_iter, x, w, bwd):
    if bwd:
        def f(x, _):
            def loss(x):
                y = conv(x, w)
                return 0.5 * jnp.sum(y * y)
            return jax.grad(loss)(x), None
    else:
        def f(x, _):
            return conv(x, w), None

    @jax.jit
    def run(x):
        y, _ = lax.scan(f, x, None, length=n_iter)
        return y

    _ = float(jnp.sum(run(x)[0, 0, 0, :1]))
    best = np.inf
    for _ in range(4):
        t0 = time.perf_counter()
        _ = float(jnp.sum(run(x)[0, 0, 0, :1]))
        best = min(best, time.perf_counter() - t0)
    return best

rng = np.random.default_rng(0)
B = 8
print(f"# backend={jax.default_backend()} batch={B} (differenced 40-20 iters)")
for (h, c) in [(256, 64), (128, 128), (64, 256), (32, 512), (16, 512),
               (128, 256), (64, 512)]:
    x = jnp.asarray(rng.normal(0, 1, (B, h, h, c)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 1, (3, 3, c, c)) / np.sqrt(9 * c), jnp.bfloat16)
    f1 = 2 * 9 * c * c * h * h * B
    row = f"{c:4d}ch @ {h:3d}px "
    for bwd, label, mult in [(False, "fwd", 1), (True, "fwd+dgrad+wgrad", 3)]:
        # size the chain so the differenced window is ~0.5 s (tunnel noise
        # on the host fetch is ~tens of ms)
        est_iter_s = mult * f1 / 100e12
        n1 = max(50, int(0.5 / est_iter_s))
        dt = t_of(2 * n1, x, w, bwd) - t_of(n1, x, w, bwd)
        row += f"  {label}={mult * f1 * n1 / dt / 1e12:6.1f} TF/s ({dt/n1*1e3:5.2f} ms)"
    print(row)
