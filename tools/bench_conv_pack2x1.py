#!/usr/bin/env python
"""2x1 vertical space-to-depth packing probe: 3x3 64ch@256px conv as a
50%-dense 3x3 128ch conv on (B,128,256,128). Includes full grad (x AND w)."""
import time
import jax, jax.numpy as jnp, numpy as np
from jax import lax

def conv(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

def timed_chain(fn_step, x0, n1):
    def run_n(n):
        @jax.jit
        def run(x):
            y, _ = lax.scan(lambda x, _: (fn_step(x), None), x, None, length=n)
            return y
        _ = float(jnp.sum(run(x0)[0, 0, 0, :1]))
        best = np.inf
        for _ in range(4):
            t0 = time.perf_counter()
            _ = float(jnp.sum(run(x0)[0, 0, 0, :1]))
            best = min(best, time.perf_counter() - t0)
        return best
    return (run_n(2 * n1) - run_n(n1)) / n1

rng = np.random.default_rng(0)
B = 8
useful = 2 * 9 * 64 * 64 * 256 * 256 * B

# 2x1 packed: x' (B,128,256,128), dense kernel (3,3,128,128) 50% nonzero
xp = jnp.asarray(rng.normal(0, 1, (B, 128, 256, 128)), jnp.bfloat16)
wp = jnp.asarray(rng.normal(0, 1, (3, 3, 128, 128)) / 34, jnp.bfloat16)
t = timed_chain(lambda x: conv(x, wp), xp, 250)
print(f"packed2x1 dense 3x3 fwd:      {t*1e3:6.3f} ms  useful {useful/t/1e12:6.1f} TF/s")

def loss_p(x):
    y = conv(x, wp)
    return 0.5 * jnp.sum(y * y)
t = timed_chain(lambda x: jax.grad(loss_p)(x), xp, 100)
print(f"packed2x1 fwd+dgrad:          {t*1e3:6.3f} ms  useful {2*useful/t/1e12:6.1f} TF/s")

# full training grad (x and w) comparison, baseline vs 2x1 packed
x = jnp.asarray(rng.normal(0, 1, (B, 256, 256, 64)), jnp.bfloat16)
w = jnp.asarray(rng.normal(0, 1, (3, 3, 64, 64)) / 24, jnp.bfloat16)

def full_grad(conv_fn, w):
    def step(x):
        def loss(x, w):
            y = conv_fn(x, w)
            return 0.5 * jnp.sum(y * y)
        gx, gw = jax.grad(loss, argnums=(0, 1))(x, w)
        return gx + 0 * jnp.sum(gw)  # consume gw
    return step

t = timed_chain(full_grad(conv, w), x, 80)
print(f"baseline fwd+dgrad+wgrad:     {t*1e3:6.3f} ms  useful {3*useful/t/1e12:6.1f} TF/s")
t = timed_chain(full_grad(conv, wp), xp, 80)
print(f"packed2x1 fwd+dgrad+wgrad:    {t*1e3:6.3f} ms  useful {3*useful/t/1e12:6.1f} TF/s")

# per-phase 2x1 variant: 2 convs kernel (2,3) K=128 N=64, 75% density
wq = jnp.asarray(rng.normal(0, 1, (2, 2, 3, 128, 64)) / 28, jnp.bfloat16)
def per_phase(x):
    y0 = lax.conv_general_dilated(x, wq[0], (1, 1), [(1, 0), (1, 1)],
                                  dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y1 = lax.conv_general_dilated(x, wq[1], (1, 1), [(0, 1), (1, 1)],
                                  dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jnp.concatenate([y0, y1], axis=-1)
t = timed_chain(per_phase, xp, 200)
print(f"packed2x1 2-phase(2,3) fwd:   {t*1e3:6.3f} ms  useful {useful/t/1e12:6.1f} TF/s")
