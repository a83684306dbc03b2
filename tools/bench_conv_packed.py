#!/usr/bin/env python
"""Differenced comparison: baseline 3x3 64ch@256px conv vs its exact
space-to-depth per-phase reformulation (4x conv2x2 on 256ch@128px)."""
import time
import jax, jax.numpy as jnp, numpy as np
from jax import lax

print("device:", jax.devices()[0].device_kind)

def convp(x, w, pad):
    return lax.conv_general_dilated(
        x, w, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"))

def per_phase(xp, wq):
    # wq: (4, 2, 2, 256, 64) — one packed 2x2 kernel per output phase
    ys = []
    for k, (pt, pl) in enumerate([(1, 1), (1, 0), (0, 1), (0, 0)]):
        ys.append(convp(xp, wq[k], [(pt, 1 - pt), (pl, 1 - pl)]))
    return jnp.concatenate(ys, axis=-1)

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

# baseline
x = jnp.asarray(rng.normal(0, 1, (B, 256, 256, 64)), jnp.bfloat16)
w = jnp.asarray(rng.normal(0, 1, (3, 3, 64, 64)) / 24, jnp.bfloat16)
t = timed_chain(lambda x: convp(x, w, "SAME"), x, 500)
print(f"baseline 3x3 fwd:        {t*1e3:6.3f} ms  useful {useful/t/1e12:6.1f} TF/s")

def loss_b(x):
    y = convp(x, w, "SAME")
    return 0.5 * jnp.sum(y * y)
t = timed_chain(lambda x: jax.grad(loss_b)(x), x, 170)
print(f"baseline 3x3 fwd+bwd:    {t*1e3:6.3f} ms  useful {3*useful/t/1e12:6.1f} TF/s")

# packed per-phase
xp = jnp.asarray(rng.normal(0, 1, (B, 128, 128, 256)), jnp.bfloat16)
wq = jnp.asarray(rng.normal(0, 1, (4, 2, 2, 256, 64)) / 32, jnp.bfloat16)
t = timed_chain(lambda x: per_phase(x, wq), xp, 300)
print(f"packed 4-phase fwd:      {t*1e3:6.3f} ms  useful {useful/t/1e12:6.1f} TF/s")

def loss_p(x):
    y = per_phase(x, wq)
    return 0.5 * jnp.sum(y * y)
t = timed_chain(lambda x: jax.grad(loss_p)(x), xp, 100)
print(f"packed 4-phase fwd+bwd:  {t*1e3:6.3f} ms  useful {3*useful/t/1e12:6.1f} TF/s")

# dense packed 3x3 for reference
wd = jnp.asarray(rng.normal(0, 1, (3, 3, 256, 256)) / 48, jnp.bfloat16)
t = timed_chain(lambda x: convp(x, wd, "SAME"), xp, 120)
print(f"packed dense 3x3 fwd:    {t*1e3:6.3f} ms  useful {useful/t/1e12:6.1f} TF/s")
def loss_d(x):
    y = convp(x, wd, "SAME")
    return 0.5 * jnp.sum(y * y)
t = timed_chain(lambda x: jax.grad(loss_d)(x), xp, 50)
print(f"packed dense 3x3 f+b:    {t*1e3:6.3f} ms  useful {3*useful/t/1e12:6.1f} TF/s")
