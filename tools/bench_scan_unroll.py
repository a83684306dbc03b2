#!/usr/bin/env python
"""Measure the scanned train step at several lax.scan unroll factors, plus
an AdamW mu_dtype=bf16 variant.

Hypotheses under test (profiler budget, BASELINE.md round 2):
  - ~1.9 ms/step of "scan staging" copies are while-loop carry/slice
    staging that unrolling lets XLA elide;
  - ~1.5 ms/step of AdamW state traffic shrinks if the first moment is
    stored in bf16 (optax scale_by_adam mu_dtype).

Timing matches bench.py: K steps fused per dispatch, calls chained through
the state, ONE host fetch closes the window (block_until_ready resolves
early on the tunneled axon platform).
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np
import optax

from multimodal_siamese_cd_tpu import train_lib
from multimodal_siamese_cd_tpu.config import load_cfg

BS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
K = 10
CALLS = 5

cfg = load_cfg("base")
cfg.MODEL.TYPE = "siameseunet"
cfg.TRAINER.BATCH_SIZE = BS

host = np.random.default_rng(0)
stacks = host.uniform(0, 1, (K, BS, 15, 256, 256)).astype(np.float32)
stacks[..., 12:, :, :] = (stacks[..., 12:, :, :] > 0.8).astype(np.float32)
stacks = jax.device_put(stacks)
lab = jax.device_put(np.ones((K, BS), np.float32))
rng = jax.random.PRNGKey(7)


def measure(tag, step_fn, state):
    # the jitted step donates its state argument: start each variant from a
    # fresh copy so the reference state survives
    state = jax.tree_util.tree_map(jax.numpy.copy, state)
    for _ in range(2):
        state, m = step_fn(state, stacks, lab, rng)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(CALLS):
        state, m = step_fn(state, stacks, lab, rng)
    loss = float(m["loss"])
    dt = time.perf_counter() - t0
    ms = dt / (CALLS * K) * 1e3
    print(f"{tag:28s} {ms:7.2f} ms/step  {BS / ms * 1e3:7.1f} patches/s  "
          f"loss={loss:.4f}", flush=True)


model, state0 = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))

for unroll in (1, 2, 5):
    fn = train_lib.make_scanned_train_step(model, cfg, "supervised",
                                           mesh=None, unroll=unroll)
    measure(f"unroll={unroll}", fn, state0)

# mu_dtype=bf16 variant: rebuild the optimizer only.
tx = optax.adamw(learning_rate=cfg.TRAINER.LR, b1=0.9, b2=0.999,
                 eps=1e-8, weight_decay=0.01, mu_dtype=jax.numpy.bfloat16)
state_bf16 = train_lib.TrainState.create(
    apply_fn=model.apply, params=state0.params,
    batch_stats=state0.batch_stats, tx=tx)
fn = train_lib.make_scanned_train_step(model, cfg, "supervised", mesh=None)
measure("mu_dtype=bf16 (unroll=1)", fn, state_bf16)
