#!/usr/bin/env python
"""Capture a jax.profiler trace of the scanned train step and print the
per-op time breakdown (parses the TensorBoard trace.json.gz)."""
import glob, gzip, json, sys, time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax, jax.numpy as jnp, numpy as np

from multimodal_siamese_cd_tpu import train_lib
from multimodal_siamese_cd_tpu.config import load_cfg

bs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
cfg = load_cfg("base")
cfg.MODEL.TYPE = "siameseunet"
cfg.TRAINER.BATCH_SIZE = bs
model, state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
step_fn = train_lib.make_scanned_train_step(model, cfg, "supervised", mesh=None)
rng = jax.random.PRNGKey(7)
host = np.random.default_rng(0)
K = 10
stacks = jnp.asarray(host.uniform(0, 1, (K, bs, 256, 256, 15)), jnp.float32)
lab = jnp.ones((K, bs), jnp.float32)

state, m = step_fn(state, stacks, lab, rng)
_ = float(m["loss"])  # compile+sync

out = "/tmp/jaxprof"
jax.profiler.start_trace(out)
for _ in range(2):
    state, m = step_fn(state, stacks, lab, rng)
    _ = float(m["loss"])
jax.profiler.stop_trace()

# parse newest trace.json.gz
traces = sorted(glob.glob(out + "/**/*trace.json.gz", recursive=True))
assert traces, "no trace written"
with gzip.open(traces[-1], "rt") as f:
    data = json.load(f)
ev = [e for e in data.get("traceEvents", []) if e.get("ph") == "X"]
# keep only device-lane events (TensorCore ops have 'dur' and names like fusion.N)
by_name = defaultdict(float)
total = 0.0
for e in ev:
    name = e.get("name", "")
    if name.startswith(("thread", "process")) or "args" not in e:
        pass
    dur = e.get("dur", 0) / 1e6  # us -> s
    pid = e.get("pid", 0)
    tid_name = ""
    by_name[name] += dur
ranked = sorted(by_name.items(), key=lambda kv: -kv[1])
print("top ops by total trace time:")
for name, t in ranked[:40]:
    print(f"{t*1e3:9.2f} ms  {name[:110]}")
