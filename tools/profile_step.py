#!/usr/bin/env python
"""Capture a jax.profiler trace of the scanned train step and print the
per-op time breakdown (parses the TensorBoard trace.json.gz)."""
import argparse
import glob, gzip, json, sys, time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax, jax.numpy as jnp, numpy as np

from multimodal_siamese_cd_tpu import train_lib
from multimodal_siamese_cd_tpu.config import load_cfg

ap = argparse.ArgumentParser()
ap.add_argument("batch", nargs="?", type=int, default=8)
ap.add_argument("--regime", default="supervised",
                choices=["supervised", "dualtask", "semisupervised"])
ap.add_argument("--model", default=None,
                help="default: the regime's headline model")
ap.add_argument("--top", type=int, default=40)
a = ap.parse_args()
bs = a.batch
cfg = load_cfg("base")
cfg.MODEL.TYPE = a.model or train_lib.REGIME_MODELS[a.regime]
cfg.TRAINER.BATCH_SIZE = bs
if a.regime == "semisupervised":
    cfg.DATALOADER.INCLUDE_UNLABELED = True
model, state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
step_fn = train_lib.make_scanned_train_step(model, cfg, a.regime, mesh=None)
rng = jax.random.PRNGKey(7)
host = np.random.default_rng(0)
K = 10
stacks = jnp.asarray(host.uniform(0, 1, (K, bs, 15, 256, 256)), jnp.float32)
lab = jnp.ones((K, bs), jnp.float32)

state, m = step_fn(state, stacks, lab, rng)
_ = float(m["loss"])  # compile+sync

out = "/tmp/jaxprof"
jax.profiler.start_trace(out)
for _ in range(2):
    state, m = step_fn(state, stacks, lab, rng)
    _ = float(m["loss"])
jax.profiler.stop_trace()

# parse newest trace.json.gz: device-lane events carry hlo_category,
# long_name and bytes_accessed in args (pid mapped to '/device:TPU:N')
traces = sorted(glob.glob(out + "/**/*trace.json.gz", recursive=True))
assert traces, "no trace written"
with gzip.open(traces[-1], "rt") as f:
    data = json.load(f)
ev = data.get("traceEvents", [])
dev_pids = {e["pid"] for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"
            and "device:" in str(e.get("args", {}).get("name", ""))}
N_STEPS = 2 * K  # two profiled calls of K scanned steps each

by_cat = defaultdict(float)
by_op = defaultdict(lambda: [0.0, 0.0, ""])  # name -> [sec, bytes, long_name]
for e in ev:
    if e.get("ph") != "X" or e.get("pid") not in dev_pids:
        continue
    args = e.get("args", {})
    if "hlo_category" not in args:
        continue
    dur = e.get("dur", 0) / 1e6  # us -> s
    by_cat[args["hlo_category"]] += dur
    rec = by_op[e["name"]]
    rec[0] += dur
    rec[1] += float(args.get("bytes_accessed", 0))
    rec[2] = args.get("long_name", "")

print(f"\nper-category totals over {N_STEPS} steps (ms/step):")
for cat, t in sorted(by_cat.items(), key=lambda kv: -kv[1]):
    print(f"{t*1e3/N_STEPS:9.3f} ms/step  {cat}")
print(f"{sum(by_cat.values())*1e3/N_STEPS:9.3f} ms/step  TOTAL device")

print("\ntop ops (ms/step, achieved GB/s):")
for name, (t, byts, long_name) in sorted(by_op.items(), key=lambda kv: -kv[1][0])[:a.top]:
    gbs = byts / t / 1e9 if t else 0.0
    print(f"{t*1e3/N_STEPS:8.3f} ms {gbs:7.1f} GB/s  {name:32s} {long_name[:90]}")
