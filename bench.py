#!/usr/bin/env python
"""Benchmark harness: training throughput in patches/sec/chip.

Definition (BASELINE.md): full training step — device-side augmentation +
forward + backward + AdamW update — on 256x256 bitemporal S1+S2 pairs
('s1s2', 6 channels per timestamp) at the config batch size. The default
run measures all three training regimes with their headline models
(supervised SiameseUNet [64,128,256,512] — the primary metric — plus
dual-task DualTaskSiameseUNet and semi-supervised WhateverNet) and emits
them in ONE JSON payload; ``--regime`` restricts to a single regime for
probing. The PyTorch reference measured under the same step definitions by
tools/bench_reference.py provides ``vs_baseline`` (primary regime) and the
per-regime ``vs_torch`` map (see BASELINE.md for numbers and caveats).

Timing methodology: K optimizer steps are fused into one dispatch with
``lax.scan`` (train_lib.make_scanned_train_step) and every timed window is
closed by fetching the loss to host — on the remote-tunneled TPU platform
``block_until_ready`` resolves before execution finishes, so a host fetch
is the only honest synchronization point; the scan also amortizes the
~ms-scale tunnel dispatch latency the same way a production trainer would.

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "patches/sec/chip", "vs_baseline": N,
   "regimes": {"supervised": N, "dualtask": N, "semisupervised": N},
   "vs_torch": {"supervised": N, "dualtask": N, "semisupervised": N}}``
"""

import argparse
import json
import os
import sys
import threading
import time

import jax
import numpy as np

from multimodal_siamese_cd_tpu import train_lib
from multimodal_siamese_cd_tpu.config import load_cfg
from multimodal_siamese_cd_tpu.parallel import data_mesh
from jax.sharding import NamedSharding, PartitionSpec as P

# PyTorch reference throughput under the identical step definitions,
# measured by tools/bench_reference.py on this host's CPU — the only
# hardware torch can use here; one same-session sweep, 2026-08-18 (see
# BASELINE.md for the caveats and history: supervised measured 0.177 in
# an earlier session, 1-core host timing varies ~20% between days).
TORCH_REFERENCE_PATCHES_PER_SEC = {
    "supervised": 0.216,
    "dualtask": 0.083,
    "semisupervised": 0.073,
}

from multimodal_siamese_cd_tpu.train_lib import REGIME_MODELS


# Set by run_regime at its first synchronized warmup fetch — the earliest
# proof the accelerator backend is alive (backend init + first compile +
# one full scanned call all completed).
_FIRST_SYNC = threading.Event()


def _arm_wedge_watchdog(seconds: float) -> None:
    """A wedged remote-TPU tunnel hangs backend-client creation forever
    (observed: a trivial dispatch stuck >10 min while the healthy path is
    ~100 s warmup + ~3-5 min first compile). Exit loudly instead of hanging
    the driver: if the first synchronized warmup fetch (``_FIRST_SYNC``)
    hasn't happened within ``seconds``, dump a diagnostic and die. The
    timed measurement loop runs after the disarm point, so a healthy but
    slow rig (e.g. a CPU-backend smoke run) is never killed."""
    def watch():
        if not _FIRST_SYNC.wait(seconds):
            print(f"BENCH WEDGED: no completed device step after {seconds:.0f}s"
                  " — accelerator backend unreachable (tunnel down?);"
                  " aborting instead of hanging", file=sys.stderr, flush=True)
            # still emit ONE parseable JSON line on stdout so the driver's
            # artifact records a machine-readable failure, not a blank file
            print(json.dumps({"metric": "train_throughput",
                              "value": 0.0, "unit": "patches/s/chip",
                              "vs_baseline": 0.0,
                              "error": f"backend wedged: no device step "
                                       f"within {seconds:.0f}s"}),
                  flush=True)
            os._exit(2)

    threading.Thread(target=watch, daemon=True).start()


def _arm_deadline(seconds: float) -> None:
    """Whole-run backstop: the first-sync watchdog disarms after the FIRST
    regime's fetch, so a tunnel that wedges BETWEEN regimes would still hang
    the driver forever. A healthy 3-regime run is well under 30 min even
    cold (warmup + first compiles); past ``seconds`` we are wedged."""
    def watch():
        time.sleep(seconds)
        print(f"BENCH DEADLINE: run exceeded {seconds:.0f}s — accelerator "
              "backend likely wedged mid-run; aborting instead of hanging",
              file=sys.stderr, flush=True)
        print(json.dumps({"metric": "train_throughput",
                          "value": 0.0, "unit": "patches/s/chip",
                          "vs_baseline": 0.0,
                          "error": f"backend wedged mid-run: exceeded "
                                   f"{seconds:.0f}s deadline"}),
              flush=True)
        os._exit(3)

    threading.Thread(target=watch, daemon=True).start()


def build_payload(results: dict, primary: str) -> dict:
    """Assemble the single-line JSON payload the driver parses. ``results``
    maps regime -> {"value": patches/s/chip, ...}; ``primary`` is the
    headline regime (first measured)."""
    per_chip = results[primary]["value"]
    return {
        "metric": "train_patches_per_sec_per_chip",
        "value": per_chip,
        "unit": "patches/sec/chip",
        "vs_baseline": round(
            per_chip / TORCH_REFERENCE_PATCHES_PER_SEC[primary], 2),
        "regimes": {r: v["value"] for r, v in results.items()},
        "vs_torch": {r: round(v["value"]
                              / TORCH_REFERENCE_PATCHES_PER_SEC[r], 1)
                     for r, v in results.items()},
    }


def build_batches(k: int, batch_size: int, crop: int, rng: np.random.Generator):
    # planar wire stacks (K, B, C, S, S): 12 imagery channels
    # (2x2 S1 + 2x4 S2) + 2 buildings + 1 change
    stacks = rng.uniform(0, 1, size=(k, batch_size, 15, crop, crop)).astype(np.float32)
    stacks[..., 12:, :, :] = (stacks[..., 12:, :, :] > 0.8).astype(np.float32)
    is_labeled = np.ones((k, batch_size), np.float32)
    return stacks, is_labeled


def run_regime(args, regime: str, model_type: str) -> dict:
    """Measure one regime; returns {value (patches/s/chip), total,
    step_ms, chips, loss}."""
    cfg = load_cfg("base")
    cfg.MODEL.TYPE = model_type
    cfg.TRAINER.PRECISION = args.precision
    cfg.AUGMENTATION.CROP_SIZE = args.crop
    batch_size = args.batch_size or cfg.TRAINER.BATCH_SIZE
    cfg.TRAINER.BATCH_SIZE = batch_size
    if regime == "semisupervised":
        cfg.DATALOADER.INCLUDE_UNLABELED = True

    n_chips = len(jax.devices())
    mesh = data_mesh() if batch_size % n_chips == 0 else data_mesh(jax.devices()[:1])

    model, state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    step_fn = train_lib.make_scanned_train_step(model, cfg, regime, mesh=mesh)
    rng = jax.random.PRNGKey(7)

    host = np.random.default_rng(0)
    k = args.steps_per_call
    stacks, is_labeled = build_batches(k, batch_size, args.crop, host)
    stacks = jax.device_put(
        stacks, NamedSharding(mesh, P(None, "data" if mesh.size > 1 else None)))
    is_labeled = jax.device_put(is_labeled)

    # at least one warmup call: it compiles the program AND produces the `m`
    # whose fetch is the pre-window synchronization barrier
    for _ in range(max(1, args.warmup_calls)):
        state, m = step_fn(state, stacks, is_labeled, rng)
    float(m["loss"])  # host fetch = true synchronization
    _FIRST_SYNC.set()  # backend alive — disarm the wedge watchdog

    # Dispatch all calls back-to-back and fetch ONCE at the end: the calls
    # chain through `state`, so the fetched loss existing implies every step
    # completed — an honest total, without serializing the tunnel's ~25 ms
    # fetch RTT into each window (a production trainer fetches metrics every
    # LOG_FREQ=100 steps, far less often than this).
    t0 = time.perf_counter()
    for _ in range(args.calls):
        state, m = step_fn(state, stacks, is_labeled, rng)
    loss = float(m["loss"])
    dt = time.perf_counter() - t0

    n_steps = args.calls * k
    patches_per_sec = batch_size * n_steps / dt
    per_chip = patches_per_sec / mesh.size
    print(f"# regime={regime} model={model_type} batch={batch_size} "
          f"crop={args.crop} precision={args.precision} chips={mesh.size} "
          f"backend={jax.default_backend()} steps={n_steps} "
          f"(scan {k}/call) total={patches_per_sec:.1f} patches/s "
          f"step={dt / n_steps * 1e3:.2f} ms loss={loss:.4f}",
          file=sys.stderr)
    return {"value": round(per_chip, 2), "total": round(patches_per_sec, 2),
            "step_ms": round(dt / n_steps * 1e3, 3), "chips": mesh.size,
            "loss": round(loss, 5)}


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default=None,
                   help="override the regime's headline model")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--crop", type=int, default=256)
    # 20 scanned steps/call (the trainer's auto max_k, BASELINE.md
    # saturation probe) x 5 calls per fetch = one synchronization per 100
    # steps, exactly the production LOG_FREQ cadence the trainer logs at
    p.add_argument("--steps-per-call", type=int, default=20)
    p.add_argument("--calls", type=int, default=5)
    p.add_argument("--warmup-calls", type=int, default=2)
    p.add_argument("--precision", default="bf16")
    p.add_argument("--regime", default=None, choices=list(REGIME_MODELS),
                   help="measure one regime only (default: all three)")
    p.add_argument("--wedge-timeout", type=float, default=1500.0,
                   help="abort if no device step completes within this many "
                        "seconds (wedged-tunnel guard; healthy worst case is "
                        "~100s warmup + ~5 min first compile)")
    p.add_argument("--deadline", type=float, default=3000.0,
                   help="abort if the whole run exceeds this many seconds "
                        "(guards against a tunnel wedging AFTER the first "
                        "regime disarmed --wedge-timeout)")
    p.add_argument("--assert-min", type=float, default=None,
                   help="exit 1 if the primary patches/sec/chip falls below "
                        "this (regression guard; round-2 HEAD: supervised "
                        "328.9, dualtask 197.7, semisup 164.2)")
    args = p.parse_args()
    if args.model and not args.regime:
        # a forced model rarely fits all three regimes (single-head models
        # cannot train the 3-head regimes); fail fast instead of crashing
        # after minutes of compile
        p.error("--model requires --regime")

    regimes = [args.regime] if args.regime else list(REGIME_MODELS)
    _arm_wedge_watchdog(args.wedge_timeout)
    _arm_deadline(args.deadline)
    results = {}
    for regime in regimes:
        model_type = args.model or REGIME_MODELS[regime]
        results[regime] = run_regime(args, regime, model_type)

    result = build_payload(results, regimes[0])
    per_chip = result["value"]
    print(json.dumps(result))
    if args.assert_min is not None and per_chip < args.assert_min:
        print(f"REGRESSION: {per_chip:.1f} < --assert-min {args.assert_min}",
              file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
