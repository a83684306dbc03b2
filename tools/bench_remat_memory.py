#!/usr/bin/env python
"""Measure what MODEL.REMAT and TRAINER.GRAD_ACCUM actually save in device
memory, via XLA's compiled memory analysis.

For each configuration the full train step (augment + fwd + bwd + AdamW)
is lowered and compiled for the attached backend and
``compiled.memory_analysis()`` is read: ``temp_size_in_bytes`` is the
activation/workspace arena (what remat/accumulation shrink),
``argument_size_in_bytes`` the resident state (params + opt state + batch).

Run ON TPU for honest numbers (`python tools/bench_remat_memory.py`):
XLA:TPU's analysis reflects the real HBM scheduler. XLA:CPU's analysis is
NOT memory-scheduling-aware and can report remat as a regression
(documented in models/factory.py) — the tool prints the backend and tags
CPU results advisory.

Compile-only: nothing is executed, so no 100 s warmup fetch is paid —
but backend creation itself hangs forever on a wedged tunnel, so a
watchdog (``--wedge-timeout``, disarmed once the backend exists) aborts
loudly instead, and ``--cpu`` forces the CPU backend through
``jax.config.update`` (the env pins JAX_PLATFORMS=axon at interpreter
startup, so the env var alone cannot).

Output: one JSON line per configuration + a summary line with the
remat and grad-accum temp-arena ratios at the largest requested shape.
"""

import argparse
import json
import os
import sys
import threading
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_step(cfg_overrides, crop, batch, regime="supervised", mesh=None):
    import jax

    from multimodal_siamese_cd_tpu import train_lib
    from multimodal_siamese_cd_tpu.config import load_cfg

    cfg = load_cfg("base")
    cfg.MODEL.TYPE = train_lib.REGIME_MODELS[regime]
    cfg.AUGMENTATION.CROP_SIZE = crop
    cfg.TRAINER.BATCH_SIZE = batch
    if regime == "semisupervised":
        cfg.DATALOADER.INCLUDE_UNLABELED = True
    cfg.merge_from_list([str(x) for x in cfg_overrides])
    if mesh is not None:
        # AOT-against-topology mode: build the state ABSTRACTLY. The jitted
        # step only needs avals to lower, and touching the attached backend
        # here would both pay the ~100 s cold axon dispatch (CLAUDE.md) and
        # materialize every param on a device this compile never uses.
        model = train_lib.create_network(cfg)
        state = jax.eval_shape(
            lambda rng: train_lib.create_train_state(cfg, rng)[1],
            jax.ShapeDtypeStruct((2,), np.uint32))
    else:
        model, state = train_lib.create_train_state(
            cfg, jax.random.PRNGKey(0))
    step = train_lib.make_train_step(model, cfg, regime, mesh=mesh)
    return step, state


def topology_mesh(topology: str, spatial_shards: int):
    """A device mesh over an UNATTACHED TPU topology (jax.experimental
    .topologies) — lets the 1-chip rig AOT-compile multi-chip shardings
    (e.g. TRAINER.SPATIAL_SHARDS) and read their memory analysis."""
    from jax.experimental import topologies

    from multimodal_siamese_cd_tpu.parallel import data_mesh, data_space_mesh

    td = topologies.get_topology_desc(platform="tpu", topology_name=topology)
    devices = list(td.devices)
    if spatial_shards > 1:
        return data_space_mesh(spatial_shards, devices)
    return data_mesh(devices)


def analyze(label, overrides, crop, batch, regime, mesh=None):
    import jax

    step, state = build_step(overrides, crop, batch, regime, mesh=mesh)
    if mesh is not None:
        # AOT against an unattached topology: build_step returned shape
        # structs (the jitted step carries its own in_shardings over the
        # topology mesh); per-device temp/argument sizes come back from the
        # AOT executable
        stack = jax.ShapeDtypeStruct((batch, 15, crop, crop), np.float16)
        lab = jax.ShapeDtypeStruct((batch,), np.float32)
        rng = jax.ShapeDtypeStruct((2,), np.uint32)
    else:
        host = np.random.default_rng(0)
        # f16: the PRODUCTION wire format the loader ships (loader.collate —
        # half the bytes); an f32 stack would inflate argument_size by 2x
        # and compile a different convert graph than the training step runs
        stack = host.uniform(0, 1, (batch, 15, crop, crop)).astype(np.float16)
        stack[:, 12:] = (stack[:, 12:] > 0.8).astype(np.float16)
        lab = np.ones((batch,), np.float32)
        rng = jax.random.PRNGKey(3)
    try:
        compiled = step.lower(state, stack, lab, rng).compile()
    except jax.errors.JaxRuntimeError as e:
        # XLA:TPU refuses to compile a program whose buffer assignment
        # exceeds HBM ("Ran out of memory in memory space hbm" — on the
        # tunneled axon backend the detail lands in the remote compiler's
        # stderr log, the exception itself is an HTTP 500). A config that
        # cannot even compile is the measurement: record it and move on so
        # the levers that DO fit still get analyzed.
        rec = {"label": label, "crop": crop, "batch": batch,
               "regime": regime, "compile_failed": True,
               "error": " ".join(str(e).split())[:200]}
        print(json.dumps(rec), flush=True)
        return rec
    m = compiled.memory_analysis()
    if m is None:
        print(json.dumps({"label": label, "error": "memory_analysis "
                          "unavailable on this backend"}))
        return None
    rec = {
        "label": label,
        "crop": crop,
        "batch": batch,
        "regime": regime,
        "temp_mib": round(m.temp_size_in_bytes / 2**20, 1),
        "argument_mib": round(m.argument_size_in_bytes / 2**20, 1),
        "output_mib": round(m.output_size_in_bytes / 2**20, 1),
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--crop", type=int, default=1024,
                    help="oversized-input shape where memory binds")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--grad-accum", type=int, default=4)
    ap.add_argument("--regime", default="supervised",
                    choices=("supervised", "dualtask", "semisupervised"))
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (advisory numbers)")
    ap.add_argument("--topology", default=None,
                    help="AOT-compile against an unattached TPU topology "
                         "(e.g. 'v5e-4') — enables multi-chip points like "
                         "SPATIAL_SHARDS on a 1-chip rig; sizes are "
                         "PER-DEVICE")
    ap.add_argument("--spatial-shards", type=int, default=1,
                    help="with --topology: shard the crop height over this "
                         "many devices (2-D data x space mesh)")
    ap.add_argument("--wedge-timeout", type=float, default=600.0,
                    help="abort if no backend exists after this many seconds")
    args = ap.parse_args()
    if args.cpu and args.topology:
        ap.error("--cpu and --topology are contradictory: topology mode "
                 "AOT-compiles for the NAMED TPU topology regardless of the "
                 "attached backend, so the numbers would be TPU numbers "
                 "mislabeled as advisory-CPU")

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    backend_up = threading.Event()

    def watch():
        if not backend_up.wait(args.wedge_timeout):
            print(f"WEDGED: no backend after {args.wedge_timeout:.0f}s "
                  "(tunnel down?); aborting", file=sys.stderr, flush=True)
            os._exit(2)

    threading.Thread(target=watch, daemon=True).start()
    if args.topology:
        # pure AOT against an unattached topology: the analysis never
        # touches the attached backend (build_step returns abstract state),
        # so don't probe it — a default_backend() call here would pay the
        # ~100 s axon warmup and wedge outright when the tunnel is down
        backend = f"aot:{args.topology}"
        backend_up.set()
    else:
        backend = jax.default_backend()
        backend_up.set()
    print(f"# backend={backend}"
          + ("  (ADVISORY: XLA:CPU analysis is not memory-scheduling-aware;"
             " run on TPU for honest numbers)" if backend == "cpu" else ""),
        file=sys.stderr, flush=True)

    mesh = None
    extra = []
    if args.topology:
        mesh = topology_mesh(args.topology, args.spatial_shards)
        if args.spatial_shards > 1:
            extra = ["TRAINER.SPATIAL_SHARDS", str(args.spatial_shards)]
        print(f"# AOT topology {args.topology}, mesh {dict(mesh.shape)} "
              f"(per-device sizes)", file=sys.stderr, flush=True)

    base = analyze("plain", extra, args.crop, args.batch, args.regime,
                   mesh=mesh)
    remat = analyze("remat", extra + ["MODEL.REMAT", "True"],
                    args.crop, args.batch, args.regime, mesh=mesh)
    accum = analyze(f"grad_accum_{args.grad_accum}",
                    extra + ["TRAINER.GRAD_ACCUM", str(args.grad_accum)],
                    args.crop, args.batch, args.regime, mesh=mesh)
    both = analyze(f"remat+grad_accum_{args.grad_accum}",
                   extra + ["MODEL.REMAT", "True",
                            "TRAINER.GRAD_ACCUM", str(args.grad_accum)],
                   args.crop, args.batch, args.regime, mesh=mesh)

    summary = {"metric": "remat_memory", "backend": backend,
               "crop": args.crop, "batch": args.batch, "regime": args.regime}
    if args.topology:
        summary["topology"] = args.topology
        summary["mesh"] = dict(mesh.shape)
    base_temp = base.get("temp_mib") if base else None
    if base:
        summary["plain_temp_mib"] = base_temp if base_temp is not None \
            else "COMPILE_OOM"
    for rec in (remat, accum, both):
        if not rec:
            continue
        if rec.get("compile_failed"):
            summary[f"{rec['label']}_temp_mib"] = "COMPILE_OOM"
        elif base_temp:
            summary[f"{rec['label']}_temp_ratio"] = round(
                rec["temp_mib"] / base_temp, 3)
        else:
            summary[f"{rec['label']}_temp_mib"] = rec["temp_mib"]
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
