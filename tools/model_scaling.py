#!/usr/bin/env python
"""Model (don't guess) multi-chip DP scaling from the compiled artifacts.

Round-4 verdict: the multi-chip path has certified correctness (12 dryrun
surfaces, 2-process cluster) but no quantified scaling statement. This tool
produces one WITHOUT multi-chip hardware, the same way the round-4 memory
numbers were produced: AOT-compile the real train step against an
UNATTACHED TPU topology (jax.experimental.topologies, default v5e-8 data
mesh) and read the compiled program itself:

  * collective traffic — every all-reduce/reduce-scatter/all-gather in the
    optimized HLO, with operand bytes (the data-parallel gradient
    all-reduce should be the only payload; tests/test_train_lib.py pins
    that structure on the CPU mesh, this tool sizes it on the TPU one);
  * compute — XLA cost_analysis FLOPs per device per step;
  * a derived compute:communication bound on DP efficiency, stated for a
    bidirectional ring on one torus axis at the public v5e ICI figure
    (45 GB/s per link per direction — see "How to Scale Your Model", v5e
    row) and at the measured single-chip step time (BASELINE.md);
  * the host-feed provisioning table: patches/s demanded per chip count
    vs the measured 1-core loader rate (BASELINE.md 690-784 samples/s),
    i.e. how many loader cores a multi-chip host needs (loader work is
    per-sample and process-shardable — parallel/process_shard).

Usage:
  python tools/model_scaling.py                      # v5e-8, all regimes
  python tools/model_scaling.py --topology v5e-4 --regime supervised

Pure AOT: never touches the attached backend (no 100 s axon warmup, works
with the tunnel down). Each topology compile costs minutes of 1-core CPU
(CLAUDE.md round-4 note); all three regimes ~15-30 min.
"""

import argparse
import json
import re
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from bench_remat_memory import build_step, topology_mesh  # noqa: E402  (same dir)

# ICI: one bidirectional link pair on the torus axis the data mesh rides.
ICI_GBPS_PER_DIR = 45.0  # v5e, GB/s per link per direction (scaling book)
MEASURED_STEP_MS = {  # BASELINE.md round-4 re-pin, bs8 crop256, one v5e chip
    "supervised": 24.19,
    "dualtask": 40.7,       # 8/196.4 patches/s
    "semisupervised": 48.7,  # 8/164.1
}
LOADER_SAMPLES_PER_CORE = 690.0  # measured sustained floor (BASELINE.md)

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "f16": 2, "bf16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1,
}

_COLLECTIVES = ("all-reduce", "reduce-scatter", "all-gather",
                "collective-permute", "all-to-all")


def _shape_bytes(shape_str: str) -> int:
    """Bytes of one HLO shape literal like ``f32[3,3,64,64]`` (layout and
    tuple wrappers already stripped by the caller's regex)."""
    m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
    if not m:
        return 0
    dtype, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES.get(dtype, 4)


_COLL_RE = re.compile(
    # the op name sits between the (possibly tuple, layout-annotated) result
    # shape and its argument list: `... ) all-reduce(%arg, ...` — requiring
    # the preceding shape-terminator+space keeps operand REFERENCES like
    # `get-tuple-element(%all-reduce.255)` (prefixed `%`) from matching, and
    # TPU layout groups like `{0:T(128)S(1)}` from truncating a shape regex
    r"[\]\})] (" + "|".join(_COLLECTIVES) + r")(?:-start)?(?:\.\d+)?\(")


def collective_bytes(hlo_text: str) -> dict:
    """Sum operand bytes per collective kind over the optimized HLO.

    Counts each collective's OUTPUT shapes (for all-reduce output==input
    payload; for reduce-scatter/all-gather the output is the per-device
    honest size). Async `-start`/`-done` pairs count once (the start op
    carries the shapes). Fusion computations can't contain collectives, so
    a flat line scan over instruction definitions is exact.
    """
    per_kind: dict = {}
    for line in hlo_text.splitlines():
        line = line.strip()
        if not (line.startswith("%") or line.startswith("ROOT ")) \
                or " = " not in line:
            continue
        rhs = line.split(" = ", 1)[1]
        m = _COLL_RE.search(rhs)
        if not m:
            continue
        kind = m.group(1)
        shapes = rhs[:m.start() + 1]  # result shape(s), layouts included
        total = sum(_shape_bytes(s)
                    for s in re.findall(r"\w+\[[\d,]*\]", shapes))
        rec = per_kind.setdefault(kind, {"count": 0, "bytes": 0})
        rec["count"] += 1
        rec["bytes"] += total
    return per_kind


def param_bytes(state) -> int:
    import jax

    return sum(np.prod(l.shape) * l.dtype.itemsize
               for l in jax.tree_util.tree_leaves(state.params))


def analyze_regime(regime: str, topology: str, crop: int, batch_per_chip: int):
    import jax

    mesh = topology_mesh(topology, 1)
    n = mesh.size
    batch = batch_per_chip * n
    step, state = build_step([], crop, batch, regime, mesh=mesh)
    stack = jax.ShapeDtypeStruct((batch, 15, crop, crop), np.float16)
    lab = jax.ShapeDtypeStruct((batch,), np.float32)
    rng = jax.ShapeDtypeStruct((2,), np.uint32)
    print(f"# compiling {regime} for {topology} "
          f"(global batch {batch})...", file=sys.stderr, flush=True)
    compiled = step.lower(state, stack, lab, rng).compile()

    colls = collective_bytes(compiled.as_text())
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))

    pbytes = param_bytes(state)
    payload = sum(v["bytes"] for v in colls.values())
    ar_payload = colls.get("all-reduce", {}).get("bytes", 0)

    # ring all-reduce on one bidirectional torus axis: each chip moves
    # 2*(N-1)/N * payload total, split across both directions
    wire_per_chip = 2 * (n - 1) / n * ar_payload
    t_comm_ms = wire_per_chip / (2 * ICI_GBPS_PER_DIR * 1e9) * 1e3
    t_comp_ms = MEASURED_STEP_MS[regime]
    rec = {
        "regime": regime,
        "topology": topology,
        "mesh_devices": n,
        "batch_per_chip": batch_per_chip,
        "crop": crop,
        "param_mib": round(pbytes / 2**20, 2),
        "collectives": colls,
        "allreduce_mib": round(ar_payload / 2**20, 2),
        "allreduce_vs_param_bytes": round(ar_payload / pbytes, 3)
        if pbytes else None,
        "total_collective_mib": round(payload / 2**20, 2),
        "flops_per_device_per_step": flops,
        "measured_step_ms_1chip": t_comp_ms,
        "ici_wire_ms_ring": round(t_comm_ms, 3),
        "dp_efficiency_no_overlap": round(t_comp_ms / (t_comp_ms + t_comm_ms), 4),
        "dp_efficiency_overlapped": round(
            t_comp_ms / max(t_comp_ms, t_comm_ms), 4),
    }
    print(json.dumps(rec), flush=True)
    return rec


def host_feed_table(step_ms: float, batch_per_chip: int):
    rows = []
    for chips in (1, 4, 8, 16):
        demand = chips * batch_per_chip / (step_ms / 1e3)
        cores = int(np.ceil(demand / LOADER_SAMPLES_PER_CORE))
        rows.append({"chips": chips,
                     "patches_per_s_demand": round(demand, 1),
                     "loader_cores_required": cores})
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--topology", default="v5e-8")
    ap.add_argument("--regime", default=None,
                    choices=(None, "supervised", "dualtask", "semisupervised"))
    ap.add_argument("--crop", type=int, default=256)
    ap.add_argument("--batch-per-chip", type=int, default=8)
    args = ap.parse_args()

    regimes = [args.regime] if args.regime else list(MEASURED_STEP_MS)
    out = {"metric": "dp_scaling_model", "topology": args.topology,
           "ici_gbps_per_dir_assumed": ICI_GBPS_PER_DIR,
           "loader_samples_per_core": LOADER_SAMPLES_PER_CORE,
           "regimes": [], "host_feed_supervised": None}
    for regime in regimes:
        out["regimes"].append(
            analyze_regime(regime, args.topology, args.crop,
                           args.batch_per_chip))
    out["host_feed_supervised"] = host_feed_table(
        MEASURED_STEP_MS["supervised"], args.batch_per_chip)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
