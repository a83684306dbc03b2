"""Multi-process (multi-host-style) data parallelism over a real
jax.distributed CPU cluster.

The reference has no multi-device correctness story at all
(nn.DataParallel only, reference networks.py:27). This test forms an
actual 2-process cluster (Gloo collectives across the process boundary —
the DCN stand-in), each process contributing 4 virtual CPU devices to the
8-device global data mesh, initializes through the SHIPPED env-gated path
(parallel.distributed.maybe_initialize_distributed), runs ONE supervised
optimizer step with each process feeding its local quarter of the global
batch, and asserts the loss and updated parameters match the
single-process 8-device run bit-for-bit in fp32 tolerance — i.e. the
cross-process gradient all-reduce is semantically invisible.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

WORKER = r"""
import os, sys
import numpy as np

pid = int(sys.argv[1])
port = sys.argv[2]
os.environ["MSCD_DISTRIBUTED"] = "1"
os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
os.environ["JAX_NUM_PROCESSES"] = "2"
os.environ["JAX_PROCESS_ID"] = str(pid)

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)

sys.path.insert(0, sys.argv[3])
from multimodal_siamese_cd_tpu.parallel.distributed import maybe_initialize_distributed
assert maybe_initialize_distributed(), "distributed init did not engage"
assert jax.process_count() == 2 and len(jax.devices()) == 8

from jax.sharding import NamedSharding, PartitionSpec as P
from multimodal_siamese_cd_tpu import train_lib
from multimodal_siamese_cd_tpu.config import load_cfg
from multimodal_siamese_cd_tpu.parallel import data_mesh

cfg = load_cfg("base")
cfg.MODEL.TYPE = "siameseunet"
cfg.MODEL.TOPOLOGY = [8, 16]
cfg.TRAINER.BATCH_SIZE = 8
cfg.TRAINER.PRECISION = "fp32"
cfg.AUGMENTATION.CROP_SIZE = 32

mesh = data_mesh()
assert mesh.size == 8
model, state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
step = train_lib.make_supervised_train_step(model, cfg, mesh=mesh)

host = np.random.default_rng(0)
stack = host.uniform(0, 1, (8, 15, 32, 32)).astype(np.float32)
stack[:, 12:] = (stack[:, 12:] > 0.8).astype(np.float32)
lab = np.ones((8,), np.float32)

bsh = NamedSharding(mesh, P("data"))
local = slice(pid * 4, pid * 4 + 4)  # this process's batch quarter... rows
gstack = jax.make_array_from_process_local_data(bsh, stack[local], stack.shape)
glab = jax.make_array_from_process_local_data(bsh, lab[local], lab.shape)

# replicated inputs go in as host (numpy) arrays: each process uploads its
# identical copy, matching how the trainer replicates state
state = jax.device_get(state)
new_state, metrics = step(state, gstack, glab, jax.random.PRNGKey(7))
loss = float(metrics["loss"])
checksum = float(sum(np.abs(np.asarray(jax.device_get(l))).sum()
                     for l in jax.tree_util.tree_leaves(new_state.params)))
print(f"RESULT {pid} {loss:.10f} {checksum:.6f}", flush=True)

# fused wire eval across the 2-process mesh: scene groups shard over the
# global data axis and the per-scene counts come back REPLICATED (the
# evaluation._replicated_jit path) so the host float64 accumulation can
# fetch them on every process — this line crashed with a non-addressable
# fetch before the replicated out_shardings fix.
from multimodal_siamese_cd_tpu import evaluation
from multimodal_siamese_cd_tpu.data.dataset import MultimodalCDDataset
from multimodal_siamese_cd_tpu.data.synthetic import fixture_cfg_overrides

cfg.merge_from_list(fixture_cfg_overrides())
cfg.PATHS.DATASET = sys.argv[4]
ds = MultimodalCDDataset(cfg, "validation", no_augmentations=True,
                         dataset_mode="first_last", disable_multiplier=True,
                         disable_unlabeled=True)
assert ds.supports_eval_wire()
m = evaluation.run_measurer(model, state, ds, np.asarray([0.5]), mesh=mesh)
f1 = float(np.asarray(m.compute_f1()).max())
print(f"EVALF1 {pid} {f1:.10f}", flush=True)
"""


@pytest.mark.skipif(os.environ.get("MSCD_SKIP_MULTIPROCESS") == "1",
                    reason="multi-process test disabled")
def test_two_process_step_matches_single_process(tmp_path):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from multimodal_siamese_cd_tpu import train_lib
    from multimodal_siamese_cd_tpu.config import load_cfg
    from multimodal_siamese_cd_tpu.parallel import data_mesh

    from multimodal_siamese_cd_tpu.data.synthetic import (
        fixture_cfg_overrides, generate_fixture_dataset)

    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    fixture = tmp_path / "ds"
    generate_fixture_dataset(fixture, seed=3)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}

    def run_cluster():
        with socket.socket() as s:  # pick a free coordinator port
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        procs = [subprocess.Popen(
            [sys.executable, str(worker), str(pid), str(port), str(REPO),
             str(fixture)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env) for pid in range(2)]
        results = [p.communicate(timeout=600) for p in procs]
        return [p.returncode for p in procs], results

    # bind-then-close port picking is racy: retry once on a fresh port
    for attempt in range(2):
        rcs, results = run_cluster()
        if all(rc == 0 for rc in rcs):
            break
    assert all(rc == 0 for rc in rcs), \
        "\n".join(out + "\n" + err for out, err in results)
    outs = [out for out, _ in results]

    results = {}
    eval_f1 = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, loss, checksum = line.split()
                results[int(pid)] = (float(loss), float(checksum))
            elif line.startswith("EVALF1"):
                _, pid, f1 = line.split()
                eval_f1[int(pid)] = float(f1)
    assert set(results) == {0, 1}, outs
    assert set(eval_f1) == {0, 1}, outs

    # single-process 8-device reference with identical inputs
    cfg = load_cfg("base")
    cfg.MODEL.TYPE = "siameseunet"
    cfg.MODEL.TOPOLOGY = [8, 16]
    cfg.TRAINER.BATCH_SIZE = 8
    cfg.TRAINER.PRECISION = "fp32"
    cfg.AUGMENTATION.CROP_SIZE = 32

    mesh = data_mesh()
    model, state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    step = train_lib.make_supervised_train_step(model, cfg, mesh=mesh)
    host = np.random.default_rng(0)
    stack = host.uniform(0, 1, (8, 15, 32, 32)).astype(np.float32)
    stack[:, 12:] = (stack[:, 12:] > 0.8).astype(np.float32)
    gstack = jax.device_put(stack, NamedSharding(mesh, P("data")))
    glab = jax.device_put(np.ones((8,), np.float32),
                          NamedSharding(mesh, P("data")))
    new_state, metrics = step(jax.device_get(state), gstack, glab,
                              jax.random.PRNGKey(7))
    want_loss = float(metrics["loss"])
    want_sum = float(sum(np.abs(np.asarray(jax.device_get(l))).sum()
                         for l in jax.tree_util.tree_leaves(new_state.params)))

    for pid, (loss, checksum) in results.items():
        assert abs(loss - want_loss) < 1e-6, (pid, loss, want_loss)
        np.testing.assert_allclose(checksum, want_sum, rtol=1e-6)

    # fused wire eval: single-process F1 with the same fixture/state must
    # match what each process computed over the 2-process mesh
    from multimodal_siamese_cd_tpu import evaluation
    from multimodal_siamese_cd_tpu.data.dataset import MultimodalCDDataset

    cfg.merge_from_list(fixture_cfg_overrides())
    cfg.PATHS.DATASET = str(fixture)
    ds = MultimodalCDDataset(cfg, "validation", no_augmentations=True,
                             dataset_mode="first_last",
                             disable_multiplier=True, disable_unlabeled=True)
    m = evaluation.run_measurer(model, jax.device_get(state), ds,
                                np.asarray([0.5]))
    want_f1 = float(np.asarray(m.compute_f1()).max())
    for pid, f1 in eval_f1.items():
        assert abs(f1 - want_f1) < 1e-6, (pid, f1, want_f1)
