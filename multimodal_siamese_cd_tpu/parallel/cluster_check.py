"""Subprocess worker certifying the multi-PROCESS (multi-host-style) path.

Run as::

    python -m multimodal_siamese_cd_tpu.parallel.cluster_check \
        <process_id> <coordinator_port> <local_device_count> <fixture_dir>

Two such processes form a real ``jax.distributed`` CPU cluster (Gloo
collectives across the process boundary — the DCN stand-in), each
contributing ``local_device_count`` virtual CPU devices to the global data
mesh. The worker initializes through the SHIPPED env-gated path
(``parallel.distributed.maybe_initialize_distributed``), runs ONE supervised
optimizer step with this process feeding its local slice of the global
batch, then runs the fused wire eval with scene groups sharded over the
global mesh. The eval counts come back REPLICATED (the
``evaluation._replicated_jit`` path) so the host float64 accumulation can
fetch them on every process — that line crashed with a non-addressable
fetch before the replicated out_shardings fix.

Output contract (parsed by tests/test_multihost.py and
``__graft_entry__.dryrun_multichip``)::

    RESULT <pid> <loss> <param_abs_sum>
    EVALF1 <pid> <f1>

The reference has no multi-device correctness story at all
(nn.DataParallel only, reference utils/networks.py:27); this path is the
TPU-native multi-host replacement.
"""

import os
import sys


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    pid, port = int(argv[0]), argv[1]
    local_devices, fixture = int(argv[2]), argv[3]

    os.environ["MSCD_DISTRIBUTED"] = "1"
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
    os.environ["JAX_NUM_PROCESSES"] = "2"
    os.environ["JAX_PROCESS_ID"] = str(pid)

    import numpy as np

    import jax

    # the host env pins JAX_PLATFORMS=axon and imports jax at interpreter
    # startup (sitecustomize), so config.update after import is what takes
    # effect — same trick as tests/conftest.py
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", local_devices)

    from multimodal_siamese_cd_tpu.parallel.distributed import (
        maybe_initialize_distributed)

    assert maybe_initialize_distributed(), "distributed init did not engage"
    n_total = 2 * local_devices
    assert jax.process_count() == 2 and len(jax.devices()) == n_total

    from jax.sharding import NamedSharding, PartitionSpec as P

    from multimodal_siamese_cd_tpu import train_lib
    from multimodal_siamese_cd_tpu.parallel import data_mesh

    cfg = worker_cfg(n_total)
    mesh = data_mesh()
    assert mesh.size == n_total
    model, state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    step = train_lib.make_supervised_train_step(model, cfg, mesh=mesh)

    stack, lab = worker_batch(n_total)
    bsh = NamedSharding(mesh, P("data"))
    local = slice(pid * local_devices, (pid + 1) * local_devices)
    gstack = jax.make_array_from_process_local_data(
        bsh, stack[local], stack.shape)
    glab = jax.make_array_from_process_local_data(bsh, lab[local], lab.shape)

    # replicated inputs go in as host (numpy) arrays: each process uploads
    # its identical copy, matching how the trainer replicates state
    state = jax.device_get(state)
    new_state, metrics = step(state, gstack, glab, jax.random.PRNGKey(7))
    loss = float(metrics["loss"])
    checksum = float(sum(np.abs(np.asarray(jax.device_get(l))).sum()
                         for l in jax.tree_util.tree_leaves(new_state.params)))
    print(f"RESULT {pid} {loss:.10f} {checksum:.6f}", flush=True)

    from multimodal_siamese_cd_tpu import evaluation
    from multimodal_siamese_cd_tpu.data.dataset import MultimodalCDDataset
    from multimodal_siamese_cd_tpu.data.synthetic import fixture_cfg_overrides

    cfg.merge_from_list(fixture_cfg_overrides())
    cfg.PATHS.DATASET = fixture
    ds = MultimodalCDDataset(cfg, "validation", no_augmentations=True,
                             dataset_mode="first_last",
                             disable_multiplier=True, disable_unlabeled=True)
    assert ds.supports_eval_wire(), "wire fast path not armed"
    m = evaluation.run_measurer(model, state, ds, np.asarray([0.5]),
                                mesh=mesh)
    f1 = float(np.asarray(m.compute_f1()).max())
    print(f"EVALF1 {pid} {f1:.10f}", flush=True)


def worker_cfg(batch_size):
    """The exact model/trainer config the workers run — exposed so the
    parent (test or dryrun) can reproduce the step single-process."""
    from multimodal_siamese_cd_tpu.config import load_cfg

    cfg = load_cfg("base")
    cfg.MODEL.TYPE = "siameseunet"
    cfg.MODEL.TOPOLOGY = [8, 16]
    cfg.TRAINER.BATCH_SIZE = batch_size
    cfg.TRAINER.PRECISION = "fp32"
    cfg.AUGMENTATION.CROP_SIZE = 32
    return cfg


def worker_batch(batch_size):
    """The deterministic global batch every worker slices locally."""
    import numpy as np

    host = np.random.default_rng(0)
    stack = host.uniform(0, 1, (batch_size, 15, 32, 32)).astype(np.float32)
    stack[:, 12:] = (stack[:, 12:] > 0.8).astype(np.float32)
    return stack, np.ones((batch_size,), np.float32)


def launch_cluster(local_devices, fixture_dir, repo_root, timeout=600):
    """Spawn the 2-process cluster and return ``(rcs, [(out, err), ...])``.

    Picks a free coordinator port (bind-then-close — racy, so callers retry
    once on failure), strips the pinned XLA_FLAGS / JAX_PLATFORMS from the
    child env, and runs each worker with the repo root on its import path.

    ``timeout`` bounds the WHOLE launch (one shared deadline, not one
    budget per worker): callers with their own wall-clock budget — the
    dryrun runs inside test_cli's 900 s subprocess cap — size it so a hung
    worker plus one retry still fits.
    """
    import socket
    import subprocess
    import time

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (str(repo_root), env.get("PYTHONPATH")) if p)
    procs = [subprocess.Popen(
        [sys.executable, "-m",
         "multimodal_siamese_cd_tpu.parallel.cluster_check",
         str(pid), str(port), str(local_devices), str(fixture_dir)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=env, cwd=str(repo_root)) for pid in range(2)]
    deadline = time.monotonic() + timeout
    results = []
    for p in procs:
        try:
            results.append(
                p.communicate(timeout=max(1.0, deadline - time.monotonic())))
        except subprocess.TimeoutExpired:
            # a hung worker (coordinator port race, wedged backend) must
            # surface as a nonzero rc so the callers' retry loops engage —
            # and BOTH workers must be reaped (the peer blocks on the same
            # coordinator), not left orphaned on this 1-CPU host
            for q in procs:
                if q.poll() is None:
                    q.kill()
            results.append(p.communicate())
    return [p.returncode for p in procs], results


def single_process_reference(n_devices, fixture_dir, mesh=None):
    """Reproduce the cluster workers' step + fused eval single-process.

    Same cfg/seed/global batch as :func:`main` on this process's own
    ``n_devices``-device mesh — returns ``(loss, param_checksum, f1)``,
    the values every worker's RESULT/EVALF1 lines must match. Shared by
    tests/test_multihost.py and ``__graft_entry__.dryrun_multichip`` so
    the worker protocol has ONE reference implementation.
    """
    import numpy as np

    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from multimodal_siamese_cd_tpu import evaluation, train_lib
    from multimodal_siamese_cd_tpu.data.dataset import MultimodalCDDataset
    from multimodal_siamese_cd_tpu.data.synthetic import fixture_cfg_overrides
    from multimodal_siamese_cd_tpu.parallel import data_mesh

    if mesh is None:
        mesh = data_mesh()
    cfg = worker_cfg(n_devices)
    model, state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    step = train_lib.make_supervised_train_step(model, cfg, mesh=mesh)
    stack, lab = worker_batch(n_devices)
    bsh = NamedSharding(mesh, P("data"))
    new_state, metrics = step(jax.device_get(state),
                              jax.device_put(stack, bsh),
                              jax.device_put(lab, bsh),
                              jax.random.PRNGKey(7))
    loss = float(metrics["loss"])
    checksum = float(sum(np.abs(np.asarray(jax.device_get(l))).sum()
                         for l in jax.tree_util.tree_leaves(new_state.params)))

    cfg.merge_from_list(fixture_cfg_overrides())
    cfg.PATHS.DATASET = str(fixture_dir)
    ds = MultimodalCDDataset(cfg, "validation", no_augmentations=True,
                             dataset_mode="first_last",
                             disable_multiplier=True, disable_unlabeled=True)
    m = evaluation.run_measurer(model, jax.device_get(state), ds,
                                np.asarray([0.5]))
    f1 = float(np.asarray(m.compute_f1()).max())
    return loss, checksum, f1


def parse_cluster_output(outs):
    """Parse RESULT/EVALF1 lines → ``({pid: (loss, checksum)}, {pid: f1})``."""
    results, eval_f1 = {}, {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, loss, checksum = line.split()
                results[int(pid)] = (float(loss), float(checksum))
            elif line.startswith("EVALF1"):
                _, pid, f1 = line.split()
                eval_f1[int(pid)] = float(f1)
    return results, eval_f1


if __name__ == "__main__":
    main()
