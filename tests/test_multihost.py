"""Multi-process (multi-host-style) data parallelism over a real
jax.distributed CPU cluster.

The reference has no multi-device correctness story at all
(nn.DataParallel only, reference networks.py:27). This test forms an
actual 2-process cluster — each process contributing 4 virtual CPU devices
to the 8-device global data mesh — via the shared worker
(multimodal_siamese_cd_tpu/parallel/cluster_check.py, also the dryrun's
multi-process surface), and asserts the loss, updated parameters, and
fused-wire-eval F1 match the single-process 8-device run — i.e. the
cross-process gradient all-reduce and sharded eval are semantically
invisible.
"""

import os
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.skipif(os.environ.get("MSCD_SKIP_MULTIPROCESS") == "1",
                    reason="multi-process test disabled")
def test_two_process_step_matches_single_process(tmp_path):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from multimodal_siamese_cd_tpu import train_lib
    from multimodal_siamese_cd_tpu.parallel import data_mesh
    from multimodal_siamese_cd_tpu.parallel.cluster_check import (
        launch_cluster, parse_cluster_output, worker_batch, worker_cfg)
    from multimodal_siamese_cd_tpu.data.synthetic import (
        fixture_cfg_overrides, generate_fixture_dataset)

    fixture = tmp_path / "ds"
    generate_fixture_dataset(fixture, seed=3)

    # bind-then-close port picking is racy: retry once on a fresh port
    for attempt in range(2):
        rcs, results = launch_cluster(4, fixture, REPO)
        if all(rc == 0 for rc in rcs):
            break
    assert all(rc == 0 for rc in rcs), \
        "\n".join(out + "\n" + err for out, err in results)
    cluster, eval_f1 = parse_cluster_output([out for out, _ in results])
    assert set(cluster) == {0, 1}, results
    assert set(eval_f1) == {0, 1}, results

    # single-process 8-device reference with identical inputs
    cfg = worker_cfg(8)
    mesh = data_mesh()
    model, state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    step = train_lib.make_supervised_train_step(model, cfg, mesh=mesh)
    stack, lab = worker_batch(8)
    gstack = jax.device_put(stack, NamedSharding(mesh, P("data")))
    glab = jax.device_put(lab, NamedSharding(mesh, P("data")))
    new_state, metrics = step(jax.device_get(state), gstack, glab,
                              jax.random.PRNGKey(7))
    want_loss = float(metrics["loss"])
    want_sum = float(sum(np.abs(np.asarray(jax.device_get(l))).sum()
                         for l in jax.tree_util.tree_leaves(new_state.params)))

    for pid, (loss, checksum) in cluster.items():
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
