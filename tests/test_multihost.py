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
    from multimodal_siamese_cd_tpu.data.synthetic import (
        generate_fixture_dataset)
    from multimodal_siamese_cd_tpu.parallel.cluster_check import (
        launch_cluster, parse_cluster_output, single_process_reference)

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

    # single-process 8-device reference with identical inputs (the shared
    # implementation — also what the dryrun's cluster surface checks
    # against): cross-process grad all-reduce and sharded eval must be
    # semantically invisible
    want_loss, want_sum, want_f1 = single_process_reference(8, fixture)
    for pid, (loss, checksum) in cluster.items():
        assert abs(loss - want_loss) < 1e-6, (pid, loss, want_loss)
        np.testing.assert_allclose(checksum, want_sum, rtol=1e-6)
    for pid, f1 in eval_f1.items():
        assert abs(f1 - want_f1) < 1e-6, (pid, f1, want_f1)
