"""Golden fixed-seed forward tests: pins init + forward numerics for every
model type so silent numerics drift is caught (SURVEY §4 test plan (e))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_siamese_cd_tpu.config import CfgNode
from multimodal_siamese_cd_tpu.models import create_network, init_variables

# (mean, std, probe value at [0, 7, 9, 0]) of the first head's logits for
# PRNGKey(42) init and a fixed uniform input, fp32, TOPOLOGY [8, 16].
GOLDEN = {
    "unet": (0.01779951, 0.03141550, -0.01424452),
    "siameseunet": (0.03165061, 0.04003280, 0.04268352),
    "dualstreamunet": (0.03029671, 0.03275872, 0.02612482),
    "dtsiameseunet": (0.05015782, 0.04235731, -0.04954473),
    "whatevernet": (0.00967572, 0.02863489, 0.05155794),
    "whatevernet2": (0.04709278, 0.03764550, 0.06501409),
    # regenerated after the round-3 upsampler phase fix (ConvTranspose
    # 'SAME' k3 s2 was one pixel off torch's p1/op1) and the late-round-3
    # t2-bottleneck fix (the decoder consumes x_t2's pooled bottleneck,
    # reference networks.py:625-628) — see
    # test_torch_parity.test_siamunet_diff_forward_parity
    "siamunet_diff": (0.03152155, 0.04590927, -0.08036278),
}


@pytest.mark.parametrize("model_type", sorted(GOLDEN))
def test_golden_forward(model_type):
    cfg = CfgNode({
        "MODEL": {"TYPE": model_type, "IN_CHANNELS": 3, "OUT_CHANNELS": 1,
                  "TOPOLOGY": [8, 16],
                  # goldens pin the reference-shaped graph; the packed
                  # layout is covered by tests/test_packed.py equivalence
                  "PACKED_FULLRES": False},
        "DATALOADER": {"INPUT_MODE": "s1s2", "S1_BANDS": [0, 1],
                       "S2_BANDS": [2, 1, 0, 3]},
        "TRAINER": {"PRECISION": "fp32"},
    })
    model = create_network(cfg)
    variables = init_variables(model, cfg, jax.random.PRNGKey(42))
    r = np.random.default_rng(42)
    x1 = jnp.asarray(r.uniform(size=(2, 32, 32, 6)), jnp.float32)
    x2 = jnp.asarray(r.uniform(size=(2, 32, 32, 6)), jnp.float32)
    out = model.apply(variables, x1, x2, train=False)
    if isinstance(out, tuple):
        out = out[0]
    o = np.asarray(out)
    mean, std, probe = GOLDEN[model_type]
    assert o.mean() == pytest.approx(mean, abs=2e-6)
    assert o.std() == pytest.approx(std, abs=2e-6)
    assert o[0, 7, 9, 0] == pytest.approx(probe, abs=2e-6)
