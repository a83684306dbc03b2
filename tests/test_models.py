"""Model zoo tests: output shapes/structures per model type, Siamese weight
sharing, analytic parameter-count goldens, odd-size handling, dtype policy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_siamese_cd_tpu.config import CfgNode
from multimodal_siamese_cd_tpu.models import (
    create_network,
    init_variables,
    input_channels,
    param_count,
)

TOPOLOGY = [8, 16]


def make_cfg(model_type: str, input_mode: str = "s1s2", precision: str = "fp32") -> CfgNode:
    return CfgNode({
        "MODEL": {"TYPE": model_type, "IN_CHANNELS": 3, "OUT_CHANNELS": 1,
                  "TOPOLOGY": list(TOPOLOGY)},
        "DATALOADER": {"INPUT_MODE": input_mode, "S1_BANDS": [0, 1],
                       "S2_BANDS": [2, 1, 0, 3]},
        "TRAINER": {"PRECISION": precision},
    })


def init_and_apply(cfg, h=32, w=32, train=False, batch=2):
    model = create_network(cfg)
    variables = init_variables(model, cfg, jax.random.PRNGKey(0))
    c = input_channels(cfg)
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.uniform(size=(batch, h, w, c)), jnp.float32)
    x2 = jnp.asarray(rng.uniform(size=(batch, h, w, c)), jnp.float32)
    kwargs = {}
    if train:
        kwargs = {"mutable": ["batch_stats"], "rngs": {"dropout": jax.random.PRNGKey(1)}}
    out = model.apply(variables, x1, x2, train=train, **kwargs)
    return model, variables, out


@pytest.mark.parametrize("model_type", [
    "unet", "siameseunet", "dualstreamunet", "siamunet_diff"])
def test_single_head_shapes(model_type):
    _, _, out = init_and_apply(make_cfg(model_type))
    assert out.shape == (2, 32, 32, 1)
    assert out.dtype == jnp.float32


def test_dtsiamese_three_heads():
    _, _, outs = init_and_apply(make_cfg("dtsiameseunet"))
    assert isinstance(outs, tuple) and len(outs) == 3
    for o in outs:
        assert o.shape == (2, 32, 32, 1)


@pytest.mark.parametrize("model_type", ["whatevernet", "whatevernet2"])
def test_whatevernet_train_vs_eval_heads(model_type):
    cfg = make_cfg(model_type)
    _, _, out_eval = init_and_apply(cfg, train=False)
    assert out_eval.shape == (2, 32, 32, 1)  # eval: fusion only
    _, _, (out_train, _) = init_and_apply(cfg, train=True)
    assert isinstance(out_train, tuple) and len(out_train) == 3


def test_train_updates_batch_stats():
    cfg = make_cfg("siameseunet")
    model = create_network(cfg)
    variables = init_variables(model, cfg, jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(2, 16, 16, 6)), jnp.float32)
    _, updates = model.apply(variables, x, x * 2, train=True, mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_siamese_weight_sharing():
    cfg = make_cfg("siameseunet")
    model = create_network(cfg)
    variables = init_variables(model, cfg, jax.random.PRNGKey(0))
    params = variables["params"]
    assert "inc" in params and "encoder" in params          # single shared tower
    assert "inc_stream1" not in params
    # WhateverNet: two separate towers
    cfg2 = make_cfg("whatevernet")
    params2 = init_variables(create_network(cfg2), cfg2, jax.random.PRNGKey(0))["params"]
    assert "inc_stream1" in params2 and "inc_stream2" in params2


def test_feature_difference_antisymmetry():
    """SiameseUNet on identical inputs: feature diffs are exactly zero, so
    the output must be independent of the (shared) input image."""
    cfg = make_cfg("siameseunet")
    model = create_network(cfg)
    variables = init_variables(model, cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.uniform(size=(1, 16, 16, 6)), jnp.float32)
    b = jnp.asarray(rng.uniform(size=(1, 16, 16, 6)), jnp.float32)
    out_aa = model.apply(variables, a, a, train=False)
    out_bb = model.apply(variables, b, b, train=False)
    np.testing.assert_allclose(np.asarray(out_aa), np.asarray(out_bb),
                               rtol=1e-4, atol=1e-5)


# Analytic parameter counts for TOPOLOGY [8, 16] (conv/BN/transpose weights
# and biases; BN running stats live in batch_stats, not params — matching
# what torch's .parameters() counts for the reference architecture).
GOLDEN_PARAM_COUNTS = {
    "unet": 15329,         # early fusion: in = 2*3 = 6 channels
    "siameseunet": 15113,  # Siamese: in = 3 channels, shared tower
}


@pytest.mark.parametrize("model_type", sorted(GOLDEN_PARAM_COUNTS))
def test_param_count_golden(model_type):
    cfg = make_cfg(model_type, input_mode="s1")  # 2 bands -> override below
    cfg.MODEL.IN_CHANNELS = 3
    cfg.DATALOADER.INPUT_MODE = "s1s2"
    cfg.DATALOADER.S1_BANDS = [0]
    cfg.DATALOADER.S2_BANDS = [1, 2]  # total 3 channels per timestamp
    model = create_network(cfg)
    variables = init_variables(model, cfg, jax.random.PRNGKey(0))
    assert param_count(variables["params"]) == GOLDEN_PARAM_COUNTS[model_type]


def test_odd_spatial_sizes_preserved():
    cfg = make_cfg("siameseunet")
    _, _, out = init_and_apply(cfg, h=25, w=31)
    assert out.shape == (2, 25, 31, 1)


def test_bf16_compute_fp32_logits():
    cfg = make_cfg("unet", precision="bf16")
    model = create_network(cfg)
    variables = init_variables(model, cfg, jax.random.PRNGKey(0))
    # params stay fp32
    assert all(p.dtype == jnp.float32
               for p in jax.tree_util.tree_leaves(variables["params"]))
    x = jnp.zeros((1, 16, 16, 6), jnp.float32)
    out = model.apply(variables, x, x, train=False)
    assert out.dtype == jnp.float32


def test_unknown_type_raises():
    with pytest.raises(Exception, match="Unknown network"):
        create_network(make_cfg("transformer9000"))


def test_dual_stream_band_split():
    """DualStreamUNet must route S1 bands to stream1 and S2 bands to stream2:
    zeroing the S2 half must not change stream1's decoder output path — check
    via gradient: d out / d x[s2 bands] flows only through stream2 params."""
    cfg = make_cfg("dualstreamunet")
    model = create_network(cfg)
    variables = init_variables(model, cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    x1 = jnp.asarray(rng.uniform(size=(1, 16, 16, 6)), jnp.float32)
    x2 = jnp.asarray(rng.uniform(size=(1, 16, 16, 6)), jnp.float32)

    def loss_fn(params):
        out = model.apply({"params": params,
                           "batch_stats": variables["batch_stats"]},
                          x1, x2, train=False)
        return jnp.sum(out)

    grads = jax.grad(loss_fn)(variables["params"])
    # stream-1 stem sees only the 2 S1 bands (x2 via concat): kernel in-dim 4
    assert grads["inc_stream1"]["conv"]["conv1"]["kernel"].shape[2] == 4
    assert grads["inc_stream2"]["conv"]["conv1"]["kernel"].shape[2] == 8


def test_jit_forward_compiles_once():
    cfg = make_cfg("siameseunet")
    model = create_network(cfg)
    variables = init_variables(model, cfg, jax.random.PRNGKey(0))

    @jax.jit
    def fwd(v, a, b):
        return model.apply(v, a, b, train=False)

    x = jnp.zeros((2, 32, 32, 6), jnp.float32)
    out = fwd(variables, x, x)
    assert out.shape == (2, 32, 32, 1)
