"""Packed full-res layout (models/packed.py) equivalence tests.

MODEL.PACKED_FULLRES must be an exact algebraic reformulation: identical
parameter tree, and outputs/batch-stats equal to the unpacked path up to fp
reassociation (fp32 tolerances here are tight)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_siamese_cd_tpu.config import CfgNode
from multimodal_siamese_cd_tpu.models import create_network, init_variables
from multimodal_siamese_cd_tpu.models import packed as pk


def _cfg(model_type, packed):
    return CfgNode({
        "MODEL": {"TYPE": model_type, "IN_CHANNELS": 3, "OUT_CHANNELS": 1,
                  "TOPOLOGY": [8, 16], "PACKED_FULLRES": packed},
        "DATALOADER": {"INPUT_MODE": "s1s2", "S1_BANDS": [0, 1],
                       "S2_BANDS": [2, 1, 0, 3]},
        "TRAINER": {"PRECISION": "fp32"},
    })


def test_pack_roundtrip_and_primitives():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 10, 7, 3)), jnp.float32)
    np.testing.assert_array_equal(np.asarray(pk.unpack(pk.pack(x))),
                                  np.asarray(x))
    # packed max-pool == standard 2x2 floor-semantics pool
    from multimodal_siamese_cd_tpu.models.blocks import max_pool_2x2

    np.testing.assert_array_equal(
        np.asarray(pk.packed_max_pool(pk.pack(x))),
        np.asarray(max_pool_2x2(x)))
    # packed concat == pack of the channel concat
    y = jnp.asarray(rng.normal(size=(2, 10, 7, 5)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(pk.packed_concat(pk.pack(x), pk.pack(y))),
        np.asarray(pk.pack(jnp.concatenate([x, y], axis=-1))))


TYPES = ["unet", "dualstreamunet", "siameseunet", "dtsiameseunet",
         "whatevernet", "whatevernet2"]


@pytest.mark.parametrize("model_type", TYPES)
def test_packed_matches_unpacked(model_type):
    """Same params -> same eval outputs, same train outputs AND identical
    updated running statistics (tight fp32 tolerances)."""
    m_std = create_network(_cfg(model_type, packed=False))
    m_pk = create_network(_cfg(model_type, packed=True))
    variables = init_variables(m_std, _cfg(model_type, False),
                               jax.random.PRNGKey(3))
    # identical param trees by construction
    v2 = init_variables(m_pk, _cfg(model_type, True), jax.random.PRNGKey(3))
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(v2))
    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_flatten_with_path(variables)[0],
            jax.tree_util.tree_flatten_with_path(v2)[0]):
        assert p1 == p2 and a.shape == b.shape

    rng = np.random.default_rng(11)
    x1 = jnp.asarray(rng.uniform(size=(2, 32, 32, 6)), jnp.float32)
    x2 = jnp.asarray(rng.uniform(size=(2, 32, 32, 6)), jnp.float32)

    def heads(out):
        return list(out) if isinstance(out, tuple) else [out]

    o_std = heads(m_std.apply(variables, x1, x2, train=False))
    o_pk = heads(m_pk.apply(variables, x1, x2, train=False))
    for a, b in zip(o_std, o_pk):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-4, rtol=1e-4)

    (t_std, mut_std) = m_std.apply(variables, x1, x2, train=True,
                                   mutable=["batch_stats"])
    (t_pk, mut_pk) = m_pk.apply(variables, x1, x2, train=True,
                                mutable=["batch_stats"])
    for a, b in zip(heads(t_std), heads(t_pk)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-4, rtol=1e-4)
    flat_s = jax.tree_util.tree_flatten_with_path(mut_std)[0]
    flat_p = jax.tree_util.tree_flatten_with_path(mut_pk)[0]
    for (path, a), (_, b) in zip(flat_s, flat_p):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-4, rtol=1e-4,
                                   err_msg=str(path))


def test_packed_matches_unpacked_bf16():
    """The packed path must track the unpacked one in the PRODUCTION bf16
    precision too. Residual divergence is conv-accumulation reassociation
    (a few bf16 ulps of the logit scale, ~1% here); the old bf16
    PackedBatchNorm affine (flax computes the normalize chain in promoted
    f32 and rounds ONCE) diverged ~31% of scale and fails this bound."""
    c_std, c_pk = _cfg("siameseunet", packed=False), _cfg("siameseunet",
                                                          packed=True)
    c_std.TRAINER.PRECISION = "bf16"
    c_pk.TRAINER.PRECISION = "bf16"
    m_std, m_pk = create_network(c_std), create_network(c_pk)
    variables = init_variables(m_std, c_std, jax.random.PRNGKey(3))
    rng = np.random.default_rng(11)
    x1 = jnp.asarray(rng.uniform(size=(2, 32, 32, 6)), jnp.float32)
    x2 = jnp.asarray(rng.uniform(size=(2, 32, 32, 6)), jnp.float32)
    a, _ = m_std.apply(variables, x1, x2, train=True,
                       mutable=["batch_stats"])
    b, _ = m_pk.apply(variables, x1, x2, train=True, mutable=["batch_stats"])
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    scale = np.abs(a).max()
    assert np.abs(a - b).max() <= 0.05 * scale


def test_packed_matches_unpacked_odd_width():
    """Odd WIDTH stays on the packed path (only even height is required):
    the encoder pool drops the trailing column and Up pads the upsampled map
    back to the skip width — must match the unpacked path exactly."""
    m_std = create_network(_cfg("siameseunet", packed=False))
    m_pk = create_network(_cfg("siameseunet", packed=True))
    variables = init_variables(m_std, _cfg("siameseunet", False),
                               jax.random.PRNGKey(3))
    rng = np.random.default_rng(7)
    x1 = jnp.asarray(rng.uniform(size=(2, 32, 31, 6)), jnp.float32)
    x2 = jnp.asarray(rng.uniform(size=(2, 32, 31, 6)), jnp.float32)
    a = m_std.apply(variables, x1, x2, train=False)
    b = m_pk.apply(variables, x1, x2, train=False)
    assert a.shape == b.shape == (2, 32, 31, 1)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               atol=1e-4, rtol=1e-4)


def test_odd_height_falls_back_unpacked():
    """Odd-height inputs silently run the unpacked path (same module,
    same params)."""
    cfg = _cfg("siameseunet", packed=True)
    model = create_network(cfg)
    variables = init_variables(model, cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.uniform(size=(1, 33, 32, 6)), jnp.float32)
    x2 = jnp.asarray(rng.uniform(size=(1, 33, 32, 6)), jnp.float32)
    out = model.apply(variables, x1, x2, train=False)
    assert out.shape == (1, 33, 32, 1)


def test_packed_train_step_gradients_match():
    """Loss and parameter GRADIENTS of the supervised objective match
    between the packed and unpacked paths (the post-AdamW params are not
    compared: Adam's m/sqrt(v) normalization amplifies fp-reassociation
    noise on near-zero gradients into sign flips at the first step)."""
    from multimodal_siamese_cd_tpu.losses import get_criterion

    rng = np.random.default_rng(5)
    x1 = jnp.asarray(rng.uniform(0, 1, (4, 32, 32, 6)), jnp.float32)
    x2 = jnp.asarray(rng.uniform(0, 1, (4, 32, 32, 6)), jnp.float32)
    y = jnp.asarray((rng.uniform(size=(4, 32, 32, 1)) > 0.8), jnp.float32)
    criterion = get_criterion("PowerJaccardLoss")

    losses, grads = [], []
    for packed in (False, True):
        cfg = _cfg("siameseunet", packed)
        model = create_network(cfg)
        variables = init_variables(model, cfg, jax.random.PRNGKey(0))

        def loss_fn(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x1, x2, train=True, mutable=["batch_stats"])
            return criterion(out, y)

        l, g = jax.value_and_grad(loss_fn)(variables["params"])
        losses.append(float(l))
        grads.append(g)
    assert losses[0] == pytest.approx(losses[1], abs=1e-5)
    num = sum(float(jnp.sum((a - b) ** 2)) for a, b in zip(
        jax.tree_util.tree_leaves(grads[0]), jax.tree_util.tree_leaves(grads[1])))
    den = sum(float(jnp.sum(a ** 2))
              for a in jax.tree_util.tree_leaves(grads[0]))
    # fp32 reassociation through the deep chain + the PowerJaccard ratio
    # leaves ~0.2% relative gradient noise; the bar catches real math bugs.
    assert (num / max(den, 1e-30)) ** 0.5 < 5e-3  # relative L2 over all grads


def test_packed_train_step_gradients_bf16():
    """Gradients through the packed path in the PRODUCTION bf16 precision.

    Regression: the pair-conv f32 accumulate (preferred_element_type) is
    not differentiable in jax 0.9 when the operand dtype differs — every
    bf16 packed train step raised a trace-time TypeError while the fp32
    grad test above stayed green (fp32 operands never hit the mixed-dtype
    transpose). The custom VJP must (a) trace and (b) leave the packed
    path's bf16 gradients no further from fp32 truth than the unpacked
    path's own bf16 gradients are.

    Why the bar is RELATIVE to the unpacked path's noise: at this depth
    bf16 reassociation alone moves gradients ~0.24 relative L2 from fp32
    truth (measured: unpacked-bf16 vs unpacked-fp32 0.238, packed-bf16 vs
    fp32 0.183 — the f32 pair accumulate makes packed slightly MORE
    accurate), so any absolute packed-vs-unpacked bf16 bar just measures
    noise."""
    from multimodal_siamese_cd_tpu.losses import get_criterion

    rng = np.random.default_rng(7)
    x1 = jnp.asarray(rng.uniform(0, 1, (4, 32, 32, 6)), jnp.float32)
    x2 = jnp.asarray(rng.uniform(0, 1, (4, 32, 32, 6)), jnp.float32)
    y = jnp.asarray((rng.uniform(size=(4, 32, 32, 1)) > 0.8), jnp.float32)
    criterion = get_criterion("PowerJaccardLoss")

    losses, grads = {}, {}
    for packed in (False, True):
        for precision in (("fp32",) if not packed else ()) + ("bf16",):
            cfg = _cfg("siameseunet", packed)
            cfg.TRAINER.PRECISION = precision
            model = create_network(cfg)
            variables = init_variables(model, cfg, jax.random.PRNGKey(0))

            def loss_fn(params):
                out, _ = model.apply(
                    {"params": params,
                     "batch_stats": variables["batch_stats"]},
                    x1, x2, train=True, mutable=["batch_stats"])
                return criterion(out, y)

            l, g = jax.value_and_grad(loss_fn)(variables["params"])
            losses[(packed, precision)] = float(l)
            grads[(packed, precision)] = g

    def rel(ga, gb):
        num = sum(float(jnp.sum((a.astype(jnp.float32)
                                 - b.astype(jnp.float32)) ** 2))
                  for a, b in zip(jax.tree_util.tree_leaves(ga),
                                  jax.tree_util.tree_leaves(gb)))
        den = sum(float(jnp.sum(a.astype(jnp.float32) ** 2))
                  for a in jax.tree_util.tree_leaves(ga))
        return (num / max(den, 1e-30)) ** 0.5

    assert losses[(False, "bf16")] == pytest.approx(
        losses[(True, "bf16")], rel=0.02)
    truth = grads[(False, "fp32")]
    noise_floor = rel(truth, grads[(False, "bf16")])
    packed_err = rel(truth, grads[(True, "bf16")])
    # crash above = the trace regression; here: packed bf16 must be at
    # least as close to fp32 truth as plain bf16 is (1.25x margin for
    # seed luck), and sane in absolute terms
    assert packed_err < 1.25 * noise_floor, (packed_err, noise_floor)
    assert packed_err < 0.5, packed_err
