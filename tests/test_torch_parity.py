"""Forward-parity against the actual PyTorch reference networks.

Builds the reference torch models (imported straight from
/root/reference/utils/networks.py with its ``utils.experiment_manager``
dependency stubbed — it is only used for a type annotation), randomizes their
weights AND BatchNorm running statistics, ports the state_dict into the flax
models via :mod:`multimodal_siamese_cd_tpu.torch_port`, and asserts eval-mode
forward agreement on random inputs for every factory model type.

This is the strongest SpaceNet7-F1 parity proxy available without real data:
it pins conv/BN/ConvTranspose/padding semantics (incl. the Up pad-to-skip at
reference networks.py:437-449 and BN eps/momentum at :391-400) bit-tight,
which synthetic-data convergence tests cannot.
"""

import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference/utils/networks.py")

pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference repo not present")


@pytest.fixture(scope="module")
def ref_networks():
    """Import the reference networks module with utils.experiment_manager
    stubbed (it pulls in fvcore, which is not installed)."""
    torch = pytest.importorskip("torch")
    del torch
    if "utils" not in sys.modules:
        utils_pkg = types.ModuleType("utils")
        em = types.ModuleType("utils.experiment_manager")
        em.CfgNode = type("CfgNode", (), {})
        utils_pkg.experiment_manager = em
        sys.modules["utils"] = utils_pkg
        sys.modules["utils.experiment_manager"] = em
    spec = importlib.util.spec_from_file_location("ref_networks", REFERENCE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _cfg(model_type):
    from multimodal_siamese_cd_tpu.config import load_cfg

    cfg = load_cfg("base")
    cfg.MODEL.TYPE = model_type
    cfg.MODEL.TOPOLOGY = [16, 32]
    # base.yaml leaves IN_CHANNELS at 3; the torch classes trust it while the
    # flax factory derives channels from the band lists — align them for the
    # s1s2 input mode (2 S1 + 4 S2 bands).
    cfg.MODEL.IN_CHANNELS = 6
    cfg.TRAINER.PRECISION = "fp32"  # parity needs fp32 compute
    # pin the reference-shaped graph: 1e-5 parity tolerances are tighter
    # than the packed layout's fp reassociation (tests/test_packed.py
    # proves packed == unpacked separately)
    cfg.MODEL.PACKED_FULLRES = False
    return cfg


def _randomize(torch, net, seed):
    """Random weights + random BN running stats so eval-mode forward
    exercises every ported leaf (default running stats are 0/1 and the
    default BN affine is 1/0, which would mask scale/mean/var mix-ups)."""
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in net.parameters():
            p.copy_(torch.empty_like(p).uniform_(-0.2, 0.2, generator=gen))
        for name, b in net.named_buffers():
            if name.endswith("running_mean"):
                b.copy_(torch.empty_like(b).uniform_(-0.5, 0.5, generator=gen))
            elif name.endswith("running_var"):
                b.copy_(torch.empty_like(b).uniform_(0.5, 1.5, generator=gen))


TYPES = ["unet", "dualstreamunet", "siameseunet", "dtsiameseunet",
         "whatevernet", "whatevernet2"]


@pytest.mark.parametrize("model_type", TYPES)
def test_forward_parity(ref_networks, model_type):
    import torch

    import jax
    from multimodal_siamese_cd_tpu import torch_port
    from multimodal_siamese_cd_tpu.models import create_network, init_variables

    cfg = _cfg(model_type)
    torch_cls = {
        "unet": ref_networks.UNet,
        "dualstreamunet": ref_networks.DualStreamUNet,
        "siameseunet": ref_networks.SiameseUNet,
        "dtsiameseunet": ref_networks.DualTaskSiameseUNet,
        "whatevernet": ref_networks.WhateverNet,
        "whatevernet2": ref_networks.WhateverNet2,
    }[model_type]
    tnet = torch_cls(cfg)
    _randomize(torch, tnet, seed=11)
    tnet.eval()

    model = create_network(cfg)
    variables = init_variables(model, cfg, jax.random.PRNGKey(0))
    variables = torch_port.port_reference_state_dict(
        tnet.state_dict(), variables)

    rng = np.random.default_rng(3)
    n_ch = cfg.MODEL.IN_CHANNELS
    x1 = rng.uniform(0, 1, (2, 32, 32, n_ch)).astype(np.float32)
    x2 = rng.uniform(0, 1, (2, 32, 32, n_ch)).astype(np.float32)

    with torch.no_grad():
        t_out = tnet(torch.from_numpy(x1.transpose(0, 3, 1, 2)),
                     torch.from_numpy(x2.transpose(0, 3, 1, 2)))
    j_out = model.apply(variables, x1, x2, train=False)

    t_outs = list(t_out) if isinstance(t_out, (tuple, list)) else [t_out]
    j_outs = list(j_out) if isinstance(j_out, (tuple, list)) else [j_out]
    assert len(t_outs) == len(j_outs)
    for t, j in zip(t_outs, j_outs):
        t = t.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(j), t, atol=1e-5, rtol=1e-5)


def test_aux_sem_change_head_parity(ref_networks):
    """The dual-task aux head as applied by assessment_semantics.py:117:
    outc_sem_change(cat(sem_t1, sem_t2))."""
    import torch

    import jax
    import jax.numpy as jnp
    from multimodal_siamese_cd_tpu import torch_port
    from multimodal_siamese_cd_tpu.models import create_network, init_variables

    cfg = _cfg("dtsiameseunet")
    tnet = ref_networks.DualTaskSiameseUNet(cfg)
    _randomize(torch, tnet, seed=5)
    tnet.eval()

    model = create_network(cfg)
    variables = init_variables(model, cfg, jax.random.PRNGKey(0))
    variables = torch_port.port_reference_state_dict(
        tnet.state_dict(), variables)

    rng = np.random.default_rng(9)
    s1 = rng.normal(size=(2, 16, 16, 1)).astype(np.float32)
    s2 = rng.normal(size=(2, 16, 16, 1)).astype(np.float32)
    with torch.no_grad():
        t = tnet.outc_sem_change(torch.cat(
            (torch.from_numpy(s1.transpose(0, 3, 1, 2)),
             torch.from_numpy(s2.transpose(0, 3, 1, 2))), dim=1))
    j = model.apply(variables, jnp.asarray(s1), jnp.asarray(s2),
                    method=model.sem_change_head)
    np.testing.assert_allclose(
        np.asarray(j), t.numpy().transpose(0, 2, 3, 1), atol=1e-5, rtol=1e-5)


def test_dataparallel_prefix_and_checkpoint_roundtrip(ref_networks, tmp_path):
    """load_reference_checkpoint handles the reference's on-disk format:
    DataParallel-prefixed network state plus step/optimizer entries
    (reference networks.py:30-38)."""
    import torch

    import jax
    from multimodal_siamese_cd_tpu import torch_port
    from multimodal_siamese_cd_tpu.models import create_network, init_variables

    cfg = _cfg("siameseunet")
    tnet = torch.nn.DataParallel(ref_networks.SiameseUNet(cfg))
    _randomize(torch, tnet, seed=2)
    ckpt_file = tmp_path / "ref_checkpoint100.pt"
    torch.save({"step": 123, "network": tnet.state_dict(), "optimizer": {}},
               ckpt_file)

    model = create_network(cfg)
    variables = init_variables(model, cfg, jax.random.PRNGKey(0))
    variables, step = torch_port.load_reference_checkpoint(ckpt_file, variables)
    assert step == 123

    tnet.eval()
    rng = np.random.default_rng(1)
    x1 = rng.uniform(0, 1, (1, 32, 32, cfg.MODEL.IN_CHANNELS)).astype(np.float32)
    x2 = rng.uniform(0, 1, (1, 32, 32, cfg.MODEL.IN_CHANNELS)).astype(np.float32)
    with torch.no_grad():
        t = tnet(torch.from_numpy(x1.transpose(0, 3, 1, 2)),
                 torch.from_numpy(x2.transpose(0, 3, 1, 2)))
    j = model.apply(variables, x1, x2, train=False)
    np.testing.assert_allclose(
        np.asarray(j), t.numpy().transpose(0, 2, 3, 1), atol=1e-5, rtol=1e-5)


def test_dualtask_train_mode_bn_stat_parity(ref_networks):
    """Train-mode running-statistic updates must follow torch's sequential
    semantics for the twice-applied shared modules of DualTaskSiameseUNet
    (inc/encoder applied to t1 then t2; decoder_sem applied t2 then t1,
    reference networks.py:176-195). Flax variable mutation is sequential
    within one apply, so the retained stats match torch's double update —
    this pins it. running_var differs only by torch's unbiased-variance
    update (factor n/(n-1), n = N*H*W), negligible at training shapes."""
    import torch

    import jax
    from multimodal_siamese_cd_tpu import torch_port
    from multimodal_siamese_cd_tpu.models import create_network, init_variables

    cfg = _cfg("dtsiameseunet")
    tnet = ref_networks.DualTaskSiameseUNet(cfg)
    _randomize(torch, tnet, seed=21)
    tnet.train()

    model = create_network(cfg)
    variables = init_variables(model, cfg, jax.random.PRNGKey(0))
    variables = torch_port.port_reference_state_dict(
        tnet.state_dict(), variables)

    rng = np.random.default_rng(17)
    x1 = rng.uniform(0, 1, (2, 32, 32, 6)).astype(np.float32)
    x2 = rng.uniform(0, 1, (2, 32, 32, 6)).astype(np.float32)

    with torch.no_grad():
        t_outs = tnet(torch.from_numpy(x1.transpose(0, 3, 1, 2)),
                      torch.from_numpy(x2.transpose(0, 3, 1, 2)))
    j_outs, mutated = model.apply(variables, x1, x2, train=True,
                                  mutable=["batch_stats"])

    # train-mode outputs (normalized by batch stats) agree
    for t, j in zip(t_outs, j_outs):
        np.testing.assert_allclose(np.asarray(j),
                                   t.numpy().transpose(0, 2, 3, 1),
                                   atol=2e-5, rtol=1e-4)

    # updated running stats agree leaf-for-leaf
    torch_stats = dict(tnet.named_buffers())
    checked = 0
    for key, buf in torch_stats.items():
        if not (key.endswith("running_mean") or key.endswith("running_var")):
            continue
        coll, path, fn = torch_port._translate_key(key)
        assert coll == "batch_stats"
        leaf = mutated["batch_stats"]
        for p in path:
            leaf = leaf[p]
        kind = key.rsplit(".", 1)[1]
        tol = dict(atol=1e-6, rtol=1e-5) if kind == "running_mean" else \
            dict(atol=1e-6, rtol=2e-3)  # unbiased-var factor n/(n-1), n=2048
        np.testing.assert_allclose(np.asarray(leaf), fn(buf.numpy()), **tol)
        checked += 1
    # every BN in inc/encoder/decoders compared: (1 inc + 2 down + 2x2 up)
    # DoubleConvs x 2 BNs x 2 stats = 28 leaves for topology [16, 32]
    assert checked == 28
