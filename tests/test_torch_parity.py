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


# ---------------------------------------------------------------------------
# Train-STEP parity: loss + gradients through the SHIPPED train steps vs the
# reference trainer semantics (train_supervised.py:63-79,
# train_semisupervised.py:66-118, dual-task intent), using the reference's
# own loss_functions.py for the torch side. Gradients are captured exactly
# by a recording optax transformation inside the step (no reconstruction
# rounding). Together with test_adamw_trajectory_parity (optimizer
# arithmetic) and the BN-stat parity test above, this pins the full chain.
# ---------------------------------------------------------------------------

REF_LOSSES = Path("/root/reference/utils/loss_functions.py")


@pytest.fixture(scope="module")
def ref_losses():
    pytest.importorskip("torch")
    spec = importlib.util.spec_from_file_location("ref_losses", REF_LOSSES)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _train_cfg(model_type):
    cfg = _cfg(model_type)
    a = cfg.AUGMENTATION
    a.RANDOM_FLIP = False
    a.RANDOM_ROTATE = False
    a.COLOR_SHIFT = False
    a.GAMMA_CORRECTION = False  # device augmentation becomes the identity
    return cfg


def _make_stack(batch=4, size=32, seed=23):
    """Joint training stack [s1_t1|s1_t2|s2_t1|s2_t2|b_t1|b_t2|change]."""
    rng = np.random.default_rng(seed)
    stack = rng.uniform(0, 1, (batch, size, size, 15)).astype(np.float32)
    stack[..., 12:] = (stack[..., 12:] > 0.7).astype(np.float32)
    return stack


def _capture_step_grads(model, cfg, variables, regime, stack, is_labeled):
    """Run the SHIPPED (unjitted) train step with a gradient-CAPTURING
    optimizer: tx.update records the exact gradient tree the step feeds to
    apply_gradients (no reconstruction rounding) and applies a zero update."""
    import jax
    import optax
    from multimodal_siamese_cd_tpu import train_lib

    captured = {}

    def capture_update(grads, tx_state, params=None):
        captured["grads"] = grads
        return jax.tree_util.tree_map(lambda g: g * 0.0, grads), tx_state

    tx = optax.GradientTransformation(lambda params: optax.EmptyState(),
                                      capture_update)
    state = train_lib.TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats", {}), tx=tx)
    step = train_lib.make_train_step(model, cfg, regime, mesh=None, jit=False)
    _, metrics = step(state, train_lib.nhwc_to_wire(stack), is_labeled,
                      jax.random.PRNGKey(0))
    return metrics, captured["grads"]


def _compare_grads(torch_net, jax_grads):
    """Leaf-for-leaf torch-grad vs jax-grad comparison through the same
    key translation the weight port uses (index permutations commute with
    differentiation). Params unused by the torch forward (grad None) must
    have exactly-zero jax gradients."""
    from multimodal_siamese_cd_tpu import torch_port

    num, den = 0.0, 0.0
    checked = zero_checked = 0
    for key, p in torch_net.named_parameters():
        coll, path, fn = torch_port._translate_key(key)
        assert coll == "params"
        leaf = jax_grads
        for part in path:
            leaf = leaf[part]
        leaf = np.asarray(leaf)
        if p.grad is None:
            np.testing.assert_array_equal(leaf, np.zeros_like(leaf))
            zero_checked += 1
            continue
        t = fn(p.grad.numpy())
        np.testing.assert_allclose(leaf, t, atol=1e-4, rtol=1e-2)
        num += float(((leaf - t) ** 2).sum())
        den += float((t ** 2).sum())
        checked += 1
    assert checked > 0
    # Measured torch-vs-jax fp32 accumulation noise: 3e-5 (supervised,
    # single head) to 8e-4 (whatevernet all-labeled, tiny grads) relative
    # L2. Any semantic mismatch (loss weighting, masked denominators, BN
    # eps) lands at 1e-2 or above; 5e-3 separates the two regimes cleanly.
    assert (num / max(den, 1e-30)) ** 0.5 < 5e-3  # global relative L2
    return checked, zero_checked


@pytest.mark.parametrize("model_type", ["siameseunet", "unet"])
def test_supervised_step_loss_and_grad_parity(ref_networks, ref_losses,
                                              model_type):
    """Reference supervised step (train_supervised.py:63-79): loss =
    criterion(net(x_t1, x_t2), y_change), net in train mode."""
    import torch

    import jax
    from multimodal_siamese_cd_tpu import torch_port, train_lib
    from multimodal_siamese_cd_tpu.models import create_network, init_variables

    cfg = _train_cfg(model_type)
    torch_cls = {"siameseunet": ref_networks.SiameseUNet,
                 "unet": ref_networks.UNet}[model_type]
    tnet = torch_cls(cfg)
    _randomize(torch, tnet, seed=31)
    tnet.train()

    model = create_network(cfg)
    variables = init_variables(model, cfg, jax.random.PRNGKey(0))
    variables = torch_port.port_reference_state_dict(tnet.state_dict(),
                                                     variables)

    stack = _make_stack()
    layout = train_lib.stack_layout(cfg)
    x1, x2, y, _, _ = train_lib.split_stack(stack, layout)
    to_t = lambda a: torch.from_numpy(np.asarray(a).transpose(0, 3, 1, 2))

    criterion = ref_losses.get_criterion(cfg.MODEL.LOSS_TYPE)
    logits = tnet(to_t(x1), to_t(x2))
    t_loss = criterion(logits, to_t(y))
    t_loss.backward()

    metrics, grads = _capture_step_grads(
        model, cfg, variables, "supervised", stack,
        np.ones((stack.shape[0],), np.float32))

    assert abs(float(metrics["loss"]) - float(t_loss)) < 2e-6
    _compare_grads(tnet, grads)


def test_dualtask_step_loss_and_grad_parity(ref_networks, ref_losses):
    """Dual-task intent (reference train_supervised_dualtask.py:73-85,
    rebuilt): loss = (change + (sem_t1 + sem_t2) / 2) / 2."""
    import torch

    import jax
    from multimodal_siamese_cd_tpu import torch_port, train_lib
    from multimodal_siamese_cd_tpu.models import create_network, init_variables

    cfg = _train_cfg("dtsiameseunet")
    tnet = ref_networks.DualTaskSiameseUNet(cfg)
    _randomize(torch, tnet, seed=37)
    tnet.train()

    model = create_network(cfg)
    variables = init_variables(model, cfg, jax.random.PRNGKey(0))
    variables = torch_port.port_reference_state_dict(tnet.state_dict(),
                                                     variables)

    stack = _make_stack(seed=29)
    layout = train_lib.stack_layout(cfg)
    x1, x2, y, ys1, ys2 = train_lib.split_stack(stack, layout)
    to_t = lambda a: torch.from_numpy(np.asarray(a).transpose(0, 3, 1, 2))

    criterion = ref_losses.get_criterion(cfg.MODEL.LOSS_TYPE)
    lc, ls1, ls2 = tnet(to_t(x1), to_t(x2))
    t_loss = (criterion(lc, to_t(y))
              + (criterion(ls1, to_t(ys1)) + criterion(ls2, to_t(ys2))) / 2) / 2
    t_loss.backward()

    metrics, grads = _capture_step_grads(
        model, cfg, variables, "dualtask", stack,
        np.ones((stack.shape[0],), np.float32))

    assert abs(float(metrics["loss"]) - float(t_loss)) < 2e-6
    checked, zero_checked = _compare_grads(tnet, grads)
    assert zero_checked == 2  # outc_sem_change is unused in the forward


@pytest.mark.parametrize("labeled", [[1, 1, 0, 0], [1, 1, 1, 1], [0, 0, 0, 0]])
def test_semisupervised_step_loss_and_grad_parity(ref_networks, ref_losses,
                                                  labeled):
    """Reference semi-supervised composition (train_semisupervised.py:74-118):
    boolean-indexed sup/cons partitions with the sup-only / cons-only / both
    fallback — our masked formulation must match loss AND gradients for
    mixed, all-labeled and all-unlabeled batches."""
    import torch

    import jax
    from multimodal_siamese_cd_tpu import torch_port, train_lib
    from multimodal_siamese_cd_tpu.models import create_network, init_variables

    cfg = _train_cfg("whatevernet")
    tnet = ref_networks.WhateverNet(cfg)
    _randomize(torch, tnet, seed=41)
    tnet.train()

    model = create_network(cfg)
    variables = init_variables(model, cfg, jax.random.PRNGKey(0))
    variables = torch_port.port_reference_state_dict(tnet.state_dict(),
                                                     variables)

    stack = _make_stack(seed=43)
    layout = train_lib.stack_layout(cfg)
    x1, x2, y, _, _ = train_lib.split_stack(stack, layout)
    to_t = lambda a: torch.from_numpy(np.asarray(a).transpose(0, 3, 1, 2))

    sup_criterion = ref_losses.get_criterion(cfg.MODEL.LOSS_TYPE)
    cons_criterion = ref_losses.get_criterion(
        cfg.CONSISTENCY_TRAINER.LOSS_TYPE)
    alpha = cfg.CONSISTENCY_TRAINER.LOSS_FACTOR

    is_labeled = torch.tensor(labeled, dtype=torch.bool)
    lf, l1, l2 = tnet(to_t(x1), to_t(x2))
    p1, p2 = torch.sigmoid(l1), torch.sigmoid(l2)
    y_t = to_t(y)
    sup_loss = cons_loss = None
    if is_labeled.any():
        sup_loss = alpha * (sup_criterion(lf[is_labeled], y_t[is_labeled])
                            + sup_criterion(l1[is_labeled], y_t[is_labeled])
                            + sup_criterion(l2[is_labeled], y_t[is_labeled])) / 3
    if not is_labeled.all():
        nl = torch.logical_not(is_labeled)
        if cfg.CONSISTENCY_TRAINER.LOSS_TYPE == 'L2':
            cons_loss = cons_criterion(p1[nl], p2[nl])
        else:
            cons_loss = cons_criterion(l1[nl], p2[nl])
        cons_loss = (1 - alpha) * cons_loss
    t_loss = (cons_loss if sup_loss is None else
              sup_loss if cons_loss is None else sup_loss + cons_loss)
    t_loss.backward()

    metrics, grads = _capture_step_grads(
        model, cfg, variables, "semisupervised", stack,
        np.asarray(labeled, np.float32))

    assert abs(float(metrics["loss"]) - float(t_loss)) < 2e-6
    _compare_grads(tnet, grads)


def test_supervised_training_trajectory_parity(ref_networks, ref_losses):
    """Capstone integration pin: FIVE full optimizer steps of the shipped
    supervised train step (real AdamW this time) against the reference
    training loop (train_supervised.py:63-79 + AdamW at :32) from identical
    init on an identical batch sequence — loss curves must track. This
    exercises the grad/optimizer/BN-running-stat interplay across steps
    that the single-step tests can't see."""
    import torch

    import jax
    import optax
    from multimodal_siamese_cd_tpu import torch_port, train_lib
    from multimodal_siamese_cd_tpu.models import create_network, init_variables

    cfg = _train_cfg("siameseunet")
    lr = 1e-3  # large enough that parameter drift would show by step 5
    tnet = ref_networks.SiameseUNet(cfg)
    _randomize(torch, tnet, seed=51)
    tnet.train()
    opt = torch.optim.AdamW(tnet.parameters(), lr=lr, betas=(0.9, 0.999),
                            eps=1e-8, weight_decay=0.01)
    criterion = ref_losses.get_criterion(cfg.MODEL.LOSS_TYPE)

    model = create_network(cfg)
    variables = init_variables(model, cfg, jax.random.PRNGKey(0))
    variables = torch_port.port_reference_state_dict(tnet.state_dict(),
                                                     variables)
    state = train_lib.TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables["batch_stats"],
        tx=optax.adamw(learning_rate=lr, b1=0.9, b2=0.999, eps=1e-8,
                       weight_decay=0.01))
    step = train_lib.make_train_step(model, cfg, "supervised", mesh=None,
                                     jit=False)

    layout = train_lib.stack_layout(cfg)
    ones = np.ones((4,), np.float32)
    to_t = lambda a: torch.from_numpy(
        np.ascontiguousarray(np.asarray(a).transpose(0, 3, 1, 2)))
    rng = jax.random.PRNGKey(0)

    t_losses, j_losses = [], []
    for i in range(5):
        stack = _make_stack(seed=100 + i)
        x1, x2, y, _, _ = train_lib.split_stack(stack, layout)

        opt.zero_grad()
        t_loss = criterion(tnet(to_t(x1), to_t(x2)), to_t(y))
        t_loss.backward()
        opt.step()
        t_losses.append(float(t_loss))

        state, metrics = step(state, train_lib.nhwc_to_wire(stack), ones, rng)
        j_losses.append(float(metrics["loss"]))

    np.testing.assert_allclose(j_losses, t_losses, atol=5e-5, rtol=1e-4)
    # the curve moved (the comparison is not vacuous)
    assert abs(t_losses[-1] - t_losses[0]) > 1e-3


def test_adamw_trajectory_parity():
    """optax.adamw must reproduce torch.optim.AdamW (the reference's
    optimizer, train_supervised.py:32: lr, wd=0.01, torch default betas/eps)
    step-for-step on an identical gradient sequence."""
    import torch

    import jax
    import jax.numpy as jnp
    import optax

    rng = np.random.default_rng(7)
    shapes = [(4, 3), (7,), (2, 2, 3, 5)]
    init = [rng.normal(size=s).astype(np.float32) for s in shapes]
    grad_seq = [[rng.normal(size=s).astype(np.float32) for s in shapes]
                for _ in range(5)]

    t_params = [torch.nn.Parameter(torch.from_numpy(p.copy())) for p in init]
    opt = torch.optim.AdamW(t_params, lr=1e-3, betas=(0.9, 0.999),
                            eps=1e-8, weight_decay=0.01)
    for grads in grad_seq:
        opt.zero_grad()
        for p, g in zip(t_params, grads):
            p.grad = torch.from_numpy(g.copy())
        opt.step()

    tx = optax.adamw(learning_rate=1e-3, b1=0.9, b2=0.999, eps=1e-8,
                     weight_decay=0.01)
    j_params = [jnp.asarray(p) for p in init]
    opt_state = tx.init(j_params)
    for grads in grad_seq:
        updates, opt_state = tx.update([jnp.asarray(g) for g in grads],
                                       opt_state, j_params)
        j_params = optax.apply_updates(j_params, updates)

    for t, j in zip(t_params, j_params):
        np.testing.assert_allclose(np.asarray(j), t.detach().numpy(),
                                   atol=1e-7, rtol=1e-6)


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


def test_siamunet_diff_forward_parity(ref_networks):
    """Eval-mode forward parity for the vendored FC-Siam-diff (reference
    networks.py:466-658; dead code upstream — unreachable from the factory —
    but registered here, so its conv/convT/replication-pad/abs-diff
    semantics are pinned too). The reference class reads legacy cfg keys
    (DATALOADER.SENSOR / SENTINEL1_BANDS / SENTINEL2_BANDS) and takes ONE
    concatenated input tensor; ours takes (x_t1, x_t2)."""
    import torch

    import jax
    from multimodal_siamese_cd_tpu import torch_port
    from multimodal_siamese_cd_tpu.models import create_network, init_variables

    cfg = _cfg("siamunet_diff")
    # the legacy keys the vendored class trusts (SURVEY §2.6 item 7)
    cfg.DATALOADER.SENSOR = "s1s2"
    cfg.DATALOADER.SENTINEL1_BANDS = list(cfg.DATALOADER.S1_BANDS)
    cfg.DATALOADER.SENTINEL2_BANDS = list(cfg.DATALOADER.S2_BANDS)

    tnet = ref_networks.SiamUnet_diff(cfg)
    _randomize(torch, tnet, seed=61)
    tnet.eval()

    model = create_network(cfg)
    variables = init_variables(model, cfg, jax.random.PRNGKey(0))
    variables = torch_port.port_siamunet_diff_state_dict(
        tnet.state_dict(), variables)

    rng = np.random.default_rng(13)
    n_s1, n_s2 = len(cfg.DATALOADER.S1_BANDS), len(cfg.DATALOADER.S2_BANDS)
    s1_t1 = rng.uniform(0, 1, (2, 32, 32, n_s1)).astype(np.float32)
    s1_t2 = rng.uniform(0, 1, (2, 32, 32, n_s1)).astype(np.float32)
    s2_t1 = rng.uniform(0, 1, (2, 32, 32, n_s2)).astype(np.float32)
    s2_t2 = rng.uniform(0, 1, (2, 32, 32, n_s2)).astype(np.float32)

    # reference input layout: [s1_t1 | s1_t2 | s2_t1 | s2_t2] channels
    x = np.concatenate([s1_t1, s1_t2, s2_t1, s2_t2], axis=-1)
    with torch.no_grad():
        t_out = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    x_t1 = np.concatenate([s1_t1, s2_t1], axis=-1)
    x_t2 = np.concatenate([s1_t2, s2_t2], axis=-1)
    j_out = model.apply(variables, x_t1, x_t2, train=False)

    np.testing.assert_allclose(np.asarray(j_out)[..., 0],
                               t_out.numpy()[:, 0], atol=2e-5, rtol=1e-4)

    # SIGNAL-PRESERVING pass: _randomize's U(-0.2,0.2) BN scales attenuate
    # input signal ~8x per layer, so the 11-layer encoder's bottleneck is
    # numerically input-independent and the tolerance above cannot see deep
    # TEMPORAL wiring (the t1-vs-t2 bottleneck swap this caught). Re-run
    # with BN scales near 1 so the bottleneck carries signal, and pin the
    # asymmetry: swapping the inputs must change the output materially.
    gen = torch.Generator().manual_seed(62)
    with torch.no_grad():
        for name, p in tnet.named_parameters():
            if "bn" in name and name.endswith("weight"):
                p.copy_(torch.empty_like(p).uniform_(0.9, 1.1, generator=gen))
            elif name.endswith("bias"):
                p.copy_(torch.empty_like(p).uniform_(-0.1, 0.1, generator=gen))
            else:
                fan_in = max(int(np.prod(p.shape[1:])), 1)
                p.copy_(torch.empty_like(p).normal_(
                    0, (2.0 / fan_in) ** 0.5, generator=gen))
        for name, b in tnet.named_buffers():
            if name.endswith("running_mean"):
                b.copy_(torch.empty_like(b).uniform_(-0.1, 0.1, generator=gen))
            elif name.endswith("running_var"):
                b.copy_(torch.empty_like(b).uniform_(0.9, 1.1, generator=gen))
    tnet.eval()
    variables = torch_port.port_siamunet_diff_state_dict(
        tnet.state_dict(), variables)
    with torch.no_grad():
        t_out = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()[:, 0]
    j_out = np.asarray(model.apply(variables, x_t1, x_t2,
                                   train=False))[..., 0]
    j_swap = np.asarray(model.apply(variables, x_t2, x_t1,
                                    train=False))[..., 0]
    scale = max(np.abs(t_out).max(), 1e-6)
    np.testing.assert_allclose(j_out, t_out, atol=1e-4 * max(scale, 1.0),
                               rtol=1e-4)
    assert np.abs(j_swap - t_out).max() > 1e-3 * scale, \
        "swapped-input forward matches torch: temporal wiring is invisible"


def test_import_torch_checkpoint_cli(ref_networks, tmp_path, monkeypatch):
    """End-to-end migration path: a reference-format .pt checkpoint
    (torch-serialized {'step', 'network': DataParallel state_dict,
    'optimizer'}, utils/networks.py:30-38) imported by
    tools/import_torch_checkpoint.py must load through this framework's
    checkpoints.load_checkpoint with torch-matching eval forwards."""
    import runpy

    import torch

    import jax
    from multimodal_siamese_cd_tpu import checkpoints, train_lib
    from multimodal_siamese_cd_tpu.data.synthetic import generate_fixture_dataset

    cfg = _cfg("siameseunet")
    tnet = ref_networks.SiameseUNet(cfg)
    _randomize(torch, tnet, seed=77)
    tnet.eval()

    # reference save format, with the DataParallel "module." prefix
    src = tmp_path / "siamese_checkpoint7.pt"
    torch.save({
        "step": 123,
        "network": {f"module.{k}": v for k, v in tnet.state_dict().items()},
        "optimizer": {},
    }, src)

    out_dir = tmp_path / "runs"
    out_dir.mkdir()
    data_dir = tmp_path / "data"
    generate_fixture_dataset(data_dir, seed=3)

    argv = ["import_torch_checkpoint.py", "-c", "siamese", "-p", "proj",
            "-o", str(out_dir), "-d", str(data_dir),
            "--src", str(src), "--epoch", "7",
            "MODEL.TOPOLOGY", "[16,32]", "MODEL.IN_CHANNELS", "6",
            "TRAINER.PRECISION", "fp32", "MODEL.PACKED_FULLRES", "False"]
    monkeypatch.setattr(sys, "argv", argv)
    try:
        runpy.run_path("tools/import_torch_checkpoint.py",
                       run_name="__main__")
    except SystemExit as e:
        assert not e.code

    load_cfg_args = cfg.clone()
    load_cfg_args.NAME = "siamese"
    load_cfg_args.PATHS.OUTPUT = str(out_dir)
    model, state, step = checkpoints.load_checkpoint(7, load_cfg_args)
    assert step == 123

    rng = np.random.default_rng(5)
    x1 = rng.uniform(0, 1, (1, 32, 32, 6)).astype(np.float32)
    x2 = rng.uniform(0, 1, (1, 32, 32, 6)).astype(np.float32)
    with torch.no_grad():
        t_out = tnet(torch.from_numpy(x1.transpose(0, 3, 1, 2)),
                     torch.from_numpy(x2.transpose(0, 3, 1, 2)))
    j_out = np.asarray(train_lib.eval_forward(
        model, state.params, state.batch_stats, x1, x2))
    np.testing.assert_allclose(j_out[..., 0],
                               torch.sigmoid(t_out).numpy()[:, 0],
                               atol=1e-5)


# ---------------------------------------------------------------------------
# Reverse direction: flax -> torch export (torch_port.export_reference_
# state_dict / save_reference_checkpoint, tools/export_torch_checkpoint.py)
# ---------------------------------------------------------------------------

def _randomize_variables(variables, seed):
    """Random params AND BN running stats (default 1/0 scale/bias and 0/1
    stats would mask export-direction leaf mix-ups, same rationale as
    _randomize)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)

    def rnd(path, leaf):
        name = getattr(path[-1], "key", None)
        lo, hi = (0.5, 1.5) if name == "var" else (-0.5, 0.5)
        return jnp.asarray(rng.uniform(lo, hi, leaf.shape).astype(np.float32))

    return jax.tree_util.tree_map_with_path(rnd, variables)


def _torch_cls(ref_networks, model_type):
    return {
        "unet": ref_networks.UNet,
        "dualstreamunet": ref_networks.DualStreamUNet,
        "siameseunet": ref_networks.SiameseUNet,
        "dtsiameseunet": ref_networks.DualTaskSiameseUNet,
        "whatevernet": ref_networks.WhateverNet,
        "whatevernet2": ref_networks.WhateverNet2,
    }[model_type]


@pytest.mark.parametrize("model_type", TYPES)
def test_export_port_roundtrip(model_type):
    """flax -> reference state_dict -> flax is bit-exact for every factory
    type (no torch needed: both directions are numpy layout transforms)."""
    import jax
    from multimodal_siamese_cd_tpu import torch_port
    from multimodal_siamese_cd_tpu.models import create_network, init_variables

    cfg = _cfg(model_type)
    model = create_network(cfg)
    variables = _randomize_variables(
        init_variables(model, cfg, jax.random.PRNGKey(0)), seed=13)
    sd = torch_port.export_reference_state_dict(variables, step=42)
    assert any(k.endswith("num_batches_tracked") for k in sd)
    back = torch_port.port_reference_state_dict(sd, variables)
    flat_a = jax.tree_util.tree_leaves(variables)
    flat_b = jax.tree_util.tree_leaves(back)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("model_type", TYPES)
def test_export_strict_torch_load_forward_parity(ref_networks, model_type):
    """An exported state_dict loads into the reference's own model class
    under strict=True (exact key set, exact shapes) and reproduces the flax
    eval forward."""
    import torch

    import jax
    from multimodal_siamese_cd_tpu import torch_port
    from multimodal_siamese_cd_tpu.models import create_network, init_variables

    cfg = _cfg(model_type)
    model = create_network(cfg)
    variables = _randomize_variables(
        init_variables(model, cfg, jax.random.PRNGKey(0)), seed=21)
    sd = torch_port.export_reference_state_dict(variables, step=7)

    tnet = _torch_cls(ref_networks, model_type)(cfg)
    tnet.load_state_dict(
        {k: torch.from_numpy(np.array(v, copy=True)) for k, v in sd.items()},
        strict=True)
    tnet.eval()

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
        np.testing.assert_allclose(np.asarray(j),
                                   t.numpy().transpose(0, 2, 3, 1),
                                   atol=1e-5, rtol=1e-5)


def test_export_torch_checkpoint_cli(ref_networks, tmp_path, monkeypatch):
    """End-to-end export: a native checkpoint run through
    tools/export_torch_checkpoint.py must load through the reference's OWN
    load procedure (networks.py:41-56: DataParallel strict load + AdamW
    load_state_dict) with matching eval forwards, and the restored AdamW
    must be steppable."""
    import runpy

    import torch

    import jax
    from multimodal_siamese_cd_tpu import checkpoints, train_lib
    from multimodal_siamese_cd_tpu.data.synthetic import generate_fixture_dataset

    out_dir = tmp_path / "runs"
    out_dir.mkdir()
    data_dir = tmp_path / "data"
    generate_fixture_dataset(data_dir, seed=3)

    cfg = _cfg("siameseunet")
    cfg.NAME = "siamese"
    cfg.PATHS.OUTPUT = str(out_dir)
    model, state = train_lib.create_train_state(cfg, jax.random.PRNGKey(1))
    variables = _randomize_variables(
        {"params": state.params, "batch_stats": state.batch_stats}, seed=8)
    state = state.replace(params=variables["params"],
                          batch_stats=variables["batch_stats"])
    checkpoints.save_checkpoint(state, 7, 123, cfg)

    dst = tmp_path / "siamese_checkpoint7.pt"
    argv = ["export_torch_checkpoint.py", "-c", "siamese", "-p", "proj",
            "-o", str(out_dir), "-d", str(data_dir),
            "--epoch", "7", "--dst", str(dst),
            "MODEL.TOPOLOGY", "[16,32]", "MODEL.IN_CHANNELS", "6",
            "TRAINER.PRECISION", "fp32", "MODEL.PACKED_FULLRES", "False"]
    monkeypatch.setattr(sys, "argv", argv)
    try:
        runpy.run_path("tools/export_torch_checkpoint.py",
                       run_name="__main__")
    except SystemExit as e:
        assert not e.code

    # the reference's load procedure, verbatim semantics
    ckpt = torch.load(dst, map_location="cpu", weights_only=True)
    assert ckpt["step"] == 123
    tnet = torch.nn.DataParallel(ref_networks.SiameseUNet(cfg))
    tnet.load_state_dict(ckpt["network"], strict=True)
    opt = torch.optim.AdamW(tnet.parameters(), lr=cfg.TRAINER.LR,
                            weight_decay=0.01)
    opt.load_state_dict(ckpt["optimizer"])
    tnet.eval()

    rng = np.random.default_rng(5)
    x1 = rng.uniform(0, 1, (1, 32, 32, 6)).astype(np.float32)
    x2 = rng.uniform(0, 1, (1, 32, 32, 6)).astype(np.float32)
    with torch.no_grad():
        t_out = tnet(torch.from_numpy(x1.transpose(0, 3, 1, 2)),
                     torch.from_numpy(x2.transpose(0, 3, 1, 2)))
    j_out = np.asarray(train_lib.eval_forward(
        model, state.params, state.batch_stats, x1, x2))
    np.testing.assert_allclose(j_out[..., 0],
                               torch.sigmoid(t_out).numpy()[:, 0],
                               atol=1e-5)

    # restored optimizer is steppable (group structure matched the model)
    out = tnet(torch.from_numpy(x1.transpose(0, 3, 1, 2)),
               torch.from_numpy(x2.transpose(0, 3, 1, 2)))
    out.sum().backward()
    opt.step()
