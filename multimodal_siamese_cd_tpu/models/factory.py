"""Model factory and initialization helpers.

``create_network(cfg)`` mirrors the reference factory keyed by
``cfg.MODEL.TYPE`` (utils/networks.py:12-27). Where the reference wraps the
module in ``nn.DataParallel``, data parallelism here is a property of the
jitted train step over a device mesh (see :mod:`..parallel`), not of the
model, so the bare module is returned.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import networks


def compute_dtype(cfg) -> jnp.dtype:
    """Model compute dtype from ``cfg.TRAINER.PRECISION`` (new, TPU-specific
    knob; default bf16 — the MXU-native dtype). Params are always fp32."""
    prec = str(cfg.TRAINER.get("PRECISION", "bf16")).lower()
    if prec in ("bf16", "bfloat16"):
        return jnp.bfloat16
    if prec in ("fp32", "float32", "f32"):
        return jnp.float32
    raise ValueError(f"Unknown TRAINER.PRECISION {prec!r}")


def input_channels(cfg) -> int:
    """Per-timestamp input channel count given DATALOADER.INPUT_MODE."""
    mode = cfg.DATALOADER.INPUT_MODE
    n_s1 = len(cfg.DATALOADER.S1_BANDS)
    n_s2 = len(cfg.DATALOADER.S2_BANDS)
    if mode == 's1':
        return n_s1
    if mode == 's2':
        return n_s2
    return n_s1 + n_s2


def create_network(cfg):
    """Build the model for ``cfg.MODEL.TYPE`` (same strings as the reference,
    plus 'siamunet_diff' which upstream vendors but never exposes)."""
    model_type = cfg.MODEL.TYPE
    topology = tuple(cfg.MODEL.TOPOLOGY)
    out_ch = cfg.MODEL.OUT_CHANNELS
    dtype = compute_dtype(cfg)
    bn_axis = cfg.MODEL.get("BN_AXIS_NAME", None)
    # Exact-math packed layout for the full-resolution level (models/
    # packed.py): same parameters and results (fp reassociation only), big
    # MXU win on TPU. Defaults on; MODEL.PACKED_FULLRES: False restores the
    # reference-shaped graph bit-for-bit.
    packed = bool(cfg.MODEL.get("PACKED_FULLRES", True))
    # MODEL.REMAT: True checkpoints every Down/Up stage and the stem
    # (jax.checkpoint): backward recomputes intra-stage activations instead
    # of storing them — the memory lever for inputs far beyond the bs8-32
    # envelope (pairs with TRAINER.SPATIAL_SHARDS). Default off: memory
    # does not bind at production batch sizes (BASELINE.md), so the ~33%
    # extra stage FLOPs would be pure loss. Numerical transparency is
    # tested (test_train_lib.py::test_remat_step_matches_plain); the
    # actual HBM saving must be read off TPU memory_analysis — XLA:CPU's
    # analysis is not memory-scheduling-aware and reports remat as a
    # regression there. siamunet_diff (dead in the reference factory) does
    # not take the flag.
    remat = bool(cfg.MODEL.get("REMAT", False))
    n_s1 = len(cfg.DATALOADER.S1_BANDS)

    if model_type == 'unet':
        return networks.UNet(topology, out_ch, dtype, bn_axis, packed, remat)
    if model_type == 'dualstreamunet':
        return networks.DualStreamUNet(topology, n_s1, out_ch, dtype,
                                       bn_axis, packed, remat)
    if model_type == 'siameseunet':
        return networks.SiameseUNet(topology, out_ch, dtype, bn_axis, packed,
                                    remat)
    if model_type == 'dtsiameseunet':
        return networks.DualTaskSiameseUNet(topology, out_ch, dtype,
                                            bn_axis, packed, remat)
    if model_type == 'whatevernet':
        return networks.WhateverNet(topology, n_s1, out_ch, dtype,
                                    bn_axis, packed, remat)
    if model_type == 'whatevernet2':
        return networks.WhateverNet2(topology, n_s1, out_ch, dtype,
                                     bn_axis, packed, remat)
    if model_type == 'siamunet_diff':
        return networks.SiamUnetDiff(out_ch, dtype)
    raise Exception(f'Unknown network ({model_type}).')


def init_variables(model, cfg, rng: jax.Array, spatial: int = 32):
    """Initialize ``{'params', 'batch_stats'}`` with a dummy NHWC batch whose
    channel count matches the config. Spatial size is irrelevant to the
    parameter shapes (fully convolutional), so a small one keeps init fast."""
    c = input_channels(cfg)
    x = jnp.zeros((1, spatial, spatial, c), compute_dtype(cfg))
    return model.init({'params': rng}, x, x, train=False)


def param_count(params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))
