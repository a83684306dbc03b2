"""U-Net building blocks (flax linen, NHWC).

Architectural contract follows the reference blocks (utils/networks.py:
DoubleConv :386-402, InConv :405-412, Down :415-426, Up :429-451, OutConv
:454-461, Encoder :313-343, Decoder :346-382) re-expressed TPU-first:

  * NHWC layout (channels-last) — the native XLA/TPU conv layout,
  * configurable compute dtype (bf16 by default at the model level) with
    fp32 parameters; BatchNorm statistics are computed in fp32 by flax,
  * BatchNorm defaults matching torch (eps 1e-5, running-average momentum
    0.9 == torch momentum 0.1), with an optional ``axis_name`` for
    cross-replica stat sync under shard_map.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .packed import (
    PackedDoubleConv,
    PackedUpsample,
    PackedConv1x1,
    pack,
    packed_max_pool,
    unpack,
)

Dtype = Any


class DoubleConv(nn.Module):
    """(3x3 conv -> BN -> ReLU) * 2 (reference networks.py:386-402)."""

    out_ch: int
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        for i in range(2):
            x = nn.Conv(self.out_ch, (3, 3), padding=1, use_bias=True,
                        dtype=self.dtype, name=f"conv{i + 1}")(x)
            # axis_name is only read on the train path (_compute_stats);
            # passing it unconditionally is safe on the running-average path
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             axis_name=self.bn_axis_name,
                             name=f"bn{i + 1}")(x)
            x = nn.relu(x)
        return x


class InConv(nn.Module):
    """Stem block (reference networks.py:405-412). ``packed=True`` runs the
    full-res level in the vertically-packed layout (see :mod:`.packed`) and
    returns a PACKED feature map; parameters are identical either way."""

    out_ch: int
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool,
                 packed: bool = False) -> jnp.ndarray:
        if packed:
            # local guard for the cross-module invariant networks._use_packed
            # enforces: PackedBatchNorm has no synced-stats support, so a
            # packed+bn_axis_name call would silently run per-replica BN
            assert self.bn_axis_name is None, \
                "packed layout has no synced-BN (bn_axis_name) support"
            return PackedDoubleConv(self.out_ch, self.dtype,
                                    name="conv")(pack(x), train)
        return DoubleConv(self.out_ch, self.dtype, self.bn_axis_name,
                          name="conv")(x, train)


def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/2 max pool. VALID padding drops odd trailing rows/cols, matching
    torch MaxPool2d(2) floor semantics (reference networks.py:420)."""
    return nn.max_pool(x, (2, 2), strides=(2, 2))


class Down(nn.Module):
    """maxpool(2) + DoubleConv (reference networks.py:415-426)."""

    out_ch: int
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool,
                 packed_input: bool = False) -> jnp.ndarray:
        x = packed_max_pool(x) if packed_input else max_pool_2x2(x)
        return DoubleConv(self.out_ch, self.dtype, self.bn_axis_name,
                          name="conv")(x, train)


class Up(nn.Module):
    """ConvTranspose(k=2, s=2) upsample + pad-to-skip + concat + DoubleConv
    (reference networks.py:429-451). ``up_ch`` is the transposed-conv width
    (in_ch//2 in the reference's Up(in_ch, out_ch))."""

    up_ch: int
    out_ch: int
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x1: jnp.ndarray, x2: jnp.ndarray, train: bool,
                 packed: bool = False) -> jnp.ndarray:
        if packed:
            # x2 arrives PACKED (the InConv skip); upsample straight into
            # the packed layout. Heights match by construction (packing
            # requires even H, so the pool/upsample round trip is lossless
            # vertically); only width may need the pad-to-skip. The skip
            # concat is LOGICAL (weight-split pair conv) — materializing a
            # packed concat costs 64-lane shuffles.
            assert self.bn_axis_name is None, \
                "packed layout has no synced-BN (bn_axis_name) support"
            x1 = PackedUpsample(self.up_ch, self.dtype, name="up")(x1)
            dw = x2.shape[2] - x1.shape[2]
            if dw:
                x1 = jnp.pad(x1, ((0, 0), (0, 0),
                                  (dw // 2, dw - dw // 2), (0, 0)))
            # skip first (networks.py:449)
            return PackedDoubleConv(self.out_ch, self.dtype,
                                    name="conv")(x2, train, x1)
        x1 = nn.ConvTranspose(self.up_ch, (2, 2), strides=(2, 2),
                              padding="VALID", use_bias=True,
                              dtype=self.dtype, name="up")(x1)
        # Pad the upsampled map to the skip's spatial size (NHWC axes 1, 2).
        dh = x2.shape[1] - x1.shape[1]
        dw = x2.shape[2] - x1.shape[2]
        if dh or dw:
            x1 = jnp.pad(x1, ((0, 0), (dh // 2, dh - dh // 2),
                              (dw // 2, dw - dw // 2), (0, 0)))
        x = jnp.concatenate([x2, x1], axis=-1)  # skip first (networks.py:449)
        return DoubleConv(self.out_ch, self.dtype, self.bn_axis_name,
                          name="conv")(x, train)


class OutConv(nn.Module):
    """1x1 projection head (reference networks.py:454-461). Logits are
    emitted in fp32 regardless of the compute dtype.

    ``packed=True`` consumes packed activations (block-diagonal packed
    weights) and unpacks AFTER the channel reduction, so only the tiny
    out_ch-wide tensor is transposed. An optional second operand ``x2`` is
    the logical channel-concat partner (DualStream/WhateverNet fusion
    heads) — in packed mode it is folded in weight-split form instead of a
    materialized concat."""

    out_ch: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, x2: jnp.ndarray | None = None,
                 packed: bool = False) -> jnp.ndarray:
        if packed:
            y = PackedConv1x1(self.out_ch, self.dtype, name="conv")(x, x2)
            return unpack(y).astype(jnp.float32)
        if x2 is not None:
            x = jnp.concatenate([x, x2], axis=-1)
        x = nn.Conv(self.out_ch, (1, 1), use_bias=True, dtype=self.dtype,
                    name="conv")(x)
        return x.astype(jnp.float32)


def encoder_widths(topology: Sequence[int]) -> list[int]:
    """Output width of each Down stage. The last stage keeps its input width
    (reference networks.py:326-329)."""
    n = len(topology)
    return [topology[i + 1] if i != n - 1 else topology[i] for i in range(n)]


class Encoder(nn.Module):
    """Down-ladder over TOPOLOGY; returns features deepest-first
    (reference networks.py:313-343). ``remat=True`` checkpoints each Down
    stage (jax.checkpoint via nn.remat): the backward pass recomputes the
    stage's internal activations from its input instead of storing them —
    the UNet skip features stay live either way, so this trades ~33% extra
    stage FLOPs for dropping every intra-stage conv/BN/ReLU intermediate,
    the memory lever for inputs far beyond the bs8-32 envelope
    (MODEL.REMAT; pairs with TRAINER.SPATIAL_SHARDS)."""

    topology: Sequence[int]
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: str | None = None
    remat: bool = False

    @nn.compact
    def __call__(self, x1: jnp.ndarray, train: bool,
                 packed_input: bool = False) -> list[jnp.ndarray]:
        down = nn.remat(Down, static_argnums=(2, 3)) if self.remat else Down
        feats = [x1]
        for idx, out_ch in enumerate(encoder_widths(self.topology)):
            feats.append(down(out_ch, self.dtype, self.bn_axis_name,
                              name=f"down{idx + 1}")(
                feats[-1], train, packed_input and idx == 0))
        return feats[::-1]


def decoder_up_topology(topology: Sequence[int]) -> list[int]:
    """The reference's ``up_topo`` (networks.py:355-361): stage widths from
    shallow to deep, with the extra stem width prepended."""
    return [topology[0]] + encoder_widths(topology)


class Decoder(nn.Module):
    """Up-ladder consuming a deepest-first feature list
    (reference networks.py:346-382). ``remat=True`` checkpoints each Up
    stage (see :class:`Encoder`)."""

    topology: Sequence[int]
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: str | None = None
    remat: bool = False

    @nn.compact
    def __call__(self, features: list[jnp.ndarray], train: bool,
                 packed_skip: bool = False) -> jnp.ndarray:
        up = nn.remat(Up, static_argnums=(3, 4)) if self.remat else Up
        up_topo = decoder_up_topology(self.topology)
        n_layers = len(self.topology)
        x1 = features[0]
        for i, idx in enumerate(reversed(range(n_layers))):
            x2_idx = idx - 1 if idx != 0 else idx
            in_dim = up_topo[idx] * 2
            out_dim = up_topo[x2_idx]
            x1 = up(in_dim // 2, out_dim, self.dtype, self.bn_axis_name,
                    name=f"up{idx + 1}")(x1, features[i + 1], train,
                                         packed_skip and idx == 0)
        return x1
