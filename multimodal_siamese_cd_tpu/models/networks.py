"""Change-detection model zoo (flax linen, NHWC).

All model types from the reference factory (utils/networks.py:12-27) with
identical architecture semantics and the same config strings:

  'unet'            — early fusion: concat(t1, t2) -> U-Net (networks.py:59-79)
  'dualstreamunet'  — per-modality early-fusion U-Nets, fused 1x1 head
                      (networks.py:82-120)
  'siameseunet'     — shared-weight encoder, per-level feature difference
                      f_t2 - f_t1 -> decoder (networks.py:123-154)
  'dtsiameseunet'   — Siamese encoder, change + shared semantic decoders,
                      plus the auxiliary ``outc_sem_change`` 2->1 head used
                      by assessment_semantics.py:117 (networks.py:157-197)
  'whatevernet'     — per-modality Siamese-difference streams with own heads
                      + fusion head; train returns 3 logit sets, eval returns
                      fusion only (networks.py:200-263)
  'whatevernet2'    — like whatevernet but early fusion per stream
                      (networks.py:266-310)
  'siamunet_diff'   — FC-Siam-diff (Daudt et al., ICIP 2018), vendored in the
                      reference at networks.py:466-658 but unreachable from
                      its factory; registered and reachable here, with the
                      unified (x_t1, x_t2) interface.

Every ``__call__`` takes NHWC ``x_t1, x_t2`` and ``train: bool``; batch-norm
statistics live in the ``batch_stats`` collection.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .blocks import Decoder, Encoder, InConv, OutConv, max_pool_2x2

Dtype = Any


def _diff(features_t1: list, features_t2: list) -> list:
    """Per-level bitemporal feature difference f_t2 - f_t1
    (reference networks.py:147-150)."""
    return [f2 - f1 for f1, f2 in zip(features_t1, features_t2)]


def _use_packed(module, x_t1) -> bool:
    """Static (trace-time) decision to run the full-res level in the
    vertically-packed layout (models/packed.py): exact-math perf layout,
    needs even height and the plain (non-shard_map-synced) BN path."""
    return (module.packed_fullres and module.bn_axis_name is None
            and x_t1.shape[1] % 2 == 0)


def _stem(module, out_ch: int, name: str = "inc") -> nn.Module:
    """InConv, checkpointed when the model's ``remat`` flag is set (the stem
    holds the largest activations — full-res, widest level). Call it with
    POSITIONAL (x, train, packed): nn.remat's static_argnums only cover
    positional arguments."""
    cls = nn.remat(InConv, static_argnums=(2, 3)) if module.remat else InConv
    return cls(out_ch, module.dtype, module.bn_axis_name, name=name)



class UNet(nn.Module):
    """Early-fusion U-Net (reference networks.py:59-79)."""

    topology: Sequence[int]
    out_channels: int = 1
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: str | None = None
    packed_fullres: bool = True
    remat: bool = False

    @nn.compact
    def __call__(self, x_t1, x_t2, train: bool = False):
        pk = _use_packed(self, x_t1)
        x = jnp.concatenate([x_t1, x_t2], axis=-1)
        x = _stem(self, self.topology[0])(x, train, pk)
        feats = Encoder(self.topology, self.dtype, self.bn_axis_name,
                        remat=self.remat,
                        name="encoder")(x, train, packed_input=pk)
        x = Decoder(self.topology, self.dtype, self.bn_axis_name,
                    remat=self.remat,
                    name="decoder")(feats, train, packed_skip=pk)
        return OutConv(self.out_channels, self.dtype,
                       name="outc")(x, packed=pk)


class DualStreamUNet(nn.Module):
    """Late fusion of per-modality early-fusion U-Nets
    (reference networks.py:82-120). Inputs carry S1 bands first, then S2
    (datasets.py:161-162); ``n_s1_bands`` sets the split point."""

    topology: Sequence[int]
    n_s1_bands: int
    out_channels: int = 1
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: str | None = None
    packed_fullres: bool = True
    remat: bool = False

    @nn.compact
    def __call__(self, x_t1, x_t2, train: bool = False):
        pk = _use_packed(self, x_t1)

        def stream(name: str, a, b):
            x = jnp.concatenate([a, b], axis=-1)
            x = _stem(self, self.topology[0], name=f"inc_{name}")(x, train, pk)
            feats = Encoder(self.topology, self.dtype, self.bn_axis_name,
                            remat=self.remat,
                            name=f"encoder_{name}")(x, train, packed_input=pk)
            return Decoder(self.topology, self.dtype, self.bn_axis_name,
                           remat=self.remat,
                           name=f"decoder_{name}")(feats, train, packed_skip=pk)

        k = self.n_s1_bands
        d1 = stream("stream1", x_t1[..., :k], x_t2[..., :k])
        d2 = stream("stream2", x_t1[..., k:], x_t2[..., k:])
        return OutConv(self.out_channels, self.dtype,
                       name="outc")(d1, d2, packed=pk)


class SiameseUNet(nn.Module):
    """Shared-weight Siamese U-Net on feature differences
    (reference networks.py:123-154)."""

    topology: Sequence[int]
    out_channels: int = 1
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: str | None = None
    packed_fullres: bool = True
    remat: bool = False

    @nn.compact
    def __call__(self, x_t1, x_t2, train: bool = False):
        pk = _use_packed(self, x_t1)
        inc = _stem(self, self.topology[0])
        enc = Encoder(self.topology, self.dtype, self.bn_axis_name,
                      remat=self.remat, name="encoder")
        f_t1 = enc(inc(x_t1, train, pk), train, packed_input=pk)
        f_t2 = enc(inc(x_t2, train, pk), train, packed_input=pk)
        x = Decoder(self.topology, self.dtype, self.bn_axis_name,
                    remat=self.remat,
                    name="decoder")(_diff(f_t1, f_t2), train, packed_skip=pk)
        return OutConv(self.out_channels, self.dtype,
                       name="outc")(x, packed=pk)


class DualTaskSiameseUNet(nn.Module):
    """Siamese encoder with change + shared semantic decode heads
    (reference networks.py:157-197). Returns
    ``(out_change, out_sem_t1, out_sem_t2)``."""

    topology: Sequence[int]
    out_channels: int = 1
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: str | None = None
    packed_fullres: bool = True
    remat: bool = False

    def setup(self):
        self.inc = _stem(self, self.topology[0], name="inc")
        self.encoder = Encoder(self.topology, self.dtype, self.bn_axis_name,
                               remat=self.remat, name="encoder")
        self.decoder_change = Decoder(self.topology, self.dtype,
                                      self.bn_axis_name, remat=self.remat)
        self.decoder_sem = Decoder(self.topology, self.dtype,
                                   self.bn_axis_name, remat=self.remat)
        self.outc_change = OutConv(self.out_channels, self.dtype)
        self.outc_sem = OutConv(self.out_channels, self.dtype)
        # Auxiliary 2->1 change-from-semantics head; not used in forward but
        # part of the trained parameter set (reference networks.py:174), and
        # applied offline by assessment_semantics.py:117.
        self.outc_sem_change = OutConv(1, self.dtype)

    def __call__(self, x_t1, x_t2, train: bool = False):
        pk = _use_packed(self, x_t1)
        f_t1 = self.encoder(self.inc(x_t1, train, pk), train,
                            packed_input=pk)
        f_t2 = self.encoder(self.inc(x_t2, train, pk), train,
                            packed_input=pk)
        out_change = self.outc_change(
            self.decoder_change(_diff(f_t1, f_t2), train, packed_skip=pk),
            packed=pk)
        out_sem_t2 = self.outc_sem(
            self.decoder_sem(f_t2, train, packed_skip=pk), packed=pk)
        out_sem_t1 = self.outc_sem(
            self.decoder_sem(f_t1, train, packed_skip=pk), packed=pk)
        if self.is_initializing():
            # The aux head takes no part in the forward pass (reference
            # networks.py:174) but must exist in the checkpointed parameter
            # set for assessment_semantics.py; touch it so init creates it.
            self.sem_change_head(out_sem_t1, out_sem_t2)
        return out_change, out_sem_t1, out_sem_t2

    def sem_change_head(self, logits_sem_t1, logits_sem_t2):
        """Apply the auxiliary change-from-semantics head to concatenated
        semantic logits (assessment_semantics.py:117)."""
        x = jnp.concatenate([logits_sem_t1, logits_sem_t2], axis=-1)
        return self.outc_sem_change(x.astype(self.dtype))


class WhateverNet(nn.Module):
    """Per-modality Siamese-difference streams + fusion head — the
    semi-supervised consistency model (reference networks.py:200-263).
    Training mode returns ``(out_fusion, out_stream1, out_stream2)``; eval
    returns fusion only."""

    topology: Sequence[int]
    n_s1_bands: int
    out_channels: int = 1
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: str | None = None
    packed_fullres: bool = True
    remat: bool = False

    @nn.compact
    def __call__(self, x_t1, x_t2, train: bool = False):
        pk = _use_packed(self, x_t1)

        def stream(name: str, a, b):
            inc = _stem(self, self.topology[0], name=f"inc_{name}")
            enc = Encoder(self.topology, self.dtype, self.bn_axis_name,
                          remat=self.remat, name=f"encoder_{name}")
            f_a = enc(inc(a, train, pk), train, packed_input=pk)
            f_b = enc(inc(b, train, pk), train, packed_input=pk)
            dec = Decoder(self.topology, self.dtype, self.bn_axis_name,
                          remat=self.remat,
                          name=f"decoder_{name}")(_diff(f_a, f_b), train,
                                                  packed_skip=pk)
            out = OutConv(self.out_channels, self.dtype,
                          name=f"outc_{name}")(dec, packed=pk)
            return dec, out

        k = self.n_s1_bands
        d1, out_stream1 = stream("stream1", x_t1[..., :k], x_t2[..., :k])
        d2, out_stream2 = stream("stream2", x_t1[..., k:], x_t2[..., k:])
        out_fusion = OutConv(self.out_channels, self.dtype,
                             name="outc_fusion")(d1, d2, packed=pk)
        if train:
            return out_fusion, out_stream1, out_stream2
        return out_fusion


class WhateverNet2(nn.Module):
    """Like WhateverNet but each stream is early fusion (concat t1, t2)
    instead of Siamese difference (reference networks.py:266-310)."""

    topology: Sequence[int]
    n_s1_bands: int
    out_channels: int = 1
    dtype: Dtype = jnp.bfloat16
    bn_axis_name: str | None = None
    packed_fullres: bool = True
    remat: bool = False

    @nn.compact
    def __call__(self, x_t1, x_t2, train: bool = False):
        pk = _use_packed(self, x_t1)

        def stream(name: str, a, b):
            x = jnp.concatenate([a, b], axis=-1)
            x = _stem(self, self.topology[0], name=f"inc_{name}")(x, train, pk)
            feats = Encoder(self.topology, self.dtype, self.bn_axis_name,
                            remat=self.remat,
                            name=f"encoder_{name}")(x, train, packed_input=pk)
            dec = Decoder(self.topology, self.dtype, self.bn_axis_name,
                          remat=self.remat,
                          name=f"decoder_{name}")(feats, train, packed_skip=pk)
            out = OutConv(self.out_channels, self.dtype,
                          name=f"outc_{name}")(dec, packed=pk)
            return dec, out

        k = self.n_s1_bands
        d1, out_stream1 = stream("stream1", x_t1[..., :k], x_t2[..., :k])
        d2, out_stream2 = stream("stream2", x_t1[..., k:], x_t2[..., k:])
        out_fusion = OutConv(self.out_channels, self.dtype,
                             name="outc_fusion")(d1, d2, packed=pk)
        if train:
            return out_fusion, out_stream1, out_stream2
        return out_fusion


class _ConvBNReLUDrop(nn.Module):
    """conv/convT 3x3 -> BN -> ReLU -> spatial dropout, the repeating unit of
    FC-Siam-diff (reference networks.py:583 et seq.)."""

    out_ch: int
    transpose: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        if self.transpose:
            # k=3, s=1, padding=1 transposed conv == SAME-padded conv shape-wise
            x = nn.ConvTranspose(self.out_ch, (3, 3), strides=(1, 1),
                                 padding="SAME", dtype=self.dtype, name="conv")(x)
        else:
            x = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                        name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.2, broadcast_dims=(1, 2), deterministic=not train,
                       name="drop")(x)
        return x


class SiamUnetDiff(nn.Module):
    """FC-Siam-diff (Daudt, Le Saux & Boulch, ICIP 2018).

    The reference vendors this at networks.py:466-658 behind legacy config
    keys and never reaches it from ``create_network``; here it takes the
    unified ``(x_t1, x_t2)`` interface and is reachable via
    ``MODEL.TYPE: 'siamunet_diff'``. Stage widths 16/32/64/128, absolute
    feature differences as skips, transposed-conv upsampling with
    pad-to-match, spatial dropout 0.2 throughout.
    """

    out_channels: int = 1
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x_t1, x_t2, train: bool = False):
        widths = [(16, 2), (32, 2), (64, 3), (128, 3)]
        stages = []
        for s, (w, n) in enumerate(widths):
            stages.append([_ConvBNReLUDrop(w, dtype=self.dtype,
                                           name=f"enc{s + 1}_{i + 1}")
                           for i in range(n)])

        def encode(x):
            skips = []
            for blocks in stages:
                for blk in blocks:
                    x = blk(x, train)
                skips.append(x)
                x = max_pool_2x2(x)
            return x, skips

        _, skips1 = encode(x_t1)
        x2p, skips2 = encode(x_t2)

        # the decoder consumes the T2 bottleneck: the reference reassigns
        # x4p during the second (x_t2) encoding pass before Stage 4d
        # (reference networks.py:602 vs :625-628)
        x = x2p
        dec_widths = [(128, [128, 128, 64]), (64, [64, 64, 32]),
                      (32, [32, 16]), (16, [16, None])]
        for s, (up_w, convs) in enumerate(dec_widths):
            # padding ((1,2),(1,2)) == torch ConvTranspose2d(k=3, s=2, p=1,
            # output_padding=1), the reference's upsampler (networks.py:517
            # et seq.) — 'SAME' is phase-shifted by one pixel (probed
            # numerically; pinned by test_siamunet_diff_forward_parity)
            x = nn.ConvTranspose(up_w, (3, 3), strides=(2, 2),
                                 padding=((1, 2), (1, 2)),
                                 dtype=self.dtype, name=f"upconv{4 - s}")(x)
            skip = jnp.abs(skips1[3 - s] - skips2[3 - s])
            dh = skip.shape[1] - x.shape[1]
            dw = skip.shape[2] - x.shape[2]
            if dh or dw:
                # replication-pad on the bottom/right (networks.py:629)
                x = jnp.pad(x, ((0, 0), (0, dh), (0, dw), (0, 0)), mode="edge")
            x = jnp.concatenate([x, skip], axis=-1)
            for i, w in enumerate(convs):
                if w is None:  # final logits conv, no BN/ReLU (networks.py:654)
                    x = nn.ConvTranspose(self.out_channels, (3, 3), strides=(1, 1),
                                         padding="SAME", dtype=self.dtype,
                                         name="outc")(x)
                else:
                    x = _ConvBNReLUDrop(w, transpose=True, dtype=self.dtype,
                                        name=f"dec{4 - s}_{i + 1}")(x, train)
        return x.astype(jnp.float32)
