"""Vertically-packed (space-to-depth 2x1) full-resolution U-Net layer.

Why: on TPU the MXU contracts over 128-wide channel tiles; the model's
full-resolution level has only 64 channels, so its convs run at ~40 TF/s
while every deeper level sustains ~180-190 (measured, tools/bench_conv_
clean.py). Packing two image rows into channels makes the full-res level a
128-channel problem at half the height: the SAME 3x3 conv becomes a 50%-
dense 3x3 conv over 128 lanes, which measures 1.47x faster for the full
training gradient (tools/bench_conv_pack2x1.py) — and max-pool's vertical
reduction becomes a free channel max.

This is an EXACT algebraic reformulation (same math, fp reassociation
only), not an architecture change: parameters keep their standard shapes
and names (kernel (3,3,Cin,Cout), BN scale/bias/mean/var of size C), so
checkpoints, goldens and the torch port are interchangeable with the
unpacked path.

The 3x3 convs inside DoubleConv use a STAGGERED variant that cuts the
packed FLOP overhead from 2x the logical work to 1.33x (measured 1.37x
faster for the full DoubleConv gradient, tools/bench_conv_stag.py): a
(3,3) conv written directly on the packed layout needs a (3,3,2Ci,2Co)
kernel that is only 50% dense, because the even/odd output phases read
row windows offset by one packed row. Shifting the odd output phase down
one packed slot ("staggered" packing, height H'+1 with one spurious slot
at each end) aligns both phases on a single 2-row window, so conv1 is a
75%-dense (2,3,2Ci,2Co) kernel mapping packed -> staggered, and conv2 is
another 75%-dense (2,3) kernel mapping staggered -> packed. The spurious
slots are zeroed with fused iota masks, which reproduces 'SAME' zero
padding exactly; BatchNorm between the convs divides its (zero-padded)
sums by the true element count. Derivations:

  packed activation    X'[b, i, j, di*C + c] = X[b, 2i + di, j, c]
  staggered activation S[i, g0] = Y[2i] (i < H'), S[i, g1] = Y[2i-1] (i > 0);
                       S[H', g0] and S[0, g1] are the zeroed spurious slots
  conv1 (packed X' -> staggered S, row pad (1,1)):
                       S[i] = sum_{p in 0,1} W1'[p] . X'[i-1+p]
                       W1'[0] = [[0,  W0], [W0, W1]]  (di x oi blocks)
                       W1'[1] = [[W1, W2], [W2, 0 ]]
  conv2 (staggered S -> packed Y2', rows VALID):
                       Y2'[i] = sum_{p in 0,1} W2'[p] . S[i+p]
                       W2'[0] = [[W1, W0], [W0, 0 ]]
                       W2'[1] = [[0,  W2], [W2, W1]]
  conv-transpose 2x2/s2 (flax VALID semantics)
                       K'[0, dj, c, di*Co+co] = K[1-di, dj, c, co]
                       applied with kernel (1,2), strides (1,2)
  max-pool 2x2/s2      max(X'[..., :C], X'[..., C:]) then a horizontal
                       (1,2)/s(1,2) window -> standard (unpacked) layout
  BatchNorm            per-logical-channel stats combine the two equal-count
                       packed groups: mean = (m0+m1)/2, E[x^2] likewise
                       (bit-matching flax's mean2 - mean^2 form); on a
                       staggered tensor the group sums additionally skip the
                       zeroed spurious row in the divisor

Requires even input height; callers fall back to the unpacked path
otherwise (evaluation pads scenes to 64-multiples, so training and eval
shapes are always even).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

Dtype = Any

_DN = ("NHWC", "HWIO", "NHWC")


@functools.partial(jax.custom_jvp, nondiff_argnums=(4,))
def pair_conv_f32_acc(a: jnp.ndarray, wa: jnp.ndarray, b: jnp.ndarray,
                      wb: jnp.ndarray, padding) -> jnp.ndarray:
    """conv(a, wa) + conv(b, wb) — the weight-split logical concat — with
    the two partial outputs accumulated in f32 and rounded to the compute
    dtype ONCE, so the pair path adds no extra rounding over the unpacked
    concat conv (its contract is 'exact, fp reassociation only').

    Why a custom JVP: jax 0.9 cannot differentiate a conv whose
    ``preferred_element_type`` differs from its operand dtype (the
    transpose rules reject the mixed f32 cotangent at trace time). The
    custom tangent map below is built from PLAIN compute-dtype convs, so

      * reverse mode works by linearize + transpose of those plain convs —
        gradients are the standard compute-dtype conv backward, exactly
        what the plain bf16 pair produced before the f32 accumulate; and
      * under vmap (per-replica BN vmaps the whole model over BN groups,
        train_lib._apply_train) the tangent convs batch through the
        ordinary FORWARD conv batching rule — group axis folded into the
        conv batch dim — and the transpose of that merged conv partitions
        fine under GSPMD.

    The rejected alternative, a custom_vjp whose backward calls jax.vjp of
    the plain pair, broke under vmap + mesh sharding: vmapping the
    backward batches its wgrad convs with BOTH operands carrying the
    group axis, which jax expresses via feature_group_count, and GSPMD
    then emits an invalid grouped conv when that axis is sharded (XLA
    INVALID_ARGUMENT: output features not divisible by
    feature_group_count). custom_jvp never builds those convs: transposition
    happens AFTER batching, as in plain autodiff."""
    ya = lax.conv_general_dilated(a, wa, (1, 1), padding,
                                  dimension_numbers=_DN,
                                  preferred_element_type=jnp.float32)
    yb = lax.conv_general_dilated(b, wb, (1, 1), padding,
                                  dimension_numbers=_DN,
                                  preferred_element_type=jnp.float32)
    return (ya + yb).astype(a.dtype)


@pair_conv_f32_acc.defjvp
def _pair_conv_jvp(padding, primals, tangents):
    a, wa, b, wb = primals
    da, dwa, db, dwb = tangents

    def conv(x, w):
        return lax.conv_general_dilated(x, w, (1, 1), padding,
                                        dimension_numbers=_DN)

    primal_out = pair_conv_f32_acc(a, wa, b, wb, padding)
    tangent_out = (conv(da, wa) + conv(a, dwa)
                   + conv(db, wb) + conv(b, dwb))
    return primal_out, tangent_out


def pack(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H//2, W, 2C); packed channel = di*C + c."""
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w, c).transpose(0, 1, 3, 2, 4).reshape(
        b, h // 2, w, 2 * c)


def unpack(xp: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`pack`."""
    b, hh, w, c2 = xp.shape
    c = c2 // 2
    return xp.reshape(b, hh, w, 2, c).transpose(0, 1, 3, 2, 4).reshape(
        b, 2 * hh, w, c)


def stagger_conv1_weights(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Ci, Co) -> (2, 3, 2Ci, 2Co), 75% dense: packed -> staggered
    (see module docstring)."""
    z = jnp.zeros_like(w[0])
    return jnp.stack([
        jnp.concatenate([jnp.concatenate([z, w[0]], -1),         # di=0
                         jnp.concatenate([w[0], w[1]], -1)], 1),  # di=1
        jnp.concatenate([jnp.concatenate([w[1], w[2]], -1),
                         jnp.concatenate([w[2], z], -1)], 1),
    ])


def stagger_conv2_weights(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Ci, Co) -> (2, 3, 2Ci, 2Co), 75% dense: staggered -> packed
    (see module docstring)."""
    z = jnp.zeros_like(w[0])
    return jnp.stack([
        jnp.concatenate([jnp.concatenate([w[1], w[0]], -1),
                         jnp.concatenate([w[0], z], -1)], 1),
        jnp.concatenate([jnp.concatenate([z, w[2]], -1),
                         jnp.concatenate([w[2], w[1]], -1)], 1),
    ])


def zero_spurious(s: jnp.ndarray) -> jnp.ndarray:
    """Zero a staggered tensor's spurious slots [0, g1] and [H', g0] with
    broadcasted-iota masks (fuses into the surrounding elementwise chain)."""
    c = s.shape[-1] // 2
    row = lax.broadcasted_iota(jnp.int32, s.shape, 1)
    ch = lax.broadcasted_iota(jnp.int32, s.shape, 3)
    spur = ((row == 0) & (ch >= c)) | ((row == s.shape[1] - 1) & (ch < c))
    return jnp.where(spur, jnp.zeros((), s.dtype), s)


def pack_conv_transpose_weights(k: jnp.ndarray) -> jnp.ndarray:
    """flax ConvTranspose (2, 2, Ci, Co) -> packed (1, 2, Ci, 2Co)."""
    return jnp.stack(
        [jnp.concatenate([k[1 - di, dj] for di in range(2)], axis=-1)
         for dj in range(2)], axis=0)[None]


def packed_max_pool(xp: jnp.ndarray) -> jnp.ndarray:
    """2x2/s2 max pool of the packed input -> standard (unpacked) layout.

    Vertical reduction = channel max over the two packed groups; horizontal
    = (1,2)/s(1,2) window; VALID padding drops odd trailing columns (torch
    floor semantics, like blocks.max_pool_2x2)."""
    c = xp.shape[-1] // 2
    v = jnp.maximum(xp[..., :c], xp[..., c:])
    return nn.max_pool(v, (1, 2), strides=(1, 2))


def packed_concat(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Packed representation of channel-concat(A, B): group-wise reorder
    [a0, b0, a1, b1] (packed channels are di-major).

    REFERENCE IMPLEMENTATION ONLY (kept for tests/test_packed.py): the
    production blocks use the weight-split logical concat instead — this
    materialized reorder measured 4.7x slower on the chip (64-lane
    shuffles; BASELINE.md). Do not wire into a model path."""
    ca, cb = a.shape[-1] // 2, b.shape[-1] // 2
    return jnp.concatenate(
        [a[..., :ca], b[..., :cb], a[..., ca:], b[..., cb:]], axis=-1)


class StaggerConv1(nn.Module):
    """3x3/s1 SAME conv, packed input -> STAGGERED output (75%-dense (2,3)
    kernel, spurious slots zeroed). Parameters are the STANDARD nn.Conv
    ones (kernel (3,3,in,out), bias (out)) — restructured on the fly.

    An optional second operand ``b`` is consumed as the LOGICAL channel
    concat ``cat(a, b)`` in weight-split form: conv(cat(a,b), W) =
    conv(a, W_a) + conv(b, W_b) — lane-sized packed groups stay whole (a
    materialized packed concat needs 64-lane shuffles, measured ~4.7x
    slower, tools/bench notes). The partial conv outputs accumulate in
    f32 (``preferred_element_type``) and round to the compute dtype ONCE,
    so the pair path adds no extra bf16 rounding over the unpacked concat
    conv — the module contract stays 'exact, fp reassociation only'."""

    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, a: jnp.ndarray,
                 b: jnp.ndarray | None = None) -> jnp.ndarray:
        ca = a.shape[-1] // 2
        cb = b.shape[-1] // 2 if b is not None else 0
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, ca + cb, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        dn = ("NHWC", "HWIO", "NHWC")
        pad = ((1, 1), (1, 1))
        if b is None:
            ws = stagger_conv1_weights(kernel).astype(self.dtype)
            y = lax.conv_general_dilated(a.astype(self.dtype), ws, (1, 1),
                                         pad, dimension_numbers=dn)
        else:
            wa = stagger_conv1_weights(kernel[:, :, :ca]).astype(self.dtype)
            wb = stagger_conv1_weights(kernel[:, :, ca:]).astype(self.dtype)
            y = pair_conv_f32_acc(a.astype(self.dtype), wa,
                                  b.astype(self.dtype), wb, pad)
        return zero_spurious(y + jnp.tile(bias, 2).astype(self.dtype))


class StaggerConv2(nn.Module):
    """3x3/s1 SAME conv, STAGGERED input -> packed output (75%-dense (2,3)
    kernel, rows VALID). Same standard parameter shapes as StaggerConv1."""

    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, s: jnp.ndarray) -> jnp.ndarray:
        cin = s.shape[-1] // 2
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        ws = stagger_conv2_weights(kernel).astype(self.dtype)
        y = lax.conv_general_dilated(
            s.astype(self.dtype), ws, (1, 1), ((0, 0), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + jnp.tile(bias, 2).astype(self.dtype)


class PackedBatchNorm(nn.Module):
    """BatchNorm over packed activations with per-LOGICAL-channel statistics
    — numerics identical to flax nn.BatchNorm on the unpacked tensor
    (momentum 0.9, eps 1e-5, f32 stats). Parameter/stat names and shapes
    match nn.BatchNorm (scale/bias, mean/var of size C)."""

    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = jnp.bfloat16
    # Input is STAGGERED: height carries one extra (zeroed) spurious slot
    # per group, so group sums are divided by the true element count.
    staggered: bool = False

    @nn.compact
    def __call__(self, xp: jnp.ndarray) -> jnp.ndarray:
        c = xp.shape[-1] // 2
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = xp.astype(jnp.float32)
            b, h, w, _ = xf.shape
            cnt = b * (h - 1 if self.staggered else h) * w
            m = jnp.sum(xf, axis=(0, 1, 2)) / cnt
            m2 = jnp.sum(xf * xf, axis=(0, 1, 2)) / cnt
            mean = 0.5 * (m[:c] + m[c:])
            var = 0.5 * (m2[:c] + m2[c:]) - mean * mean
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var)

        # mirror flax nn.BatchNorm's arithmetic exactly: _normalize runs the
        # whole (x - mean) * (scale * rsqrt(var + eps)) + bias chain in the
        # PROMOTED f32 (params/stats are f32) and casts ONCE at the end —
        # computing the affine in bf16 diverged from the unpacked path by
        # up to 0.03 on unit-scale activations in the production precision
        mul = scale * lax.rsqrt(var + self.epsilon)
        y = ((xp.astype(jnp.float32) - jnp.tile(mean, 2))
             * jnp.tile(mul, 2) + jnp.tile(bias, 2))
        return y.astype(self.dtype)


class PackedDoubleConv(nn.Module):
    """(3x3 conv -> BN -> ReLU) * 2 on packed activations via the staggered
    intermediate layout; variable tree matches blocks.DoubleConv
    (conv1/bn1/conv2/bn2). Input and output are standard-packed. An
    optional second operand ``b`` feeds conv1 as the logical channel
    concat ``cat(a, b)`` (the Up skip path; see :class:`StaggerConv1`)."""

    out_ch: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, a: jnp.ndarray, train: bool,
                 b: jnp.ndarray | None = None) -> jnp.ndarray:
        s = StaggerConv1(self.out_ch, self.dtype, name="conv1")(a, b)
        s = PackedBatchNorm(use_running_average=not train, dtype=self.dtype,
                            staggered=True, name="bn1")(s)
        # BN's affine shift revives the spurious slots; re-zero them (the
        # mask fuses into this elementwise chain).
        s = zero_spurious(nn.relu(s))
        x = StaggerConv2(self.out_ch, self.dtype, name="conv2")(s)
        x = PackedBatchNorm(use_running_average=not train, dtype=self.dtype,
                            name="bn2")(x)
        return nn.relu(x)


class PackedUpsample(nn.Module):
    """ConvTranspose(2x2, s2) from standard input to PACKED output;
    parameters match nn.ConvTranspose (kernel (2,2,in,out), bias)."""

    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (2, 2, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        kp = pack_conv_transpose_weights(kernel).astype(self.dtype)
        y = lax.conv_transpose(
            x.astype(self.dtype), kp, (1, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + jnp.tile(bias, 2).astype(self.dtype)


class PackedConv1x1(nn.Module):
    """1x1 conv on packed operand(s) with block-diagonal packed weights;
    parameter names/shapes match nn.Conv's (kernel (1, 1, cin, out)).
    blocks.OutConv's packed branch builds the head from this directly
    (unpack AFTER the channel reduction, so no full-size transpose)."""

    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, a: jnp.ndarray, b: jnp.ndarray | None = None) -> jnp.ndarray:
        ca = a.shape[-1] // 2
        cb = b.shape[-1] // 2 if b is not None else 0
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (1, 1, ca + cb, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)

        def block_diag(w):  # (1,1,ci,co) -> (1,1,2ci,2co), di==oi blocks
            ci = w.shape[2]
            wp = jnp.zeros((1, 1, 2 * ci, 2 * self.features), w.dtype)
            for d in range(2):
                wp = wp.at[:, :, d * ci:(d + 1) * ci,
                           d * self.features:(d + 1) * self.features].set(w)
            return wp

        dn = ("NHWC", "HWIO", "NHWC")
        if b is None:
            y = lax.conv_general_dilated(
                a.astype(self.dtype),
                block_diag(kernel[:, :, :ca]).astype(self.dtype),
                (1, 1), "SAME", dimension_numbers=dn)
        else:
            # weight-split logical concat: accumulate the partial outputs
            # in f32 and round once, matching the unpacked concat conv's
            # single rounding (see StaggerConv1 / pair_conv_f32_acc)
            y = pair_conv_f32_acc(
                a.astype(self.dtype),
                block_diag(kernel[:, :, :ca]).astype(self.dtype),
                b.astype(self.dtype),
                block_diag(kernel[:, :, ca:]).astype(self.dtype), "SAME")
        return y + jnp.tile(bias, 2).astype(self.dtype)


