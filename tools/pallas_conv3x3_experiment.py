"""ARCHIVED EXPERIMENT — Pallas 3x3 stride-1 SAME convolution (loses to XLA).

Final verdict (round 4): NOT pursued further; moved out of the shipped
package (was multimodal_siamese_cd_tpu/ops/conv3x3.py). The measured
negative: 18.5 useful TF/s vs XLA's 22 at the 64ch@256px level. The
docstring's own follow-up plan (native channels-last-128 activations
end-to-end + fusing the second DoubleConv matmul while the packed operand
is VMEM-resident) was overtaken by the STAGGERED packed layout
(models/packed.py), which removed the bottleneck this kernel targeted:
full-res convs now run at the 1.33x staggered-packing floor inside XLA,
and the whole step is converged at ~24.2 ms (BASELINE.md). The residual
theoretical upside (the 25% staggered-slot waste, <=1.4 ms) is smaller
than the measured Pallas packing overhead that made this kernel lose by
16% on a simpler task — recorded as a final negative result in
BASELINE.md, kept here only as a worked example of manual double-buffered
HBM DMA + tap-packed MXU matmuls (correctness pinned by
tests/test_ops.py::test_pallas_conv3x3_matches_lax_conv in interpret
mode).

Motivation (BASELINE.md / CLAUDE.md perf notes): XLA's conv on v5e reaches
only ~22 TFLOP/s for 64-channel 256px activations — the level where ~80% of
the training step's time lives — while deep levels run at 90%+ of peak.
This kernel reformulates the conv as tap-packed matmuls: for each output
row-tile it builds a (rows*W, 3*Cin) left operand from the three horizontal
taps (VMEM-local concat) and accumulates three MXU matmuls (one per
vertical shift) with K = 3*Cin — pushing the contraction dimension to 192+
instead of 64. Row tiles overlap by a 2-row halo, so input blocks are DMA'd
manually (double-buffered) from HBM rather than via BlockSpec tiling.

Status (measured on v5e, batch 8, 64ch@256px, Cin zero-padded to 128 for
lane alignment): bit-correct vs lax.conv at bf16, 18.5 useful TFLOP/s vs
XLA's 22 — the VMEM tap-packing copies and the 2x padded-K overhead consume
the MXU-utilization gain. Kept as an experimental op (NOT wired into the
models); the path to beating XLA is a layout that keeps Cin=128 native
(channels-last-128 activations end to end) plus fusing the second DoubleConv
matmul while the packed operand is VMEM-resident. Forward-only; falls back
to lax.conv off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_hbm, w_ref, out_ref, scratch, pack, sems, *,
            tile_rows, n_tiles, width, cin, cout):
    i = pl.program_id(0)
    j = pl.program_id(1)

    def dma_for(slot, tile_idx):
        return pltpu.make_async_copy(
            x_hbm.at[i, pl.ds(tile_idx * tile_rows, tile_rows + 2)],
            scratch.at[slot],
            sems.at[slot],
        )

    slot = j % 2

    @pl.when(j == 0)
    def _warmup():
        dma_for(0, 0).start()

    @pl.when(j + 1 < n_tiles)
    def _prefetch():
        dma_for((j + 1) % 2, j + 1).start()

    dma_for(slot, j).wait()
    x = scratch[slot]

    acc = jnp.zeros((tile_rows * width, cout), jnp.float32)
    for dy in range(3):
        rows = x[dy:dy + tile_rows, :, :]  # (tile_rows, width+2, cin)
        # Pack the three horizontal taps along the channel (lane) axis via
        # scratch writes — Mosaic cannot concat operands with mismatched
        # sublane offsets directly.
        for dx in range(3):
            pack[:, :, dx * cin:(dx + 1) * cin] = rows[:, dx:dx + width, :]
        acc = acc + jnp.dot(pack[...].reshape(tile_rows * width, 3 * cin),
                            w_ref[dy], preferred_element_type=jnp.float32)
    out_ref[...] = acc.reshape(1, tile_rows, width, cout).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_rows", "interpret"))
def conv3x3_pallas(x, w, tile_rows: int = 32, interpret: bool = False):
    """y = conv3x3_same(x, w); x: (B, H, W, Cin) -> (B, H, W, Cout).

    ``w``: (3, 3, Cin, Cout) HWIO. bf16 MXU compute, f32 accumulation;
    output dtype follows x.
    """
    b, h, width, cin = x.shape
    cout = w.shape[-1]
    assert h % tile_rows == 0, (h, tile_rows)
    assert cin % 128 == 0, (
        f"conv3x3_pallas needs lane-aligned input channels (got {cin}); "
        f"zero-pad Cin to a multiple of 128 (weights too)")
    n_tiles = h // tile_rows
    # Mosaic constraints on the DMA'd HBM block: the sublane (W) dim must be
    # a multiple of 8 — pad the right edge beyond the conv halo.
    extra_w = (-(width + 2)) % 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1 + extra_w), (0, 0))).astype(jnp.bfloat16)
    # pack taps: (3, 3*cin, cout): w_packed[dy] = concat over dx of w[dy, dx]
    wp = jnp.concatenate([w[:, 0], w[:, 1], w[:, 2]], axis=1).astype(jnp.bfloat16)

    out = pl.pallas_call(
        functools.partial(_kernel, tile_rows=tile_rows, n_tiles=n_tiles,
                          width=width, cin=cin, cout=cout),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # x stays in HBM; manual DMA
            pl.BlockSpec((3, 3 * cin, cout), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_rows, width, cout),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, width, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tile_rows + 2, width + 2 + extra_w, cin), jnp.bfloat16),
            pltpu.VMEM((tile_rows, width, 3 * cin), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, wp)
    return out


def conv3x3_reference(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
