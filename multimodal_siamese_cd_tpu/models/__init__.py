"""Model zoo: U-Net family change-detection networks (flax linen, NHWC)."""

from .blocks import Decoder, DoubleConv, Down, Encoder, InConv, OutConv, Up  # noqa: F401
from .factory import (  # noqa: F401
    compute_dtype,
    create_network,
    init_variables,
    input_channels,
    param_count,
)
from .networks import (  # noqa: F401
    DualStreamUNet,
    DualTaskSiameseUNet,
    SiameseUNet,
    SiamUnetDiff,
    UNet,
    WhateverNet,
    WhateverNet2,
)
