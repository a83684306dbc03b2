"""TPU-native multimodal Siamese change-detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
SebastianHafner/multimodal_siamese_cd (PyTorch): Siamese / dual-stream /
U-Net change detection on bitemporal Sentinel-1 SAR + Sentinel-2 optical
imagery over SpaceNet7, with supervised, dual-task, and semi-supervised
(cross-modal consistency) training regimes.

Design notes (TPU-first, not a port):
  * NHWC layout everywhere on device; bf16 matmul/conv compute by default.
  * One jitted XLA program per train step: device-side augmentation graph
    (flip / rot90 / gamma / color-shift) fused with forward+backward.
  * Data parallelism via ``jax.sharding.Mesh`` + NamedSharding (GSPMD)
    instead of the reference's ``nn.DataParallel`` (networks.py:27).
  * Host data pipeline decodes each GeoTIFF once into a packed scene cache
    (the reference re-decodes every tif ~TRAINING_MULTIPLIER times/epoch),
    then serves importance crops via integral-image window sums.
"""

__version__ = "0.1.0"
