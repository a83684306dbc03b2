"""Pallas TPU kernels (with XLA fallbacks) for the framework's hot ops."""

from .confusion import confusion_counts, confusion_counts_pallas  # noqa: F401
