"""Data pipeline: dataset index logic, scene cache, augmentation, loading."""

from importlib import import_module

__all__ = ["MultimodalCDDataset"]


def __getattr__(name):
    # Lazy import keeps `data.synthetic` usable in isolation and avoids
    # importing jax for fixture generation.
    if name == "MultimodalCDDataset":
        return import_module(".dataset", __name__).MultimodalCDDataset
    raise AttributeError(name)
