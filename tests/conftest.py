"""Test harness setup.

Forces JAX onto the CPU backend with 8 virtual devices BEFORE jax is
imported anywhere, so sharding/mesh tests run without TPU hardware
(the standard JAX trick for testing multi-chip code paths).
"""

import os

# Force the virtual 8-device CPU backend. The host environment pins
# JAX_PLATFORMS=axon (TPU tunnel) and its sitecustomize.py imports jax at
# interpreter startup, so env vars alone are read too late —
# jax.config.update after import is what actually takes effect. XLA_FLAGS is
# read lazily at CPU-client creation, so setting it here still works.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import numpy as np
import pytest

# Fast tier: core-logic files that together run in <5 min on this host
# (measured 2026-08-19: config 6s, losses 16s, metrics 11s, golden 68s,
# aux 34s, ops 13s, models 120s ≈ 4.5 min). Run with
#   python -m pytest tests/ -m fast -q
# The full suite (~30 min solo) stays the bar before a round ends; the fast
# tier is the inner verify loop while iterating.
_FAST_FILES = {
    "test_config.py",
    "test_losses.py",
    "test_metrics.py",
    "test_models.py",
    "test_golden.py",
    "test_aux.py",
    "test_ops.py",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "fast: core-logic subset that runs in <5 min (inner loop)"
    )


def pytest_collection_modifyitems(config, items):
    for item in items:
        if Path(item.fspath).name in _FAST_FILES:
            item.add_marker(pytest.mark.fast)


_TOOL_MODULES: dict = {}


def import_tool(name: str):
    """Import ``tools/<name>.py`` by file path WITHOUT mutating sys.path.

    Inserting tools/ at sys.path[0] (the obvious alternative) leaks for the
    rest of the pytest session: any later bare import matching a tools/*.py
    name would silently resolve to the tool module. Modules are cached in a
    private table (not sys.modules — tool names must not shadow real
    imports) so two tests loading the same tool share one execution and one
    set of class identities.
    """
    import importlib.util

    if name in _TOOL_MODULES:
        return _TOOL_MODULES[name]
    path = REPO_ROOT / "tools" / f"{name}.py"
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    _TOOL_MODULES[name] = mod
    return mod


@pytest.fixture(scope="session")
def repo_root() -> Path:
    return REPO_ROOT


@pytest.fixture(scope="session")
def rng() -> np.random.Generator:
    return np.random.default_rng(7)


@pytest.fixture(scope="session")
def fixture_dataset(tmp_path_factory) -> Path:
    """Tiny synthetic SpaceNet7-layout dataset tree shared across tests."""
    from multimodal_siamese_cd_tpu.data.synthetic import generate_fixture_dataset

    root = tmp_path_factory.mktemp("sn7_fixture")
    generate_fixture_dataset(root, seed=7)
    return root
