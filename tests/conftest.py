"""Test configuration: force CPU backend with 8 virtual devices so sharding
tests run without TPU hardware. Set INSTASCENE_TEST_TPU=1 to run on real TPU."""

import os

if not os.environ.get("INSTASCENE_TEST_TPU"):
    # jax may already be imported by sitecustomize with JAX_PLATFORMS=axon —
    # env vars are latched at jax import, so force via jax.config instead.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (e2e training pipelines); "
        "deselect with -m 'not slow'")
    config.addinivalue_line(
        "markers", "fast: cheap unit/oracle test; select with -m fast "
        "for a quick correctness gate")


def pytest_collection_modifyitems(config, items):
    """Two-tier suite: everything in test_train_e2e.py (and anything
    explicitly marked slow) is the slow tier; the rest is the fast
    oracle/unit gate. `pytest -m fast` is the cheap pre-commit gate,
    `pytest -m slow` the e2e tier, plain `pytest` runs both."""
    for item in items:
        if "test_train_e2e" in item.nodeid or item.get_closest_marker("slow"):
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.fast)


@pytest.fixture
def rng():
    return np.random.default_rng(42)
