"""Test configuration: force an 8-device virtual CPU platform so multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Opt out of the default cross-run decode cache (~/.cache/tpudepth_data):
# tests construct many tiny synthetic datasets and must not leave memmap
# caches behind. Tests that exercise the disk cache pass cache_dir=tmp_path.
os.environ.setdefault("TPUDEPTH_CACHE_DIR", "")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin overrides JAX_PLATFORMS from the environment; force CPU
# through the config API as well so the 8-device virtual mesh is used.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute matched-training / multi-process tests "
        "(fast gate: pytest -m 'not slow')",
    )
