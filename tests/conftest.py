"""Test harness configuration.

Tests run on CPU with 8 virtual devices so the multi-chip sharding paths
(parallel/) compile and execute without TPU hardware, per the reference test
strategy translated in SURVEY §4: multi-host tests runnable on CPU via
``XLA_FLAGS=--xla_force_host_platform_device_count``.

Note: this environment's sitecustomize force-registers a TPU backend and
pins JAX_PLATFORMS; ``jax.config.update`` below wins over both, and avoids
test processes contending for the single TPU chip.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0xD15CA)
