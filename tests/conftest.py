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

# Persistent compilation cache, shared by all xdist workers (JAX's cache is
# multi-process safe). Root-causes the rare end-of-suite segfault inside
# backend_compile_and_load: a worker that compiles hundreds of XLA-CPU
# programs accumulates compile state until it can fall over; with the cache,
# warm runs mostly *load* instead of compile. Also cuts warm suite wall time.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_test_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0xD15CA)
