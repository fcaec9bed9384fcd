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

# Persistent compilation cache, one directory PER xdist worker: warm runs
# mostly *load* programs instead of compiling them, attacking the rare
# end-of-suite segfault inside backend_compile_and_load (per-process
# XLA-CPU compile-state accumulation) and cutting warm suite wall time.
# Per-worker directories keep workers from ever touching one another's
# cache files — a shared directory measured MORE worker crashes, not
# fewer, under concurrent compile load.
_worker = os.environ.get("PYTEST_XDIST_WORKER", "main")
_cache_dir = os.path.join(
    os.path.dirname(__file__), ".jax_test_cache", _worker
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0xD15CA)
