"""Test configuration: run JAX on a virtual 8-device CPU mesh.

This is the standard JAX substitute for multi-chip hardware (SURVEY §4):
pjit/shard_map sharding is validated on 8 fake CPU devices, and the driver
separately dry-run-compiles the multi-chip path via __graft_entry__.
Must run before jax is imported anywhere.
"""

import os

# Hard override: the harness presets JAX_PLATFORMS=axon (real TPU tunnel);
# tests must run on the virtual CPU mesh. A pytest plugin imports jax before
# this conftest, so the env var alone is too late — update jax.config too
# (backends initialize lazily, so this still applies).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
# Persistent compilation cache: first test run pays XLA compiles, reruns don't.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running test (cluster spawn etc.)")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
