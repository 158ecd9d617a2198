"""Test harness config.

All tests run on a virtual 8-device CPU platform so sharding/pjit paths are
exercised without TPU hardware (the fake-cluster capability the reference
lacks — SURVEY.md §4). Must run before the first jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# This image's sitecustomize imports jax and registers the axon TPU backend
# before conftest runs, so the env var alone is too late — pin the platform
# through the live config object as well.
import jax

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache: re-runs of the suite skip recompiling the
# hundreds of test programs (a fresh checkout's first run still compiles).
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), ".jax_test_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # noqa: BLE001 — cache is best-effort
    pass

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
