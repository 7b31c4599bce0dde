"""Test harness configuration.

All tests run on CPU with 8 virtual XLA devices so multi-chip sharding paths
can be exercised without TPU hardware (the reference has no test suite at all
-- SURVEY.md section 4 -- so this pyramid is designed from scratch).

The env vars MUST be set before jax is imported anywhere.
"""

import os

# HARD override: the shell env pins JAX_PLATFORMS=axon (the TPU tunnel) and
# the axon sitecustomize sets jax.config.jax_platforms="axon,cpu" at
# interpreter start -- the env var alone is IGNORED after that. The config
# must be updated explicitly (before any backend initialization).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# persistent compilation cache: repeat test runs skip XLA recompilation
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_emap_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
