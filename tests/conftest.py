# tests/conftest.py
"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the env vars BEFORE jax initializes, so this sits at the very top of
conftest collection. Mirrors the driver's multichip dry-run environment.
"""

import os

# Force CPU: the driver environment pre-sets JAX_PLATFORMS=axon (remote TPU
# tunnel with remote compile), which would serialize every test compile
# through the tunnel, and a sitecustomize pre-imports jax in every process —
# so we must override via jax.config, not just the env var.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# single-core box: persist XLA compiles across test runs/processes
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
