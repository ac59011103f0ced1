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
# library code no longer flips the global backend itself (meta-test in
# test_project_structure.py), so pin the headless one for the suite
os.environ.setdefault("MPLBACKEND", "Agg")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# single-core box: persist XLA compiles across test runs/processes.
# MUST go through jax.config (like jax_platforms above): the sitecustomize
# pre-imports jax before conftest runs, so the env vars are already bound
# into config defaults and setting them here is silently ignored —
# measured as a full recompile of every program on every pytest run.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng(request):
    """Per-test deterministic RNG seeded from the test's node id, so every
    test's data is INDEPENDENT of which tests ran before it and any
    failure reproduces under -k isolation. (Replaced a session-scoped
    shared stream, whose order-dependence made marginal tolerances fail
    only under certain subsets.)"""
    import zlib

    return np.random.default_rng(
        zlib.crc32(request.node.nodeid.encode())
    )
