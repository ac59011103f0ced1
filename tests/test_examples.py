# tests/test_examples.py
"""Execute every examples/*.py script end-to-end (reduced step counts) so
the examples cannot rot — the analog of the reference's notebook-execution
CI (``/root/reference/tests/test_notebooks.py:40-148``)."""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
EXAMPLES = sorted((REPO / "examples").glob("*.py"))


@pytest.mark.slow
@pytest.mark.parametrize("script", EXAMPLES, ids=lambda p: p.stem)
def test_example_runs(script, tmp_path):
    if not Path("/root/reference/tests/data").exists() and "cube" not in script.stem:
        pytest.skip("reference test data not mounted")
    env = dict(os.environ)
    env.update(
        EM_EXAMPLE_STEPS="8",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=(env.get("XLA_FLAGS", "")
                   + " --xla_force_host_platform_device_count=8").strip(),
        JAX_COMPILATION_CACHE_DIR=str(REPO / ".jax_cache"),
        JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="0",
        PYTHONPATH=str(REPO),
        MPLBACKEND="Agg",
    )
    # examples write into ./runs/<name>; run from a temp cwd to keep the
    # repo clean
    proc = subprocess.run(
        [sys.executable, str(script)],
        cwd=tmp_path,
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert proc.returncode == 0, (
        f"{script.name} failed\nstdout:\n{proc.stdout[-3000:]}\n"
        f"stderr:\n{proc.stderr[-3000:]}"
    )


@pytest.mark.slow
def test_two_state_separation(tmp_path):
    """The two-state example must actually SEPARATE the states at a real
    step count (the smoke parametrization above runs 8 steps; this is the
    scientific assertion — reference analog: the M1-diUbq two-state
    latent-clustering test, ``tests/test_autoencoder.py:1688``)."""
    script = REPO / "examples" / "two_state_ensemble.py"
    if not Path("/root/reference/tests/data").exists():
        pytest.skip("reference test data not mounted")
    env = dict(os.environ)
    env.update(
        EM_EXAMPLE_STEPS="300",
        JAX_PLATFORMS="cpu",
        JAX_COMPILATION_CACHE_DIR=str(REPO / ".jax_cache"),
        JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="0",
        PYTHONPATH=str(REPO),
        MPLBACKEND="Agg",
    )
    proc = subprocess.run(
        [sys.executable, str(script)], cwd=tmp_path, env=env,
        capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [l for l in proc.stdout.splitlines()
            if "1-NN label accuracy" in l][0]
    acc = float(line.rsplit(":", 1)[1])
    assert acc >= 0.9, proc.stdout
