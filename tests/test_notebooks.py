# tests/test_notebooks.py
"""Execute every tutorials/**/*.ipynb end-to-end (reduced step counts) —
the analog of the reference's notebook CI
(``/root/reference/tests/test_notebooks.py:40-148``), on nbclient.

The notebooks are generated artifacts: edit ``scripts/gen_tutorials.py``,
re-run it, commit both. A meta-test below keeps the committed notebooks in
sync with the generator.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
NOTEBOOKS = sorted((REPO / "tutorials").rglob("*.ipynb"))


def _env(tmp_path):
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
        JUPYTER_PLATFORM_DIRS="1",
    )
    return env


def test_notebooks_exist():
    """All four reference tutorial series have TPU-framework analogs."""
    series = {p.parent.name for p in NOTEBOOKS}
    assert {
        "notebooks_starter", "notebooks_intermediate",
        "notebooks_MD", "notebooks_customization",
    } <= series, series
    assert len(NOTEBOOKS) >= 12


def test_notebooks_match_generator(tmp_path):
    """Committed notebooks == what scripts/gen_tutorials.py generates."""
    import nbformat

    sys.path.insert(0, str(REPO / "scripts"))
    try:
        import gen_tutorials
    finally:
        sys.path.pop(0)
    for name, cells in gen_tutorials.NOTEBOOKS.items():
        committed = REPO / "tutorials" / name
        assert committed.exists(), f"{name}: run scripts/gen_tutorials.py"
        nb = nbformat.read(committed, as_version=4)
        gen = gen_tutorials.build(name, cells)
        assert [c.source for c in nb.cells] == [
            c.source for c in gen.cells
        ], f"{name} is stale — re-run scripts/gen_tutorials.py"


@pytest.mark.slow
@pytest.mark.parametrize(
    "notebook", NOTEBOOKS, ids=lambda p: f"{p.parent.name}/{p.stem}"
)
def test_notebook_executes(notebook, tmp_path):
    needs_data = notebook.parent.name in ("notebooks_intermediate",
                                          "notebooks_MD")
    if needs_data and not Path("/root/reference/tests/data").exists():
        pytest.skip("reference test data not mounted")
    if "Asp7" in notebook.name and not Path(
        "/root/reference/tutorials/notebooks_starter/asp7.csv"
    ).exists():
        pytest.skip("asp7.csv fixture not mounted")
    # run from a temp cwd so runs/ artifacts stay out of the repo
    out = tmp_path / notebook.name
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "run_notebook.py"),
         str(notebook), str(out)],
        cwd=tmp_path,
        env=_env(tmp_path),
        capture_output=True,
        text=True,
        timeout=1500,
    )
    assert proc.returncode == 0, (
        f"{notebook.name} failed\nstdout:\n{proc.stdout[-3000:]}\n"
        f"stderr:\n{proc.stderr[-5000:]}"
    )
