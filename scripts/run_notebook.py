# scripts/run_notebook.py
"""Execute a tutorial notebook in place (the reference executes its
tutorials in CI via papermill/nbconvert — ``tests/test_notebooks.py:40-148``;
this is the dependency-light equivalent on nbclient).

Usage: python scripts/run_notebook.py <notebook.ipynb> [out.ipynb]

Honors EM_EXAMPLE_STEPS / EM_TUTORIAL_DATA like examples/*.py. Exits
non-zero on the first failing cell, printing its traceback.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path


def main() -> int:
    import nbformat
    from nbclient import NotebookClient

    path = Path(sys.argv[1])
    out = Path(sys.argv[2]) if len(sys.argv) > 2 else path
    nb = nbformat.read(path, as_version=4)
    # kernel runs in the CALLER's cwd (run artifacts like runs/ land
    # there, not next to the notebook)
    client = NotebookClient(
        nb,
        timeout=1200,
        kernel_name="python3",
        resources={"metadata": {"path": os.getcwd()}},
    )
    client.execute()
    nbformat.write(nb, out)
    print("executed", path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
