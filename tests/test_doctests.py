# tests/test_doctests.py
"""Execute docstring examples package-wide — the analog of the reference's
``tests/test_doctests.py`` / ``run_doctests.py``."""

import doctest

import pytest

MODULES = [
    "encodermap_tpu.ops.distances",
    "encodermap_tpu.misc.misc",
    "encodermap_tpu.parameters",
    "encodermap_tpu.losses",
    "encodermap_tpu.nn",
]


@pytest.mark.parametrize("modname", MODULES)
def test_doctests(modname):
    import importlib

    mod = importlib.import_module(modname)
    results = doctest.testmod(
        mod, optionflags=doctest.ELLIPSIS | doctest.NORMALIZE_WHITESPACE
    )
    assert results.failed == 0, f"{results.failed} doctest failures in {modname}"
