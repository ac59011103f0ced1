# tests/test_doctests.py
"""Execute docstring examples PACKAGE-WIDE — the analog of the reference's
``tests/test_doctests.py`` + ``run_doctests.py`` (which walk every module).
Modules are auto-discovered with ``pkgutil.walk_packages``; only compiled
extension artifacts are excluded. A module with zero examples still gets
imported here, so a broken top-level import in any module fails the suite.
"""

import doctest
import importlib
import pkgutil

import pytest


def _discover() -> list:
    import encodermap_tpu

    names = ["encodermap_tpu"]
    for m in pkgutil.walk_packages(encodermap_tpu.__path__, "encodermap_tpu."):
        # the native XTC decoder's raw shared object is not a Python module
        if m.name.rpartition(".")[2].startswith("lib"):
            continue
        names.append(m.name)
    return sorted(names)


MODULES = _discover()


def test_discovery_is_package_wide():
    """Guard against the discovery silently collapsing (e.g. a rename):
    every first-level subpackage must appear."""
    tops = {n.split(".")[1] for n in MODULES if "." in n}
    assert {"data", "loading", "misc", "models", "ops", "parallel",
            "plot", "train"} <= tops
    assert len(MODULES) > 50


def test_known_examples_are_collected():
    """The doctest runner must actually see the examples we ship (an empty
    finder pass would vacuously succeed)."""
    mod = importlib.import_module("encodermap_tpu.misc.misc")
    n = sum(len(t.examples) for t in doctest.DocTestFinder().find(mod))
    assert n >= 10


@pytest.mark.parametrize("modname", MODULES)
def test_doctests(modname):
    mod = importlib.import_module(modname)
    results = doctest.testmod(
        mod, optionflags=doctest.ELLIPSIS | doctest.NORMALIZE_WHITESPACE
    )
    assert results.failed == 0, f"{results.failed} doctest failures in {modname}"
