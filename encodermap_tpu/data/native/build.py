# encodermap_tpu/data/native/build.py
"""Compile-on-first-use for the native IO library (ctypes, no pybind11).

The shared object is cached next to the source and rebuilt when the source is
newer. Falls back to None if no compiler is available (callers then use the
pure-Python decoder)."""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

_HERE = Path(__file__).parent
_LIB: dict[str, Optional[ctypes.CDLL]] = {}


def load_library(name: str = "xdr_xtc") -> Optional[ctypes.CDLL]:
    """Build (if needed) and dlopen lib<name>.so; None if compilation fails."""
    if name in _LIB:
        return _LIB[name]
    src = _HERE / f"{name}.cpp"
    so = _HERE / f"lib{name}.so"
    try:
        if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", str(src), "-o", str(so)],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(str(so))
    except (OSError, subprocess.CalledProcessError) as e:
        print(f"native build of {name} failed ({e}); using Python fallback")
        lib = None
    _LIB[name] = lib
    return lib
