# encodermap_tpu/data/native/build.py
"""Compile-on-first-use for the native IO library (ctypes, no pybind11).

The shared object is cached next to the source and rebuilt when the source is
newer. Falls back to None if no compiler is available (callers then use the
pure-Python decoder)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

_HERE = Path(__file__).parent
_LIB: dict[str, Optional[ctypes.CDLL]] = {}
_LOCK = threading.Lock()


def _compile(src: Path, so: Path) -> None:
    """g++ to a process-unique temp name, then atomically publish: two
    concurrent builders (featurizer prepare thread + main thread, or two
    pytest processes) must never dlopen a half-written .so."""
    tmp = so.with_name(f".{so.name}.{os.getpid()}.tmp")
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", str(src), "-o", str(tmp)],
            check=True,
            capture_output=True,
        )
        tmp.replace(so)
    finally:
        tmp.unlink(missing_ok=True)


def load_library(name: str = "xdr_xtc") -> Optional[ctypes.CDLL]:
    """Build (if needed) and dlopen lib<name>.so; None if compilation fails.

    A dlopen failure of an EXISTING .so (stale/ABI-mismatched binary from a
    checkout) triggers one rebuild before giving up — otherwise a bad
    cached binary would permanently disable native IO even with a working
    compiler."""
    with _LOCK:
        if name in _LIB:
            return _LIB[name]
        src = _HERE / f"{name}.cpp"
        so = _HERE / f"lib{name}.so"
        lib: Optional[ctypes.CDLL] = None
        try:
            if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
                _compile(src, so)
            try:
                lib = ctypes.CDLL(str(so))
            except OSError:
                _compile(src, so)  # stale or incompatible binary: rebuild
                lib = ctypes.CDLL(str(so))
        except (OSError, subprocess.CalledProcessError) as e:
            print(f"native build of {name} failed ({e}); "
                  f"using Python fallback")
            lib = None
        _LIB[name] = lib
        return lib
