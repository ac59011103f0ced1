# encodermap_tpu/data/native/__init__.py
"""Native (C++) IO components: build-on-first-use with g++, bound via ctypes."""

from .build import load_library

__all__ = ["load_library"]
