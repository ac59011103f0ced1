# encodermap_tpu/models/__init__.py
"""Model definitions (functional parameter pytrees + apply functions)."""

from . import sequential

__all__ = ["sequential"]
