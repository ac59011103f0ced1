# encodermap_tpu/misc/__init__.py
"""Host-side utilities: toy data, checkpointing, summaries."""

from .misc import create_n_cube
from .saving import load_checkpoint, load_pytree, save_checkpoint, save_pytree

__all__ = [
    "create_n_cube",
    "load_checkpoint",
    "load_pytree",
    "save_checkpoint",
    "save_pytree",
]
