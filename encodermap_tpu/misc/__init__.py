# encodermap_tpu/misc/__init__.py
"""Host-side utilities: toy data, checkpointing, summaries."""

from .misc import create_n_cube, get_full_common_str_and_ref, run_path
from .saving import load_checkpoint, load_pytree, save_checkpoint, save_pytree

__all__ = [
    "create_n_cube",
    "get_full_common_str_and_ref",
    "run_path",
    "load_checkpoint",
    "load_pytree",
    "save_checkpoint",
    "save_pytree",
]
