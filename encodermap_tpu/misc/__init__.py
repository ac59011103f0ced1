# encodermap_tpu/misc/__init__.py
"""Host-side utilities: toy data, checkpointing, summaries."""

from .misc import (
    all_equal,
    arbitrary_dihedral,
    create_n_cube,
    get_full_common_str_and_ref,
    match_files,
    printTable,
    random_on_cube_edges,
    run_path,
)
from .saving import (
    load_checkpoint,
    load_model,
    load_pytree,
    save_checkpoint,
    save_model,
    save_pytree,
)

__all__ = [
    "load_model",
    "save_model",
    "all_equal",
    "arbitrary_dihedral",
    "create_n_cube",
    "get_full_common_str_and_ref",
    "match_files",
    "printTable",
    "random_on_cube_edges",
    "run_path",
    "load_checkpoint",
    "load_pytree",
    "save_checkpoint",
    "save_pytree",
]
