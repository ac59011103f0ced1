# encodermap_tpu/misc/__init__.py
"""Host-side utilities: toy data, checkpointing, summaries.

Mirrors the reference's ``em.misc`` star-export surface
(``/root/reference/encodermap/misc/__init__.py:26-31`` pulls in
``distances``/``backmapping``/``misc`` — its own tutorials call
``em.misc.pairwise_dist``), so migrating code finds the same names here;
the kernels themselves live in ``ops/``.
"""

from ..ops.backmap import (
    guess_amide_H,
    guess_amide_O,
    guess_sp2_atom,
    merge_cartesians,
    split_and_reverse_cartesians,
    split_and_reverse_dihedrals,
)
from ..ops.backmap import rotation_matrices as rotation_matrix
from ..ops.distances import (
    pairwise_dist,
    pairwise_dist_periodic,
    periodic_distance,
    periodic_distance_np,
    sigmoid,
)
from .backmapping_offline import (
    dihedral_backmapping,
    mdtraj_backmapping,
    mdtraj_rotate,
)
from .summaries import (
    MetricsWriter,
    add_layer_summaries,
    histogram_summary,
    image_summary,
)
from .misc import (
    all_equal,
    arbitrary_dihedral,
    backbone_hydrogen_oxygen_crossproduct,
    create_n_cube,
    get_full_common_str_and_ref,
    match_files,
    plot_model,
    printTable,
    random_on_cube_edges,
    run_path,
    temp_seed,
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
    "backbone_hydrogen_oxygen_crossproduct",
    "create_n_cube",
    "dihedral_backmapping",
    "get_full_common_str_and_ref",
    "guess_amide_H",
    "guess_amide_O",
    "guess_sp2_atom",
    "match_files",
    "mdtraj_backmapping",
    "mdtraj_rotate",
    "merge_cartesians",
    "rotation_matrix",
    "split_and_reverse_cartesians",
    "split_and_reverse_dihedrals",
    "temp_seed",
    "MetricsWriter",
    "add_layer_summaries",
    "histogram_summary",
    "image_summary",
    "pairwise_dist",
    "pairwise_dist_periodic",
    "periodic_distance",
    "periodic_distance_np",
    "plot_model",
    "printTable",
    "random_on_cube_edges",
    "run_path",
    "sigmoid",
    "load_checkpoint",
    "load_pytree",
    "save_checkpoint",
    "save_pytree",
]
