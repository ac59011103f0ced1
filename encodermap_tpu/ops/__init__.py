# encodermap_tpu/ops/__init__.py
"""Pure-JAX math kernels: distances, backmapping, geometry, Kabsch."""

from .backmap import (
    backmap,
    chain_in_plane,
    dihedral_to_cartesian_one_way,
    dihedrals_to_cartesian,
    guess_amide_H,
    guess_amide_O,
    merge_cartesians,
    rotation_matrices,
)
from .dssp import compute_dssp, kabsch_sander_hbonds
from .distances import (
    pairwise_dist,
    pairwise_dist_periodic,
    periodic_distance,
    periodic_distance_np,
    sigmoid,
)

__all__ = [
    "backmap",
    "chain_in_plane",
    "dihedral_to_cartesian_one_way",
    "dihedrals_to_cartesian",
    "guess_amide_H",
    "guess_amide_O",
    "merge_cartesians",
    "rotation_matrices",
    "compute_dssp",
    "kabsch_sander_hbonds",
    "pairwise_dist",
    "pairwise_dist_periodic",
    "periodic_distance",
    "periodic_distance_np",
    "sigmoid",
]
