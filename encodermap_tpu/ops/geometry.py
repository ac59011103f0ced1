# encodermap_tpu/ops/geometry.py
"""Geometry kernels: dihedrals, angles, distances from xyz, with periodic
minimum-image support.

The reference delegates these to mdtraj's compiled C extensions
(``_dihedral{,_mic}`` / ``_angle{,_mic}``, imported at
``/root/reference/encodermap/loading/features.py:153-157``). Here they are
batched JAX transforms over device-resident coordinates: indices are
precomputed on host from the topology, the gather + arithmetic runs on TPU
and vmaps over frames trivially.

Conventions (matching mdtraj):
* dihedral: IUPAC signed angle via atan2 (praxeolitic formulation),
* angle: arccos of normalized dot,
* MIC: orthorhombic + triclinic cells supported through the general
  round-to-nearest-lattice-vector wrap (exact for boxes obeying the GROMACS
  reduced form).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = [
    "compute_displacements",
    "compute_distances",
    "compute_angles",
    "compute_dihedrals",
    "compute_center_of_mass",
    "compute_contacts",
]

Array = jax.Array
_HI = jax.lax.Precision.HIGHEST


def _mic_wrap(vecs: Array, box: Array) -> Array:
    """Minimum-image wrap of displacement vectors.

    Args:
        vecs: ``(..., 3)`` displacements.
        box: ``(3, 3)`` cell row-vectors (GROMACS reduced triclinic form:
            lower-triangular rows).
    """
    # fractional coordinates; round to nearest lattice vector and subtract
    inv = jnp.linalg.inv(box)
    frac = jnp.einsum("...i,ij->...j", vecs, inv, precision=_HI)
    frac = frac - jnp.round(frac)
    return jnp.einsum("...i,ij->...j", frac, box, precision=_HI)


def compute_displacements(
    xyz: Array, pairs: Array, box: Optional[Array] = None
) -> Array:
    """Displacement vectors for atom index pairs.

    Args:
        xyz: ``(n_frames, n_atoms, 3)``.
        pairs: ``(n_pairs, 2)`` int indices.
        box: optional ``(n_frames, 3, 3)`` unit cells for MIC.

    Returns:
        ``(n_frames, n_pairs, 3)``.
    """
    d = xyz[:, pairs[:, 1]] - xyz[:, pairs[:, 0]]
    if box is not None:
        d = jax.vmap(_mic_wrap)(d, box)
    return d


def compute_distances(
    xyz: Array, pairs: Array, box: Optional[Array] = None
) -> Array:
    """Pair distances ``(n_frames, n_pairs)`` with optional MIC."""
    d = compute_displacements(xyz, pairs, box)
    return jnp.sqrt(jnp.sum(jnp.square(d), axis=-1))


def compute_angles(
    xyz: Array, triplets: Array, box: Optional[Array] = None
) -> Array:
    """Angles at the middle atom of each triplet, ``(n_frames, n_triplets)``."""
    p0 = xyz[:, triplets[:, 0]]
    p1 = xyz[:, triplets[:, 1]]
    p2 = xyz[:, triplets[:, 2]]
    u = p0 - p1
    v = p2 - p1
    if box is not None:
        u = jax.vmap(_mic_wrap)(u, box)
        v = jax.vmap(_mic_wrap)(v, box)
    cos = jnp.sum(u * v, -1) / (
        jnp.linalg.norm(u, axis=-1) * jnp.linalg.norm(v, axis=-1)
    )
    return jnp.arccos(jnp.clip(cos, -1.0, 1.0))


def compute_dihedrals(
    xyz: Array, quadruplets: Array, box: Optional[Array] = None
) -> Array:
    """Signed dihedrals (IUPAC convention, like mdtraj),
    ``(n_frames, n_quads)`` in (-pi, pi]."""
    p0 = xyz[:, quadruplets[:, 0]]
    p1 = xyz[:, quadruplets[:, 1]]
    p2 = xyz[:, quadruplets[:, 2]]
    p3 = xyz[:, quadruplets[:, 3]]
    b0 = p0 - p1
    b1 = p2 - p1
    b2 = p3 - p2
    if box is not None:
        wrap = jax.vmap(_mic_wrap)
        b0, b1, b2 = wrap(b0, box), wrap(b1, box), wrap(b2, box)
    b1n = b1 / jnp.linalg.norm(b1, axis=-1, keepdims=True)
    v = b0 - jnp.sum(b0 * b1n, -1, keepdims=True) * b1n
    w = b2 - jnp.sum(b2 * b1n, -1, keepdims=True) * b1n
    x = jnp.sum(v * w, -1)
    y = jnp.sum(jnp.cross(b1n, v) * w, -1)
    return jnp.arctan2(y, x)


def compute_center_of_mass(
    xyz: Array, group_indices: Array, masses: Array
) -> Array:
    """Mass-weighted center of one atom group per frame.

    Args:
        xyz: ``(n_frames, n_atoms, 3)``.
        group_indices: ``(n_group,)`` int indices.
        masses: ``(n_group,)`` atomic masses.

    Returns:
        ``(n_frames, 3)``.
    """
    sel = xyz[:, group_indices]
    w = masses / jnp.sum(masses)
    return jnp.einsum("fng,n->fg", sel, w, precision=_HI)


def compute_contacts(
    xyz: Array,
    pairs: Array,
    threshold: float = 0.45,
    box: Optional[Array] = None,
) -> Array:
    """Binary contact map over the given pairs (dist < threshold)."""
    return (compute_distances(xyz, pairs, box) < threshold).astype(jnp.float32)
