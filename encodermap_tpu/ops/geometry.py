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
import numpy as np

__all__ = [
    "compute_displacements",
    "compute_distances",
    "compute_angles",
    "compute_dihedrals",
    "compute_center_of_mass",
    "compute_contacts",
    "boxes_are_triclinic",
    "mic_mode",
]

Array = jax.Array
_HI = jax.lax.Precision.HIGHEST


#: neighbor lattice shifts searched for skewed (triclinic) cells — the
#: per-component round is not the true minimum image near Wigner-Seitz
#: cell corners, so the 26 surrounding images are checked like mdtraj's
#: triclinic MIC kernel does
_NEIGHBOR_SHIFTS = np.array(
    [[i, j, k] for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (-1, 0, 1)],
    np.float32,
)

#: trace-time override for the MIC kernel choice (None = decide from the
#: box when concrete, else the safe general path). Set via :func:`mic_mode`
#: by callers that know the cell family on the host BEFORE tracing — the
#: flag must then be part of their jit cache key (a static argument), since
#: it changes the traced program.
_MIC_TRICLINIC_OVERRIDE: Optional[bool] = None


def boxes_are_triclinic(box) -> bool:
    """Host check: do any cells in ``box`` (``(..., 3, 3)`` row-vectors,
    GROMACS reduced form) have significant off-diagonal components?

    The threshold is RELATIVE to the cell size: XTC stores boxes in f32 and
    orthorhombic cells routinely carry ~1e-7 off-diagonal noise (the 1am7
    fixture has -2.6e-7 on a 6.06 nm cell) — skew below 1e-5 of the
    diagonal is physically negligible and must not force the 27-image
    search."""
    b = np.asarray(box, np.float64)
    if b.size == 0:  # zero-frame trajectories carry an empty box stack
        return False
    off = b * (1.0 - np.eye(3))
    scale = np.max(np.abs(b)) or 1.0
    return bool(np.any(np.abs(off) > 1e-5 * scale))


class mic_mode:
    """Context manager pinning the MIC kernel at TRACE time.

    ``with mic_mode(triclinic=False):`` makes :func:`_mic_wrap` emit the
    cheap fractional-round wrap (exact for orthorhombic cells) instead of
    the 27-image search. Callers that trace under this context MUST key
    their jit cache on the flag (e.g. a static argument) — the featurizer
    block runner does (``loading/featurizer.py::make_feature_runner``).
    """

    def __init__(self, triclinic: bool) -> None:
        self.triclinic = bool(triclinic)

    def __enter__(self):
        global _MIC_TRICLINIC_OVERRIDE
        self._prev = _MIC_TRICLINIC_OVERRIDE
        _MIC_TRICLINIC_OVERRIDE = self.triclinic
        return self

    def __exit__(self, *exc):
        global _MIC_TRICLINIC_OVERRIDE
        _MIC_TRICLINIC_OVERRIDE = self._prev
        return False


def _mic_is_triclinic(box) -> bool:
    """Trace-time decision for the MIC kernel: the :func:`mic_mode`
    override wins; else a concrete (untraced) box is inspected on host;
    else the safe general (triclinic) path."""
    if _MIC_TRICLINIC_OVERRIDE is not None:
        return _MIC_TRICLINIC_OVERRIDE
    if not isinstance(box, jax.core.Tracer):
        return boxes_are_triclinic(box)
    return True


def _mic_ctx_for(box):
    """Pin the MIC kernel from a concrete whole-trajectory box.

    The compute_* entry points reach :func:`_mic_wrap` through
    ``jax.vmap``, where the per-frame box is ALWAYS a tracer — so without
    this, a direct call with an orthorhombic numpy box (outside the
    featurizer's explicit ``mic_mode`` block) would silently pay the ~30x
    27-image search. Here the full ``(F, 3, 3)`` box is still concrete and
    can be inspected on host once."""
    import contextlib

    if _MIC_TRICLINIC_OVERRIDE is None and not isinstance(
            box, jax.core.Tracer):
        return mic_mode(boxes_are_triclinic(box))
    return contextlib.nullcontext()


def _mic_wrap(vecs: Array, box: Array) -> Array:
    """Minimum-image wrap of displacement vectors.

    Args:
        vecs: ``(..., 3)`` displacements.
        box: ``(3, 3)`` cell row-vectors (GROMACS reduced triclinic form:
            lower-triangular rows).

    For orthorhombic cells the fractional round IS the minimum image — and
    the 27-candidate search below is pure overhead (~30x the wrap cost), so
    the kernel choice is made at trace time (:func:`_mic_is_triclinic`).
    For skewed cells (rhombic dodecahedron etc.) the rounded image can be
    beaten by a neighboring lattice combination, so all 27 candidates are
    searched like mdtraj's triclinic MIC kernel does.
    """
    # fractional coordinates; round to nearest lattice vector first
    inv = jnp.linalg.inv(box)
    frac = jnp.einsum("...i,ij->...j", vecs, inv, precision=_HI)
    frac = frac - jnp.round(frac)
    base = jnp.einsum("...i,ij->...j", frac, box, precision=_HI)
    if not _mic_is_triclinic(box):
        return base
    # neighbor-image search: candidate = base - shift @ box
    shift_vecs = jnp.einsum(
        "si,ij->sj", jnp.asarray(_NEIGHBOR_SHIFTS, base.dtype), box,
        precision=_HI,
    )  # (27, 3)
    cands = base[..., None, :] - shift_vecs  # (..., 27, 3)
    d2 = jnp.sum(jnp.square(cands), axis=-1)
    best = jnp.argmin(d2, axis=-1)
    return jnp.take_along_axis(
        cands, best[..., None, None], axis=-2
    )[..., 0, :]


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
        with _mic_ctx_for(box):
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
        with _mic_ctx_for(box):
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
        with _mic_ctx_for(box):
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
