# encodermap_tpu/ops/backmap_sidechains.py
"""Backmapping WITH sidechains: internal coordinates -> xyz for backbone +
sidechain atoms.

Re-implements the reference's ``BackMapLayerWithSidechains``
(``/root/reference/encodermap/models/layers.py:219-902``):

1. **Placement** — backbone atoms along +x at cumulative central bond
   distances; each residue's sidechain atoms in a vertical column above its
   CA (y = cumulative sidechain bond distances).
2. **Angles** — every central angle is set by rotating all not-yet-fixed
   atoms about +z through the angle vertex by ``|target - current|``;
   sidechain angles rotate about -z.
3. **Dihedrals** — every dihedral (central first, then sidechain) is set by
   rotating the dynamic atom set about its b2 bond axis through atom b by
   ``target - current``.

The reference runs these as TensorArray Python loops re-stitching the atom
tensor every step; here each phase is ONE ``lax.scan`` over precomputed
static step tables (masks, index triplets/quadruplets, axis modes), with the
per-step update a masked batched rotation — vectorized over batch and atoms.

Step tables are built host-side by :class:`SidechainBackmapSpec` from the
``sidechain_info`` dict (residue -> number of sidechain dihedrals), exactly
the reference's ``feature_description[-1]`` contract.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["SidechainBackmapSpec", "backmap_sidechains"]

Array = jax.Array


class SidechainBackmapSpec(NamedTuple):
    """Static tables driving the three scan phases."""

    n_residues: int
    n_sidechain_atoms: int
    n_atoms: int
    #: (n_side_atoms,) which backbone CA x-position seeds each side atom
    side_seed_ca: np.ndarray
    #: (n_side_atoms,) first side-bond index of the atom's branch
    side_branch_start: np.ndarray
    #: (n_side_atoms,) the atom's bond index within side_distances
    side_bond_index: np.ndarray
    # --- angle phase: central then side, concatenated ---
    angle_triplets: np.ndarray  # (n_angles, 3)
    angle_static_masks: np.ndarray  # (n_angles, n_atoms) bool
    angle_z_dir: np.ndarray  # (n_angles,) +1 (central, +z) or -1 (side, -z)
    n_central_angles: int
    # --- dihedral phase: central then side ---
    dihedral_quadruplets: np.ndarray  # (n_dihedrals, 4)
    dihedral_static_masks: np.ndarray  # (n_dihedrals, n_atoms) bool
    n_central_dihedrals: int


def make_spec(sidechain_info: dict[int, int]) -> SidechainBackmapSpec:
    """Build the step tables from residue -> n_sidechain_dihedrals.

    Mirrors the reference's __init__ index construction
    (``layers.py:234-497``): per residue with v > 0 dihedrals there are
    v + 1 sidechain atoms and v + 1 sidechain bonds (CA->CB first).
    """
    residues = sorted(sidechain_info.keys())
    n_res = max(residues)
    assert residues == list(range(1, n_res + 1)), (
        "sidechain_info keys must be 1..n_residues"
    )
    v = np.array([sidechain_info[r] for r in range(1, n_res + 1)], np.int64)
    n_backbone = 3 * n_res
    side_atoms_per_res = np.where(v > 0, v + 1, 0)
    n_side = int(side_atoms_per_res.sum())
    n_atoms = n_backbone + n_side

    # ---------------- placement tables
    side_seed_ca = []
    side_branch_start = []
    side_bond_index = []
    # global side columns come residue-by-residue; atom j of a branch sits at
    # y = sum(side_distances[branch_start : branch_start + j + 1])
    bond = 0
    for r in range(1, n_res + 1):
        if v[r - 1] == 0:
            continue
        ca = (r - 1) * 3 + 1
        start = bond
        for k in range(int(v[r - 1]) + 1):
            side_seed_ca.append(ca)
            side_branch_start.append(start)
            side_bond_index.append(bond)
            bond += 1
    side_seed_ca = np.asarray(side_seed_ca, np.int64)
    side_branch_start = np.asarray(side_branch_start, np.int64)
    side_bond_index = np.asarray(side_bond_index, np.int64)

    # ---------------- static masks (reference's np.tri construction)
    # central distance rows: row i -> backbone atoms 0..i static, plus the
    # sidechain columns of residues already passed
    central_rows = np.tri(n_backbone - 1, n_backbone, k=0).astype(bool)
    right = np.zeros((n_backbone - 1, n_side), bool)
    # sidechain columns of residue r become static once the chain has moved
    # past r's CA (the reference flips them at the residue boundary)
    col = 0
    side_cols_of_res = {}
    for r in range(1, n_res + 1):
        if v[r - 1] == 0:
            continue
        side_cols_of_res[r] = np.arange(col, col + v[r - 1] + 1)
        col += v[r - 1] + 1
    # A residue's branch is rigidly attached to its CA: it is static for a
    # rotation exactly when its CA is in the static prefix. Row i has
    # backbone atoms 0..i static, so branch r (CA at index 3r-2) is static
    # iff i >= 3r - 2, i.e. residues 1..(i+2)//3 are static.
    for i in range(n_backbone - 1):
        passed = (i + 2) // 3
        for r in range(1, passed + 1):
            if r in side_cols_of_res:
                right[i, side_cols_of_res[r]] = True
    central_dist_masks = np.hstack([central_rows, right])

    # side rows: all backbone static + branch prefix static; OTHER branches
    # must be static too (block_diag runs over the +1 integer blocks so the
    # off-branch fill of 0 lands on the "even = static" side, exactly like
    # the reference's `(block_diag(...) % 2) == 0`).
    side_rows = []
    for r in range(1, n_res + 1):
        if v[r - 1] == 0:
            continue
        m = int(v[r - 1]) + 1
        side_rows.append((np.tri(m, m + 1, k=0) + 1)[:, 1:])
    if side_rows:
        from scipy.linalg import block_diag

        side_block = (block_diag(*side_rows) % 2) == 0
        side_dist_masks = np.hstack(
            [np.ones((len(side_block), n_backbone), bool), side_block]
        )
    else:
        side_dist_masks = np.zeros((0, n_atoms), bool)

    # ---------------- angle tables
    bb = np.arange(n_backbone)
    central_angle_triplets = np.stack([bb[:-2], bb[1:-1], bb[2:]], axis=1)
    central_angle_masks = central_dist_masks[1:]

    side_angle_triplets = []
    side_dihedral_quadruplets = []
    count2 = n_backbone + 1  # 1-past the first sidechain atom (ref counting)
    for r in range(1, n_res + 1):
        n_sc = int(v[r - 1])
        if n_sc == 0:
            continue
        for k in range(n_sc + 1):
            if k == 0:
                # N - CA - CB
                side_angle_triplets.append(
                    [(r - 1) * 3, (r - 1) * 3 + 1, count2 - 1]
                )
                # N - CA - CB - CG
                side_dihedral_quadruplets.append(
                    [(r - 1) * 3, (r - 1) * 3 + 1, count2 - 1, count2]
                )
            elif k == 1:
                # CA - CB - CG
                side_angle_triplets.append(
                    [(r - 1) * 3 + 1, count2 - 1, count2]
                )
                if k < n_sc:
                    side_dihedral_quadruplets.append(
                        [(r - 1) * 3 + 1, count2 - 1, count2, count2 + 1]
                    )
            else:
                side_angle_triplets.append(
                    [count2 + k - 3, count2 + k - 2, count2 + k - 1]
                )
                if k < n_sc:
                    side_dihedral_quadruplets.append(
                        [count2 + k - 3, count2 + k - 2, count2 + k - 1,
                         count2 + k]
                    )
        count2 += n_sc + 1
    side_angle_triplets = np.asarray(side_angle_triplets, np.int64).reshape(
        -1, 3
    )
    side_dihedral_quadruplets = np.asarray(
        side_dihedral_quadruplets, np.int64
    ).reshape(-1, 4)

    angle_triplets = np.vstack([central_angle_triplets, side_angle_triplets])
    angle_masks = np.vstack([central_angle_masks, side_dist_masks])
    angle_z_dir = np.concatenate(
        [
            np.ones(len(central_angle_triplets)),
            -np.ones(len(side_angle_triplets)),
        ]
    ).astype(np.float32)

    # ---------------- dihedral tables
    central_dihedral_quadruplets = np.stack(
        [bb[:-3], bb[1:-2], bb[2:-1], bb[3:]], axis=1
    )
    central_dihedral_masks = central_dist_masks[1:-1]
    # side dihedral rows: side_dist_masks rows of atoms that carry dihedrals
    side_cart_ind = []
    count = 0
    for r in range(1, n_res + 1):
        n_sc = int(v[r - 1])
        if n_sc == 0:
            continue
        side_cart_ind.append(np.arange(count, count + n_sc))
        count += n_sc + 1
    if side_cart_ind:
        side_cart_ind = np.concatenate(side_cart_ind)
        side_dih_masks = side_dist_masks[side_cart_ind]
    else:
        side_dih_masks = np.zeros((0, n_atoms), bool)

    dihedral_quadruplets = np.vstack(
        [central_dihedral_quadruplets, side_dihedral_quadruplets]
    )
    dihedral_masks = np.vstack([central_dihedral_masks, side_dih_masks])
    assert len(dihedral_quadruplets) == len(dihedral_masks)

    return SidechainBackmapSpec(
        n_residues=n_res,
        n_sidechain_atoms=n_side,
        n_atoms=n_atoms,
        side_seed_ca=side_seed_ca,
        side_branch_start=side_branch_start,
        side_bond_index=side_bond_index,
        angle_triplets=angle_triplets,
        angle_static_masks=angle_masks,
        angle_z_dir=angle_z_dir,
        n_central_angles=len(central_angle_triplets),
        dihedral_quadruplets=dihedral_quadruplets,
        dihedral_static_masks=dihedral_masks,
        n_central_dihedrals=len(central_dihedral_quadruplets),
    )


def _rot_about_axis_point(pos, axis_unit, point, angle, dyn_mask):
    """Rotate dynamic atoms about (axis through point) by angle.

    Standard right-handed Rodrigues rotation (the reference's homogeneous
    ``_rotation_matrices``, ``layers.py:860-902``), applied as
    ``p' = R (p - point) + point`` to atoms where ``dyn_mask``.
    """
    c = jnp.cos(angle)[:, None]
    s = jnp.sin(angle)[:, None]
    u = axis_unit  # (batch, 3)
    rel = pos - point[:, None, :]
    # Rodrigues: v' = v c + (u x v) s + u (u.v)(1-c)
    cross = jnp.cross(u[:, None, :], rel)
    dot = jnp.sum(u[:, None, :] * rel, axis=-1, keepdims=True)
    rotated = (
        rel * c[..., None]
        + cross * s[..., None]
        + u[:, None, :] * dot * (1.0 - c)[..., None]
    )
    new = rotated + point[:, None, :]
    return jnp.where(dyn_mask[None, :, None], new, pos)


def _current_angle(pos, triplet):
    a = pos[:, triplet[0]]
    b = pos[:, triplet[1]]
    c = pos[:, triplet[2]]
    ba = a - b
    bc = c - b
    dot = jnp.sum(ba * bc, axis=-1)
    prod = jnp.linalg.norm(ba, axis=-1) * jnp.linalg.norm(bc, axis=-1)
    # strictly inside (-1, 1): at the initial colinear placement cos is
    # exactly -1 and d(arccos)/dx diverges, NaN-ing every gradient
    return jnp.arccos(jnp.clip(dot / prod, -1.0 + 1e-7, 1.0 - 1e-7))


def _current_dihedral(pos, quad):
    a = pos[:, quad[0]]
    b = pos[:, quad[1]]
    c = pos[:, quad[2]]
    d = pos[:, quad[3]]
    b1 = b - a
    b2 = c - b
    b3 = d - c
    c1 = jnp.cross(b2, b3)
    c2 = jnp.cross(b1, b2)
    p1 = jnp.sum(b1 * c1, axis=-1) * jnp.linalg.norm(b2, axis=-1)
    p2 = jnp.sum(c1 * c2, axis=-1)
    return jnp.arctan2(p1, p2)


def backmap_sidechains(
    spec: SidechainBackmapSpec,
    central_distances: Array,
    central_angles: Array,
    central_dihedrals: Array,
    side_distances: Array,
    side_angles: Array,
    side_dihedrals: Array,
) -> Array:
    """Full sidechain-aware backmapping.

    Args:
        spec: static tables from :func:`make_spec`.
        central_distances: ``(B, 3R - 1)``.
        central_angles: ``(B, 3R - 2)``.
        central_dihedrals: ``(B, 3R - 3)``.
        side_distances: ``(B, n_side_atoms)`` (one bond per side atom).
        side_angles: ``(B, n_side_atoms)``.
        side_dihedrals: ``(B, sum sidechain dihedrals)``.

    Returns:
        ``(B, n_atoms, 3)`` with backbone atoms first, then sidechain atoms
        grouped per residue — the reference's atom order.
    """
    B = central_distances.shape[0]
    dtype = central_distances.dtype

    # -------- phase 1: placement
    xs_bb = jnp.concatenate(
        [jnp.zeros((B, 1), dtype), jnp.cumsum(central_distances, axis=1)],
        axis=1,
    )
    # per-branch cumulative sums of side bond lengths
    side_cum = jnp.cumsum(side_distances, axis=1)
    start = spec.side_branch_start
    bond_i = spec.side_bond_index
    branch_cum = side_cum[:, bond_i] - jnp.where(
        start > 0, side_cum[:, start - 1], jnp.zeros((B, 1), dtype)[:, 0:1] * 0
    )
    # careful with start == 0 (gather of -1): mask instead
    prev = jnp.where(
        (start - 1)[None, :] >= 0,
        side_cum[:, jnp.maximum(start - 1, 0)],
        0.0,
    )
    branch_cum = side_cum[:, bond_i] - prev

    xs_side = xs_bb[:, spec.side_seed_ca]
    ys_side = branch_cum
    xs = jnp.concatenate([xs_bb, xs_side], axis=1)
    ys = jnp.concatenate([jnp.zeros_like(xs_bb), ys_side], axis=1)
    pos = jnp.stack([xs, ys, jnp.zeros_like(xs)], axis=-1)

    # -------- phase 2: angles (central then side), rotation about +/- z
    angle_targets = jnp.concatenate([central_angles, side_angles], axis=1)
    triplets = jnp.asarray(spec.angle_triplets)
    masks = jnp.asarray(spec.angle_static_masks)
    zdirs = jnp.asarray(spec.angle_z_dir, dtype)

    def angle_step(p, inp):
        triplet, static_mask, zdir, target = inp
        current = _current_angle(p, triplet)
        delta = jnp.abs(target - current)
        axis = jnp.concatenate(
            [jnp.zeros((B, 2), dtype), jnp.full((B, 1), 1.0, dtype) * zdir],
            axis=1,
        )
        point = p[:, triplet[1]]
        return _rot_about_axis_point(p, axis, point, delta, ~static_mask), None

    pos, _ = jax.lax.scan(
        angle_step, pos, (triplets, masks, zdirs, angle_targets.T)
    )

    # -------- phase 3: dihedrals (central then side), rotation about b2
    dihedral_targets = jnp.concatenate(
        [central_dihedrals, side_dihedrals], axis=1
    )
    quads = jnp.asarray(spec.dihedral_quadruplets)
    dmasks = jnp.asarray(spec.dihedral_static_masks)

    def dihedral_step(p, inp):
        quad, static_mask, target = inp
        current = _current_dihedral(p, quad)
        delta = target - current
        axis = p[:, quad[2]] - p[:, quad[1]]
        axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
        point = p[:, quad[1]]
        return _rot_about_axis_point(p, axis, point, delta, ~static_mask), None

    pos, _ = jax.lax.scan(
        dihedral_step, pos, (quads, dmasks, dihedral_targets.T)
    )
    return pos
