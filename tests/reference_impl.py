# tests/reference_impl.py
"""Independent NumPy oracles reproducing the reference's semantics.

These re-derive (in plain sequential NumPy, from the documented behavior of
``/root/reference/encodermap``) the math the TPU kernels must match:

* scipy-style pairwise distances with the reference's epsilon guards
* the sketch-map sigmoid
* sequential ``chain_in_plane`` (``encodermap_tf1/backmapping.py:97``)
* the sequential dihedral rotation loop (``misc/backmapping.py:1873``)
* the split/reverse both-ways composition (``misc/backmapping.py:259``)
* the full BackMapLayer pipeline (``models/layers.py:957-987``)

Everything runs in float64 so the oracles are effectively exact.
"""

from __future__ import annotations

import numpy as np

PI = np.pi


def sigmoid_np(r, sig, a, b):
    return 1 - (1 + (2 ** (a / b) - 1) * (r / sig) ** a) ** (-b / a)


def periodic_distance_np(a, b, periodicity=2 * PI):
    d = np.abs(b - a)
    if periodicity == float("inf"):
        return d
    return np.minimum(d, periodicity - d)


def pairwise_dist_np(positions):
    """Plain Euclidean cdist (hollow, symmetric)."""
    diff = positions[:, None, :] - positions[None, :, :]
    return np.sqrt(np.sum(diff**2, axis=-1))


def pairwise_dist_periodic_np(positions, periodicity):
    vecs = periodic_distance_np(
        positions[:, None, :], positions[None, :, :], periodicity
    )
    mask = vecs == 0.0
    vecs = vecs + mask * 1e-12
    return np.sqrt(np.sum(vecs**2, axis=2)) + 1e-12


def chain_in_plane_np(lengths, angles):
    """Sequential heading-angle recurrence (the reference's loop)."""
    lengths = np.asarray(lengths, np.float64)
    angles = np.asarray(angles, np.float64)
    if lengths.shape[0] == 1 and angles.shape[0] > 1:
        lengths = np.broadcast_to(lengths, (angles.shape[0], lengths.shape[1]))
    B = angles.shape[0]
    prev = np.zeros(B)
    xs = [np.zeros(B)]
    ys = [np.zeros(B)]
    sign = 1
    n_ang = angles.shape[1]
    for i in range(n_ang):
        xs.append(xs[-1] + lengths[:, i] * np.cos(prev))
        ys.append(ys[-1] + lengths[:, i] * np.sin(prev) * sign)
        prev = PI - angles[:, i] - prev
        sign *= -1
    xs.append(xs[-1] + lengths[:, n_ang] * np.cos(prev))
    ys.append(ys[-1] + lengths[:, n_ang] * np.sin(prev) * sign)
    xs = np.stack(xs, 1)
    ys = np.stack(ys, 1)
    return np.stack([xs, ys, np.zeros_like(xs)], 2)


def rotation_matrix_np(axis, angle):
    """Row-vector convention (x @ R), same layout as the reference."""
    x, y, z = axis
    K = np.array([[0, -z, y], [z, 0, -x], [-y, x, 0]])
    return (
        np.cos(angle) * np.eye(3)
        + np.sin(angle) * K
        + (1 - np.cos(angle)) * np.outer(axis, axis)
    )


def dihedral_one_way_np(dihedrals, cart):
    """Sequential tail-rotation loop."""
    dihedrals = np.asarray(dihedrals, np.float64)
    cart = np.asarray(cart, np.float64)
    d = -dihedrals
    B, n = d.shape
    out = []
    for b in range(B):
        rotated = cart[b, 1:].copy()
        coll = [cart[b, :1]]
        for i in range(n):
            coll.append(rotated[0:1])
            axis = rotated[1] - rotated[0]
            axis = axis / np.sqrt((axis**2).sum())
            offset = rotated[1:2]
            rotated = offset + (rotated[1:] - offset) @ rotation_matrix_np(
                axis, d[b, i]
            )
        coll.append(rotated)
        out.append(np.concatenate(coll, 0))
    return np.stack(out)


def split_and_reverse_dihedrals_np(x):
    n = x.shape[1]
    m = n // 2
    if n % 2 == 0:
        return x[:, m - 1 :: -1], x[:, m:]
    return x[:, m::-1], x[:, m + 1 :]


def split_and_reverse_cartesians_np(x):
    s = x.shape[1] // 2
    return x[:, s + 1 :: -1], x[:, s - 1 :]


def dihedrals_to_cartesian_np(dihedrals, cart):
    cl, cr = split_and_reverse_cartesians_np(cart)
    dl, dr = split_and_reverse_dihedrals_np(dihedrals)
    nl = dihedral_one_way_np(dl, cl)
    nr = dihedral_one_way_np(dr, cr)
    return np.concatenate([nl[:, ::-1], nr[:, 3:]], 1)


def backmap_np(distances, angles, dihedrals):
    """The BackMapLayer pipeline: batch-mean lengths (of the RAW
    distances, like the reference — its negative-distance guard is dead
    code, ``models/layers.py:964-971``) -> chain_in_plane -> +pi ->
    both-ways rotation."""
    distances = np.asarray(distances, np.float64)
    mean_lengths = distances.mean(axis=0, keepdims=True)
    chain = chain_in_plane_np(mean_lengths, angles)
    return dihedrals_to_cartesian_np(np.asarray(dihedrals, np.float64) + PI, chain)


def dihedral_from_xyz_np(p0, p1, p2, p3):
    """Standard IUPAC dihedral from four points (praxeolitic formula)."""
    b0 = p0 - p1
    b1 = p2 - p1
    b2 = p3 - p2
    b1 = b1 / np.linalg.norm(b1, axis=-1, keepdims=True)
    v = b0 - np.sum(b0 * b1, -1, keepdims=True) * b1
    w = b2 - np.sum(b2 * b1, -1, keepdims=True) * b1
    x = np.sum(v * w, -1)
    y = np.sum(np.cross(b1, v) * w, -1)
    return np.arctan2(y, x)


def angle_from_xyz_np(p0, p1, p2):
    u = p0 - p1
    v = p2 - p1
    cosang = np.sum(u * v, -1) / (
        np.linalg.norm(u, axis=-1) * np.linalg.norm(v, axis=-1)
    )
    return np.arccos(np.clip(cosang, -1, 1))
