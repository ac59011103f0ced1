# encodermap_tpu/misc/clustering.py
"""Cluster utilities: RMSD centroid, cluster dictionaries.

Mirrors ``/root/reference/encodermap/misc/clustering.py:93-160`` with the
pairwise-RMSD matrix computed on device (batched Kabsch via vmap) instead of
mdtraj's per-pair loop.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from ..ops.kabsch import kabsch_weighted

__all__ = ["pairwise_rmsd_matrix", "rmsd_centroid_of_cluster", "cluster_to_dict"]


def pairwise_rmsd_matrix(xyz: np.ndarray, max_frames: int = 500) -> np.ndarray:
    """All-pairs minimal RMSD of ``(n_frames, n_atoms, 3)`` coordinates."""
    xyz = np.asarray(xyz, np.float32)
    if len(xyz) > max_frames:
        idx = np.linspace(0, len(xyz) - 1, max_frames).astype(int)
        xyz = xyz[idx]
    return np.asarray(_rmsd_matrix_jit(jnp.asarray(xyz)))


@jax.jit
def _rmsd_matrix_jit(arr):
    # module-level jit: per-call closures would give jax.jit a fresh
    # function identity and recompile every invocation — each compile on
    # the remote-TPU axon platform is a minutes-long RPC
    def rmsd_one(a, b):
        return kabsch_weighted(a, b)[0]

    row = jax.vmap(rmsd_one, in_axes=(None, 0))
    return jax.vmap(row, in_axes=(0, None))(arr, arr)


def rmsd_centroid_of_cluster(
    xyz: np.ndarray, max_frames: int = 500
) -> tuple[int, np.ndarray]:
    """Frame index + pairwise-RMSD matrix of the cluster centroid: the frame
    with the largest similarity score ``exp(-beta * D / D.std())``
    (reference ``clustering.py:93-129``).

    The returned index always refers to the ORIGINAL ``xyz`` frames, even
    when the matrix was computed on a subsample (> ``max_frames``)."""
    xyz = np.asarray(xyz, np.float32)
    if len(xyz) > max_frames:
        subsample = np.linspace(0, len(xyz) - 1, max_frames).astype(int)
    else:
        subsample = np.arange(len(xyz))
    distances = pairwise_rmsd_matrix(xyz, max_frames)
    beta = 1.0
    std = distances.std()
    if std == 0.0:  # all-identical frames: any frame is the centroid
        return int(subsample[0]), distances
    local = int(np.exp(-beta * distances / std).sum(axis=1).argmax())
    return int(subsample[local]), distances


def cluster_to_dict(clusters: np.ndarray) -> dict[int, np.ndarray]:
    """Cluster-id -> frame-index arrays (noise label -1 excluded),
    reference ``clustering.py:130-160``."""
    clusters = np.asarray(clusters)
    out: dict[int, np.ndarray] = {}
    for cid in np.unique(clusters):
        if cid == -1:
            continue
        out[int(cid)] = np.where(clusters == cid)[0]
    return out
