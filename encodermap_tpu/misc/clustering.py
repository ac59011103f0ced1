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


def cluster_to_dict(
    trajs,
    align_string: str = "name CA",
    ref_align_string: str = "name CA",
    base_traj=None,
):
    """Joined/stacked views of a cluster sub-ensemble — the reference's
    contract (``clustering.py:130-292``): pass the ``TrajEnsemble`` that
    ``trajs.cluster(cluster_id)`` returns and get a dict with

    * ``"ensemble"`` — the input ensemble,
    * ``"series"`` — the per-frame membership values of the cluster CV,
    * ``"joined_per_top"`` — topology -> superposed frames joined along
      time (one trajectory per distinct topology),
    * ``"joined"`` — all frames as one trajectory (only when every member
      has the same atom count, like the reference), and
    * ``"stacked"`` — every frame stacked along the ATOM axis into one
      single-frame trajectory (the overlay view).

    Trajectories are this package's ``SingleTraj`` (the reference returns
    mdtraj objects — documented divergence). A plain integer membership
    array is also accepted and returns the legacy
    ``{cluster_id: frame_indices}`` mapping of earlier releases.
    """
    if not hasattr(trajs, "trajs"):
        clusters = np.asarray(trajs)
        if clusters.dtype.kind not in "iu":
            raise TypeError(
                "cluster_to_dict takes the TrajEnsemble from "
                "trajs.cluster(...) (reference contract) or an integer "
                f"membership array; got {type(trajs).__name__} of dtype "
                f"{clusters.dtype}"
            )
        out: dict[int, np.ndarray] = {}
        for cid in np.unique(clusters):
            if cid == -1:
                continue
            out[int(cid)] = np.where(clusters == cid)[0]
        return out

    # locate the membership CV: integer-valued with ONE unique id
    # (reference clustering.py:180-211)
    col = None
    cvs = trajs.CVs
    for name, values in cvs.items():
        x = np.asarray(values, np.float64).ravel()
        x = x[~np.isnan(x)]
        if x.size and np.all(np.mod(x, 1) == 0) and len(np.unique(x)) == 1:
            col = name
            break
    if col is None:
        raise Exception(
            "Could not find a CV with a single integer cluster id. Make "
            "sure to pass the sub-ensemble from trajs.cluster(cluster_id)."
        )
    series = np.concatenate(
        [np.asarray(t._CVs.entry(col).data).ravel() for t in trajs.trajs]
    )

    from ..data.trajectory import TrajEnsemble

    groups: dict = {}
    all_sup = []
    for t in trajs.trajs:
        grp = groups.get(t.top)
        ref = grp[0].get_single_frame(0) if grp else t.get_single_frame(0)
        sup = t.superpose(
            ref, frame=0,
            atom_indices=t.top.select(align_string),
            ref_atom_indices=ref.top.select(ref_align_string),
        )
        groups.setdefault(t.top, []).append(sup)
        all_sup.append(sup)
    # ONE-SHOT ensemble helpers, not pairwise join()/stack(): each
    # pairwise call rebuilt a merged ensemble and re-copied every
    # accumulated frame — O(n^2) host time and peak memory on big
    # clusters (wave 32)
    joined_per_top = {
        top: (lst[0] if len(lst) == 1 else TrajEnsemble(lst).traj_joined)
        for top, lst in groups.items()
    }

    out = {
        "ensemble": trajs,
        "series": series,
        "joined_per_top": joined_per_top,
    }
    if all(t.n_atoms == trajs.trajs[0].n_atoms for t in trajs.trajs):
        joined = (all_sup[0] if len(all_sup) == 1
                  else TrajEnsemble(all_sup).traj_joined)
        if base_traj is not None:
            # reference contract (clustering.py:245-275): the cluster's
            # coordinates are applied onto the PARENT trajectory's
            # topology (e.g. the full-detail parent of stripped members)
            if base_traj.n_atoms != joined.n_atoms:
                raise ValueError(
                    f"base_traj has {base_traj.n_atoms} atoms but the "
                    f"cluster frames have {joined.n_atoms}; coordinates "
                    f"cannot be applied"
                )
            from ..data.cvstore import CVCollection

            host = base_traj._shallow_copy()
            host._CVs = CVCollection()
            host._xyz = joined.xyz
            host._time = joined.time
            host._unitcell = None
            host._materialized = True
            host._n_frames_file = len(joined.xyz)
            host.index = None
            joined = host
        out["joined"] = joined
        # stacked: one frame whose atoms are every frame's atoms
        frames = [
            s.get_single_frame(i) for s in all_sup for i in range(s.n_frames)
        ]
        stacked = (frames[0] if len(frames) == 1
                   else TrajEnsemble(frames).stack())
        out["stacked"] = stacked
    return out
