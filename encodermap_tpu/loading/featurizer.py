# encodermap_tpu/loading/featurizer.py
"""Featurizers: batch feature computation over trajectories.

Re-designs the reference's featurizer stack
(``/root/reference/encodermap/loading/featurizer.py:450-2068``):

* ``SingleTrajFeaturizer`` — collect features, execute them over one traj.
* ``EnsembleFeaturizer`` — per-topology featurization + NaN-padded alignment
  onto the union of *generic* labels (``format_output``,
  ``featurizer.py:1984-2068``), driving the sparse/masked training path.
* ``Featurizer`` — dispatch constructor like the reference's ``__new__``
  (``featurizer.py:1415-1447``).

Execution model (replaces the dask graph of ``DaskFeaturizer``): frames are
processed in device-sized blocks with one jitted program per (feature-set,
topology); see ``parallel/sharded_featurize.py`` for the multi-device path.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..data.cvstore import CVCollection
from . import features as F

__all__ = ["Featurizer", "SingleTrajFeaturizer", "EnsembleFeaturizer"]

#: features loaded by add_list_of_feats("all") — the ADC set, like the
#: reference's 'all' shortcut
ALL_FEATS = (
    "central_angles",
    "central_dihedrals",
    "central_cartesians",
    "central_distances",
    "side_dihedrals",
)
FULL_FEATS = ALL_FEATS + (
    "all_cartesians",
    "all_distances",
    "side_cartesians",
    "side_distances",
    "side_angles",
)


class SingleTrajFeaturizer:
    """Collects Feature objects for one trajectory and executes them."""

    def __init__(self, traj: Any, block_size: int = 4096) -> None:
        self.traj = traj
        self.block_size = block_size
        self.features: list[F.Feature] = []

    # ------------------------------------------------------------------ adders
    def add_list_of_feats(
        self, which: Union[str, Sequence[str]] = "all",
        ensemble: bool = False, periodic: bool = True,
    ) -> None:
        if which == "all":
            which = ALL_FEATS
        elif which == "full":
            which = FULL_FEATS
        for name in which:
            cls = F.ADC_FEATURES.get(name)
            if cls is None:
                raise ValueError(
                    f"unknown feature shortcut {name!r}; known: "
                    f"{sorted(F.ADC_FEATURES)}"
                )
            self.features.append(
                cls(self.traj.top, generic_labels=ensemble, periodic=periodic)
            )

    def add_custom_feature(self, feature: F.Feature) -> None:
        self.features.append(feature)

    def add_distances(self, pairs, periodic: bool = True) -> None:
        self.features.append(F.DistanceFeature(self.traj.top, pairs, periodic))

    def add_inverse_distances(self, pairs, periodic: bool = True) -> None:
        self.features.append(
            F.InverseDistanceFeature(self.traj.top, pairs, periodic)
        )

    def add_contacts(self, pairs, threshold: float = 0.45,
                     periodic: bool = True) -> None:
        self.features.append(
            F.ContactFeature(self.traj.top, pairs, threshold, periodic)
        )

    def add_angles(self, indexes, deg: bool = False, cossin: bool = False,
                   periodic: bool = True) -> None:
        self.features.append(
            F.AngleFeature(self.traj.top, indexes, deg, cossin, periodic)
        )

    def add_dihedrals(self, indexes, deg: bool = False, cossin: bool = False,
                      periodic: bool = True) -> None:
        self.features.append(
            F.DihedralFeature(self.traj.top, indexes, deg, cossin, periodic)
        )

    def add_backbone_torsions(self, deg: bool = False, cossin: bool = False,
                              periodic: bool = True) -> None:
        self.features.append(
            F.BackboneTorsionFeature(self.traj.top, deg, cossin, periodic)
        )

    def add_sidechain_torsions(self, deg: bool = False, cossin: bool = False,
                               periodic: bool = True, which: str = "all") -> None:
        self.features.append(
            F.SideChainTorsions(self.traj.top, deg, cossin, periodic, which)
        )

    def add_selection(self, indexes) -> None:
        self.features.append(F.SelectionFeature(self.traj.top, indexes))

    def add_residue_mindist(self, residue_pairs, scheme: str = "closest-heavy",
                            threshold: Optional[float] = None,
                            periodic: bool = True) -> None:
        self.features.append(
            F.ResidueMinDistanceFeature(
                self.traj.top, residue_pairs, scheme, threshold, periodic
            )
        )

    def add_group_COM(self, group_definitions, mass_weighted: bool = True) -> None:
        self.features.append(
            F.GroupCOMFeature(self.traj.top, group_definitions, mass_weighted)
        )

    def add_residue_COM(self, residue_indices, scheme: str = "all",
                        mass_weighted: bool = True) -> None:
        self.features.append(
            F.ResidueCOMFeature(self.traj.top, residue_indices, scheme,
                                mass_weighted)
        )

    def add_minrmsd_to_ref(self, ref_xyz, atom_indices=None) -> None:
        self.features.append(
            F.MinRmsdFeature(self.traj.top, ref_xyz, atom_indices)
        )

    def add_align(self, ref_xyz, indexes, atom_indices=None) -> None:
        self.features.append(
            F.AlignFeature(self.traj.top, ref_xyz, indexes, atom_indices)
        )

    @property
    def dimension(self) -> int:
        return sum(f.dimension for f in self.features)

    # ------------------------------------------------------------------ execute
    def get_output(self, ensemble: bool = False) -> CVCollection:
        """Execute all features over the trajectory in device-sized blocks."""
        traj = self.traj
        xyz = np.asarray(traj.xyz, np.float32)
        box = traj.unitcell_vectors
        out = CVCollection()

        feats = self.features

        def run_block(xyz_block, box_block):
            results = []
            for f in feats:
                results.append(f.transform(xyz_block, box_block))
            return results

        run = jax.jit(run_block) if box is None else jax.jit(run_block)
        blocks: list[list[np.ndarray]] = [[] for _ in feats]
        for i in range(0, len(xyz), self.block_size):
            xb = jnp.asarray(xyz[i : i + self.block_size])
            bb = (
                jnp.asarray(box[i : i + self.block_size])
                if box is not None
                else None
            )
            res = run(xb, bb)
            for j, r in enumerate(res):
                blocks[j].append(np.asarray(r))

        for f, parts in zip(feats, blocks):
            data = np.concatenate(parts, axis=0) if parts else np.zeros((0, 0))
            name = _cv_name(f)
            labels = f.generic_describe() if ensemble else f.describe()
            out.add(name, data, labels, f.indices)
        return out


#: Feature class -> CV name used in trajectory CV stores
_CV_NAMES = {
    "CentralAngles": "central_angles",
    "CentralDihedrals": "central_dihedrals",
    "CentralCartesians": "central_cartesians",
    "CentralBondDistances": "central_distances",
    "SideChainDihedrals": "side_dihedrals",
    "AllCartesians": "all_cartesians",
    "AllBondDistances": "all_distances",
    "SideChainCartesians": "side_cartesians",
    "SideChainBondDistances": "side_distances",
    "SideChainAngles": "side_angles",
}


def _cv_name(f: F.Feature) -> str:
    return _CV_NAMES.get(type(f).__name__, type(f).__name__)


class EnsembleFeaturizer:
    """Featurize a TrajEnsemble, NaN-pad-aligning across topologies.

    Alignment uses the union of *generic* labels per CV, with values from
    each topology scattered into their label's column and NaN elsewhere
    (the masked-dense equivalent of the reference's sparse path,
    ``featurizer.py:1984-2068``)."""

    def __init__(self, trajs: Any, block_size: int = 4096) -> None:
        self.trajs = trajs
        self.block_size = block_size
        self._which: list[Union[str, Sequence[str]]] = []

    def add_list_of_feats(self, which="all") -> None:
        self._which.append(which)

    def apply(self, ensemble: bool = False) -> None:
        per_traj: list[CVCollection] = []
        for traj in self.trajs:
            feat = SingleTrajFeaturizer(traj, self.block_size)
            for w in self._which:
                feat.add_list_of_feats(w, ensemble=ensemble)
            per_traj.append(feat.get_output(ensemble=ensemble))

        if not ensemble:
            for traj, cvs in zip(self.trajs, per_traj):
                for k in cvs:
                    e = cvs.entry(k)
                    traj._CVs.add(k, e.data, e.labels, e.indices)
            return

        # optional ClustalW relabeling: residue numbers -> alignment columns
        for traj, cvs in zip(self.trajs, per_traj):
            res_map = getattr(traj, "clustal_w", None)
            if res_map is None:
                continue
            from .alignment import apply_alignment_to_labels

            for name in ("central_dihedrals", "side_dihedrals",
                         "side_angles", "side_distances"):
                if name in cvs:
                    e = cvs.entry(name)
                    e.labels = apply_alignment_to_labels(e.labels or [],
                                                         res_map)

        # union-of-generic-labels alignment with NaN fill
        names = list(per_traj[0].keys())
        for name in names:
            all_labels: list[str] = []
            for cvs in per_traj:
                for lbl in cvs.entry(name).labels or []:
                    if lbl not in all_labels:
                        all_labels.append(lbl)
            all_labels = _sorted_labels(name, all_labels)
            index = {lbl: i for i, lbl in enumerate(all_labels)}
            for traj, cvs in zip(self.trajs, per_traj):
                e = cvs.entry(name)
                if e.data.ndim == 3:  # cartesians: (frames, atoms, 3)
                    width = len(all_labels) // 3
                    padded = np.full(
                        (len(e.data), width, 3), np.nan, np.float32
                    )
                    cols = [
                        index[lbl] // 3 for lbl in (e.labels or [])[::3]
                    ]
                    padded[:, cols] = e.data
                else:
                    padded = np.full(
                        (len(e.data), len(all_labels)), np.nan, np.float32
                    )
                    cols = [index[lbl] for lbl in (e.labels or [])]
                    padded[:, cols] = e.data
                traj._CVs.add(name, padded, all_labels, e.indices)


def _sorted_labels(name: str, labels: list[str]) -> list[str]:
    """Deterministic label order for aligned ensembles: side dihedrals by
    (resid, chi), central dihedrals by (resid, PSI<OMEGA<PHI) — the
    reference's special sort orders (``featurizer.py:1984-2068``)."""
    if name == "side_dihedrals":
        def key(lbl):
            parts = lbl.split()
            return (int(parts[-1]), parts[1])
        return sorted(labels, key=key)
    if name == "central_dihedrals":
        order = {"PSI": 0, "OMEGA": 1, "PHI": 2}
        def key(lbl):
            parts = lbl.split()
            return (int(parts[-1]), order.get(parts[1], 3))
        return sorted(labels, key=key)
    return labels


class Featurizer:
    """Dispatch constructor mirroring the reference
    (``featurizer.py:1415-1447``): SingleTraj -> SingleTrajFeaturizer,
    TrajEnsemble -> EnsembleFeaturizer."""

    def __new__(cls, traj: Any, **kwargs: Any):
        from ..data.trajectory import SingleTraj, TrajEnsemble

        if isinstance(traj, TrajEnsemble):
            return EnsembleFeaturizer(traj, **kwargs)
        if isinstance(traj, SingleTraj):
            return SingleTrajFeaturizer(traj, **kwargs)
        raise TypeError(f"cannot featurize {type(traj)}")
