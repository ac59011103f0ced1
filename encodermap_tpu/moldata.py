# encodermap_tpu/moldata.py
"""MolData back-compat shim (reference: ``/root/reference/encodermap/
moldata/moldata.py:72-192``): turns a trajectory into the 6 ADC CV arrays as
attributes, for code written against the EncoderMap 2.x MolData API."""

from __future__ import annotations

from typing import Any

import numpy as np

__all__ = ["MolData"]


class MolData:
    """Featurize a trajectory into the classic MolData attribute set:
    ``angles, dihedrals, cartesians, distances, sidedihedrals, central_cartesians``.
    """

    def __init__(self, trajs: Any, cache_path: str = "", top: Any = None) -> None:
        from .data.trajectory import SingleTraj, TrajEnsemble

        if isinstance(trajs, SingleTraj):
            trajs = TrajEnsemble([trajs])
        self.trajs = trajs
        # side_dihedrals must count as "needed" too: a chi-bearing traj
        # that arrives with only the four central CVs loaded would
        # otherwise silently get an (n, 0) sidedihedrals array (ADVICE r4).
        # But only when some topology CAN produce them — for chi-less
        # peptides (poly-ALA/GLY) the featurizer warn-skips the empty
        # feature, so requiring the CV would re-run a full load_CVs("all")
        # on EVERY MolData construction (review wave 22).
        needed = [
            "central_angles", "central_dihedrals", "central_cartesians",
            "central_distances",
        ]
        if any(
            len(t.top.indices_chi(n))
            for t in trajs.trajs for n in range(1, 6)
        ):
            needed.append("side_dihedrals")
        if not all(k in trajs.CVs for k in needed):
            trajs.load_CVs("all")
        cvs = trajs.CVs
        self.angles = np.asarray(cvs["central_angles"])
        self.dihedrals = np.asarray(cvs["central_dihedrals"])
        self.central_cartesians = np.asarray(cvs["central_cartesians"])
        # reference MolData.cartesians is the xyz of EVERY atom
        # (``moldata.py:88,170`` fills it from all_cartesians) — aliasing
        # the backbone-only array here would silently break atom-indexed
        # downstream code
        self.cartesians = np.concatenate(
            [np.asarray(t.xyz, np.float32) for t in trajs.trajs], axis=0
        )
        self.lengths = np.asarray(cvs["central_distances"])
        self.distances = self.lengths
        if "side_dihedrals" in cvs:
            self.sidedihedrals = np.asarray(cvs["side_dihedrals"])
        else:
            # chi-less peptides (e.g. poly-ALA/GLY) have no side
            # dihedrals; the featurizer warn-skips the empty feature, and
            # the reference TF1 MolData ends up with an empty array too
            self.sidedihedrals = np.zeros(
                (len(self.dihedrals), 0), np.float32
            )

    def __len__(self) -> int:
        return len(self.dihedrals)
