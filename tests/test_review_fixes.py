# tests/test_review_fixes.py
"""Regression tests for the round-3 data-layer review findings: boxes
surviving load/save paths, chi-variant residue names, per-topology protein
scoping, sequence-gap torsions, CV-order-consistent offline backmapping,
and h5 frame resampling."""

from pathlib import Path

import numpy as np
import pytest

DATA = Path("/root/reference/tests/data")

needs_data = pytest.mark.skipif(not DATA.exists(),
                                reason="reference test data not mounted")


def _mini_top(residues):
    """Build a small topology: residues = [(name, resSeq, chain,
    [atom names])]."""
    from encodermap_tpu.data.topology import Topology

    top = Topology()
    for name, resSeq, chain, atoms in residues:
        r = top.add_residue(name, resSeq, chain)
        for a in atoms:
            top.add_atom(a, a[0], r)
    return top


BB = ["N", "CA", "C", "O"]


class TestBoxPreservation:
    @needs_data
    def test_pdb_cryst1_box_loaded(self):
        import encodermap_tpu as em

        t = em.load(str(DATA / "1UBQ.pdb"))
        box = t.unitcell_vectors
        assert box is not None
        # CRYST1   50.840   42.770   28.950 (Angstrom) -> nm diagonals
        np.testing.assert_allclose(
            np.diagonal(box[0]), [5.084, 4.277, 2.895], atol=1e-3
        )

    @needs_data
    def test_ensemble_h5_roundtrip_preserves_box(self, tmp_path):
        import encodermap_tpu as em
        from encodermap_tpu.data.trajectory import TrajEnsemble

        t = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))
        trajs = em.TrajEnsemble([t])
        assert t.unitcell_vectors is not None  # XTC carries a box
        path = tmp_path / "e.h5"
        trajs.save(path)
        back = TrajEnsemble.from_dataset(path)
        np.testing.assert_allclose(
            back.trajs[0].unitcell_vectors, t.unitcell_vectors, atol=1e-6
        )

    @needs_data
    def test_h5_duplicate_frame_selection(self, tmp_path):
        """Bootstrap-style repeated frame selection must work on the h5
        path (h5py rejects duplicate fancy indices natively)."""
        import encodermap_tpu as em

        t = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))
        path = tmp_path / "d.h5"
        t.save(path)
        t2 = em.load(str(path))
        sel = t2[np.array([3, 3, 7, 1, 3])]
        xyz = sel.xyz
        assert xyz.shape[0] == 5
        np.testing.assert_array_equal(xyz[0], xyz[1])
        np.testing.assert_array_equal(xyz[0], xyz[4])
        np.testing.assert_array_equal(xyz[0], t2[3].xyz[0])


class TestChiVariants:
    def test_hsd_histidine_gets_chis_everywhere(self):
        """CHARMM-named HSD histidine must appear in indices_chi,
        SideChainDihedrals, and sidechain_info alike."""
        from encodermap_tpu.loading.features import SideChainDihedrals

        top = _mini_top([
            ("HSD", 1, 0, BB + ["CB", "CG", "ND1", "CD2", "CE1", "NE2"]),
            ("ALA", 2, 0, BB + ["CB"]),
        ])
        assert len(top.indices_chi(1)) == 1
        assert len(top.indices_chi(2)) == 1
        f = SideChainDihedrals(top)
        assert len(f._indices) == 2  # chi1 + chi2 of the HSD
        assert top.sidechain_info() == {1: 2, 2: 0}

    def test_patched_topology_keeps_variant_chis(self):
        """Applying a CustomTopology (even an unrelated one) must not drop
        HSD/HID chi dihedrals."""
        from encodermap_tpu.data.custom_topology import CustomTopology

        top = _mini_top([
            ("HID", 1, 0, BB + ["CB", "CG", "ND1", "CD2", "CE1", "NE2"]),
        ])
        before = top.indices_chi(1)
        assert len(before) == 1
        patched = CustomTopology(top).apply()
        np.testing.assert_array_equal(patched.indices_chi(1), before)

    def test_custom_protein_names_do_not_leak_globally(self):
        """CustomTopology protein-name declarations are scoped to the
        patched topology, never the module-global residue set."""
        from encodermap_tpu.data.custom_topology import CustomTopology
        from encodermap_tpu.data.topology import _PROTEIN_RESIDUES

        top = _mini_top([("LIG", 1, 0, BB + ["CB"])])
        ct = CustomTopology(top)
        ct._protein_names = {"LIG"}
        patched = ct.apply()
        assert patched.residues[0].is_protein
        assert "LIG" not in _PROTEIN_RESIDUES
        # an unrelated topology with the same residue name stays non-protein
        other = _mini_top([("LIG", 1, 0, BB + ["CB"])])
        assert not other.residues[0].is_protein


class TestSequenceGaps:
    def test_phi_psi_omega_skip_unresolved_loop(self):
        """A crystal structure's resSeq jump (unresolved loop) must not
        produce torsions spanning the gap."""
        top = _mini_top([
            ("ALA", 40, 0, BB), ("GLY", 41, 0, BB),
            ("SER", 48, 0, BB), ("VAL", 49, 0, BB),
        ])
        # pairs (40,41) and (48,49) only — never (41,48)
        assert len(top.indices_phi) == 2
        assert len(top.indices_psi) == 2
        assert len(top.indices_omega) == 2
        # insertion codes (same resSeq twice) still pair
        top2 = _mini_top([
            ("ALA", 27, 0, BB), ("GLY", 27, 0, BB), ("SER", 28, 0, BB),
        ])
        assert len(top2.indices_psi) == 2


class TestFeatureArgGuards:
    def test_deg_plus_cossin_rejected(self):
        from encodermap_tpu.loading.features import (
            AngleFeature,
            DihedralFeature,
        )

        top = _mini_top([("ALA", 1, 0, BB + ["CB"])])
        with pytest.raises(ValueError, match="cossin"):
            AngleFeature(top, [[0, 1, 2]], deg=True, cossin=True)
        with pytest.raises(ValueError, match="cossin"):
            DihedralFeature(top, [[0, 1, 2, 3]], deg=True, cossin=True)


class TestOfflineBackmapSideOrder:
    @needs_data
    def test_default_side_indices_match_cv_order(self):
        """backmap_topology's default sidechain quadruplets must follow the
        side_dihedrals CV's residue-major (residue, chi1..chiN) order —
        a chi-major layout has the same row count but rotates values onto
        the wrong bonds."""
        import encodermap_tpu as em
        from encodermap_tpu.loading.features import SideChainDihedrals

        t = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))
        top = t.top
        cv_order = SideChainDihedrals(top)._indices
        # asp7: 7 x ASP with chi1+chi2 -> residue-major alternates chis
        assert len(cv_order) == 14
        chi_major = np.vstack([top.indices_chi(1), top.indices_chi(2)])
        assert not np.array_equal(cv_order, chi_major)
        # the documented drop-in use must reconstruct chi values in CV
        # order: backmap with the CV, then re-measure the chis
        from encodermap_tpu.misc.backmapping_offline import backmap_topology
        from encodermap_tpu.ops.geometry import compute_dihedrals

        import jax.numpy as jnp

        t.load_CV("side_dihedrals")
        target = np.asarray(t.side_dihedrals[:2])
        xyz = backmap_topology(top, t.xyz[0], np.zeros((2, 0)),
                               dihedral_indices=np.zeros((0, 4), np.int64),
                               side_dihedrals=target)
        measured = np.asarray(
            compute_dihedrals(jnp.asarray(xyz), cv_order)
        )
        # wrap-aware comparison
        d = np.abs(measured - target)
        d = np.minimum(d, 2 * np.pi - d)
        assert d.max() < 5e-3, d.max()
