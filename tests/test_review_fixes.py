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
        # em.load on .h5 returns a TrajEnsemble (reference dispatch,
        # wave 24); frame selection happens on the member traj
        t2 = em.load(str(path)).trajs[0]
        sel = t2[np.array([3, 3, 7, 1, 3])]
        xyz = sel.xyz
        assert xyz.shape[0] == 5
        np.testing.assert_array_equal(xyz[0], xyz[1])
        np.testing.assert_array_equal(xyz[0], xyz[4])
        np.testing.assert_array_equal(xyz[0], t2[3].xyz[0])


class TestNativeIORobustness:
    def _write_sample(self, tmp_path, n_frames=5, n_atoms=20):
        from encodermap_tpu.data.xtc import write_xtc

        rng = np.random.default_rng(0)
        xyz = rng.uniform(0, 4, (n_frames, n_atoms, 3)).astype(np.float32)
        path = tmp_path / "t.xtc"
        write_xtc(path, xyz)
        return path, xyz

    def test_truncated_final_frame_dropped_not_fatal(self, tmp_path):
        """A mid-frame truncation (interrupted copy) must drop the partial
        frame, not fail the whole file later (mdtraj behavior)."""
        from encodermap_tpu.data.xtc import XTCReader

        path, xyz = self._write_sample(tmp_path)
        size = path.stat().st_size
        with open(path, "r+b") as f:
            f.truncate(size - 40)  # cut into the last frame's payload
        r = XTCReader(path)
        assert r.n_frames == 4
        out, *_ = r.read()
        np.testing.assert_allclose(out, xyz[:4], atol=1e-3)

    def test_out_of_range_negative_index_raises(self, tmp_path):
        from encodermap_tpu.data.xtc import XTCReader

        path, _ = self._write_sample(tmp_path)
        r = XTCReader(path)
        with pytest.raises(IndexError):
            r.read([-6])
        with pytest.raises(IndexError):
            r.read([5])
        # valid negative indexing still works
        np.testing.assert_array_equal(r.read([-1])[0], r.read([4])[0])

    def test_nonfinite_coordinates_refused(self, tmp_path):
        from encodermap_tpu.data.xtc import write_xtc

        xyz = np.zeros((2, 12, 3), np.float32)
        xyz[1, 3, 1] = np.inf
        with pytest.raises(ValueError, match="non-finite"):
            write_xtc(tmp_path / "bad.xtc", xyz)

    def test_zero_frames_truncates_stale_file(self, tmp_path):
        from encodermap_tpu.data.xtc import write_xtc

        path = tmp_path / "z.xtc"
        path.write_bytes(b"stale bytes")
        write_xtc(path, np.zeros((0, 10, 3), np.float32))
        assert path.stat().st_size == 0

    def test_roundtrip_still_exact(self, tmp_path):
        from encodermap_tpu.data.xtc import XTCReader

        path, xyz = self._write_sample(tmp_path, n_frames=3, n_atoms=50)
        out, *_ = XTCReader(path).read()
        np.testing.assert_allclose(out, xyz, atol=1e-3)


class TestPDBBoxConventions:
    def test_dummy_cryst1_means_no_box(self, tmp_path):
        from encodermap_tpu.data.pdb import load_pdb

        pdb = tmp_path / "nmr.pdb"
        pdb.write_text(
            "CRYST1    1.000    1.000    1.000  90.00  90.00  90.00 P 1\n"
            "ATOM      1  N   ALA A   1       0.000   0.000   0.000  "
            "1.00  0.00           N\n"
            "ATOM      2  CA  ALA A   1       1.500   0.000   0.000  "
            "1.00  0.00           C\n"
            "END\n"
        )
        top, xyz, cell = load_pdb(pdb)
        assert cell is None  # the PDB 'no crystal' placeholder

    def test_ragged_multi_model_trims_to_first(self, tmp_path):
        from encodermap_tpu.data.pdb import load_pdb

        def atom(i, x):
            return (
                f"ATOM  {i:5d}  CA  ALA A{i:4d}    {x:8.3f}   0.000   "
                f"0.000  1.00  0.00           C\n"
            )

        pdb = tmp_path / "ragged.pdb"
        pdb.write_text(
            "MODEL        1\n" + atom(1, 1.0) + atom(2, 2.0)
            + "ENDMDL\nMODEL        2\n"
            + atom(1, 3.0) + atom(2, 4.0) + atom(3, 5.0)  # extra atom
            + "ENDMDL\nEND\n"
        )
        top, xyz, cell = load_pdb(pdb)
        assert xyz.shape == (2, 2, 3)
        assert xyz[1, 0, 0] == pytest.approx(0.3)  # Angstrom -> nm


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


class TestCustomTopologyConsistency:
    def test_patched_topology_honors_gap_guard(self):
        """A CustomTopology-patched topology must skip torsions over
        resSeq gaps exactly like the base class (the h5 round-trip
        auto-applies CustomTopology, so divergence would silently change
        feature tables on reload)."""
        from encodermap_tpu.data.custom_topology import CustomTopology

        top = _mini_top([
            ("ALA", 40, 0, BB), ("GLY", 41, 0, BB),
            ("SER", 48, 0, BB), ("VAL", 49, 0, BB),
        ])
        patched = CustomTopology(top).apply()
        np.testing.assert_array_equal(patched.indices_phi, top.indices_phi)
        np.testing.assert_array_equal(patched.indices_psi, top.indices_psi)
        np.testing.assert_array_equal(
            patched.indices_omega, top.indices_omega
        )

    def test_override_never_crosses_chains(self):
        """A '-'-prefixed override atom must not resolve into the previous
        CHAIN's last residue."""
        from encodermap_tpu.data.custom_topology import CustomTopology

        top = _mini_top([
            ("ALA", 1, 0, BB), ("PEG", 2, 0, BB),
            ("PEG", 1, 1, BB),  # chain B starts with the custom residue
        ])
        ct = CustomTopology(top)
        ct.add_residue("PEG")
        ct.override_dihedral("PHI", "PEG", ["-C", "N", "CA", "C"])
        patched = ct.apply()
        phi = patched.indices_phi
        # only chain A's PEG gets a PHI (prev = ALA); chain B's has no
        # peptide-bonded predecessor
        assert len(phi) == 1
        assert phi[0][0] == top.residues[0].atom("C").index

    def test_neighbor_referenced_extra_bonds_resolve_and_feed_graph(self):
        """bonds=[('C', '+N')] neighbor references (the documented syntax)
        must resolve across residues and reach guess_bonds' graph."""
        from encodermap_tpu.data.custom_topology import CustomTopology
        from encodermap_tpu.misc.backmapping_offline import guess_bonds

        top = _mini_top([
            ("PEG", 1, 0, BB), ("PEG", 2, 0, BB),
        ])
        ct = CustomTopology(top)
        ct.add_residue("PEG", bonds=[("C", "+N")])
        patched = ct.apply()
        c0 = patched.residues[0].atom("C").index
        n1 = patched.residues[1].atom("N").index
        assert (min(c0, n1), max(c0, n1)) in patched._extra_bonds
        # place atoms far apart so the distance criterion would MISS the
        # bond; only the declared extra bond can supply it
        xyz = np.arange(patched.n_atoms * 3, dtype=np.float32).reshape(
            -1, 3) * 10.0
        bonds = guess_bonds(patched, xyz)
        assert (min(c0, n1), max(c0, n1)) in bonds


class TestParameterHygiene:
    def test_n_epochs_migration_multiplies_steps_per_epoch(self, tmp_path):
        import json

        from encodermap_tpu import Parameters

        f = tmp_path / "parameters.json"
        f.write_text(json.dumps({
            "main_path": str(tmp_path), "n_epochs": 100,
            "n_steps_per_epoch": 1000,
        }))
        p = Parameters.from_file(f)
        assert p.n_steps == 100_000  # reference: n_epochs * steps_per_epoch

    def test_update_rejects_typos(self):
        from encodermap_tpu import Parameters

        p = Parameters()
        with pytest.raises(TypeError, match="learning_rte"):
            p.update(learning_rte=1e-4)
        p.update(learning_rate=1e-4)
        assert p.learning_rate == 1e-4

    def test_sibling_prefix_dir_still_repairs_main_path(self, tmp_path):
        """/work/run10 is NOT inside /work/run1 — the repair must fire."""
        import json

        from encodermap_tpu import Parameters

        old = tmp_path / "run1"
        new = tmp_path / "run10"
        new.mkdir()
        f = new / "parameters.json"
        f.write_text(json.dumps({"main_path": str(old)}))
        p = Parameters.from_file(f)
        assert Path(p.main_path).resolve() == new.resolve()


class TestMolDataContract:
    @needs_data
    def test_cartesians_is_all_atom(self):
        import encodermap_tpu as em
        from encodermap_tpu.moldata import MolData

        t = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))
        md = MolData(t)
        assert md.cartesians.shape[1] == t.top.n_atoms  # every atom
        assert md.central_cartesians.shape[1] == 3 * 7  # backbone only


class TestKondataRobustness:
    def test_failed_download_leaves_no_poisoned_dir(self, tmp_path,
                                                    monkeypatch):
        import urllib.request

        from encodermap_tpu import kondata

        def boom(url, target):
            Path(target).write_bytes(b"partial")  # partial file written
            raise OSError("network down")

        monkeypatch.setattr(urllib.request, "urlretrieve", boom)
        out = tmp_path / "dset"
        with pytest.raises(RuntimeError):
            kondata.get_from_kondata("dset", output=out)
        # a retry must not find a half-written directory
        assert not out.exists()


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


class TestBaseSparseDensifier:
    def test_nan_data_gets_trainable_densifier(self, tmp_path):
        """Base EncoderMap sparse mode must train a densifier (reference
        ``models.py:3165-3177``), not silently reconstruct fabricated
        zeros."""
        import encodermap_tpu as em

        rng = np.random.default_rng(0)
        data = rng.standard_normal((256, 6)).astype(np.float32)
        data[:128, 4:] = np.nan  # ragged-ensemble NaN padding
        p = em.Parameters(
            main_path=str(tmp_path), periodicity=float("inf"),
            n_neurons=[8, 8, 2], n_steps=30, steps_per_scan=10,
            batch_size=32, seed=0, checkpoint_step=10**6,
            summary_step=10**6,
        )
        emap = em.EncoderMap(p, data)
        assert emap.sparse
        assert "densifier" in emap.state.params
        before = np.asarray(emap.state.params["densifier"]["kernel"]).copy()
        h = emap.train()
        assert np.isfinite(h["loss"]).all()
        after = np.asarray(emap.state.params["densifier"]["kernel"])
        assert not np.allclose(before, after)  # it actually trains
        latent = emap.encode(data[:10])
        assert latent.shape == (10, 2) and np.isfinite(latent).all()


class TestADCEncodeTuples:
    @pytest.fixture(scope="class")
    def emap(self):
        import encodermap_tpu as em
        from encodermap_tpu.train.adc_autoencoder import (
            AngleDihedralCartesianEncoderMap,
        )
        from tests.reference_impl import backmap_np

        rng = np.random.default_rng(0)
        n_res, F = 5, 32
        na = 3 * n_res
        angles = rng.uniform(1.6, 2.4, (F, na - 2)).astype(np.float32)
        dihedrals = rng.uniform(-np.pi, np.pi, (F, na - 3)).astype(np.float32)
        distances = rng.uniform(0.13, 0.155, (F, na - 1)).astype(np.float32)
        cart = backmap_np(distances, angles, dihedrals).astype(np.float32)
        side = rng.uniform(-np.pi, np.pi, (F, 2 * n_res)).astype(np.float32)
        cvs = {
            "central_angles": angles, "central_dihedrals": dihedrals,
            "central_cartesians": cart, "central_distances": distances,
            "side_dihedrals": side,
        }
        p = em.ADCParameters(
            batch_size=8, use_backbone_angles=True, use_sidechains=True,
            n_neurons=[8, 8, 2], seed=0,
        )
        return AngleDihedralCartesianEncoderMap(cvs, p, read_only=True)

    def test_three_tuple_matches_full_tuple(self, emap):
        """The documented (angles, dihedrals, side_dihedrals) form must
        hit the same latent as the full 5-CV tuple (side data was
        previously zero-padded into the cartesians slot)."""
        a, d, cart, dist, sd = emap.train_data
        full = emap.encode(emap.train_data)
        short = emap.encode((a, d, sd))
        np.testing.assert_allclose(short, full, atol=1e-6)

    def test_stacked_matrix_matches(self, emap):
        a, d, cart, dist, sd = emap.train_data
        stacked = np.concatenate([a, d, sd], axis=1)
        np.testing.assert_allclose(
            emap.encode(stacked), emap.encode(emap.train_data), atol=1e-6
        )

    def test_two_tuple_without_side_raises(self, emap):
        a, d, *_ = emap.train_data
        with pytest.raises(ValueError, match="side_dihedrals"):
            emap.encode((a, d))


class TestADCImageCallback:
    def test_add_images_to_tensorboard_trains(self, tmp_path):
        """ImageCallback must handle the ADC's tuple train_data
        (np.asarray on the ragged tuple raised ValueError before)."""
        import encodermap_tpu as em
        from encodermap_tpu.train.adc_autoencoder import (
            AngleDihedralCartesianEncoderMap,
        )
        from tests.reference_impl import backmap_np

        rng = np.random.default_rng(0)
        n_res, F = 4, 24
        na = 3 * n_res
        angles = rng.uniform(1.6, 2.4, (F, na - 2)).astype(np.float32)
        dihedrals = rng.uniform(-np.pi, np.pi, (F, na - 3)).astype(np.float32)
        distances = rng.uniform(0.13, 0.155, (F, na - 1)).astype(np.float32)
        cart = backmap_np(distances, angles, dihedrals).astype(np.float32)
        side = rng.uniform(-np.pi, np.pi, (F, 2 * n_res)).astype(np.float32)
        cvs = {
            "central_angles": angles, "central_dihedrals": dihedrals,
            "central_cartesians": cart, "central_distances": distances,
            "side_dihedrals": side,
        }
        p = em.ADCParameters(
            main_path=str(tmp_path), batch_size=8, n_steps=4,
            steps_per_scan=2, use_backbone_angles=True, use_sidechains=True,
            n_neurons=[8, 8, 2], seed=0, checkpoint_step=10**6,
            summary_step=10**6,
        )
        emap = AngleDihedralCartesianEncoderMap(cvs, p)
        emap.add_images_to_tensorboard(image_step=2)
        h = emap.train()
        assert np.isfinite(h["loss"]).all()
        assert list(Path(tmp_path).glob("**/*.png"))


class TestADCConfigGuards:
    def test_sidechains_without_backbone_angles_rejected(self):
        """The reference raises for use_sidechains=True +
        use_backbone_angles=False (``models.py:2019-2025``); silently
        dropping the sidechain decoder group built a structurally
        inconsistent model here."""
        import encodermap_tpu as em
        from encodermap_tpu.models import adc

        p = em.ADCParameters(use_sidechains=True, use_backbone_angles=False)
        shapes = adc.ADCShapes(10, 9, 12, 11, 4)
        with pytest.raises(ValueError, match="use_backbone_angles"):
            adc.decoder_splits(p, shapes)


class TestMiscHelpers:
    def test_equal_length_lists_pair_one_to_one(self):
        from encodermap_tpu.misc.misc import get_full_common_str_and_ref

        trajs, tops, cs = get_full_common_str_and_ref(
            ["a.xtc", "b.xtc"], ["a.pdb", "b.pdb"], []
        )
        assert tops == ["a.pdb", "b.pdb"]
        assert cs == [None, None]
        # a single common_str applies to every pair
        _, _, cs1 = get_full_common_str_and_ref(
            ["a.xtc", "b.xtc"], ["a.pdb", "b.pdb"], ["x"]
        )
        assert cs1 == ["x", "x"]

    def test_centroid_index_maps_to_original_frames(self):
        from encodermap_tpu.misc.clustering import rmsd_centroid_of_cluster

        rng = np.random.default_rng(0)
        base = rng.standard_normal((5, 3)).astype(np.float32)
        # 120 noisy copies + no structure: index must index the ORIGINAL
        xyz = base[None] + rng.normal(0, 0.1, (120, 5, 3)).astype(np.float32)
        idx, D = rmsd_centroid_of_cluster(xyz, max_frames=50)
        assert 0 <= idx < 120
        assert D.shape == (50, 50)
        # identical frames: degenerate std must not NaN
        same = np.repeat(base[None], 10, axis=0)
        idx2, _ = rmsd_centroid_of_cluster(same)
        assert idx2 == 0


class TestFeatureFixes:
    @needs_data
    def test_residue_mindist_matches_bruteforce(self):
        """The fused segment-min ResidueMinDistanceFeature (previously an
        untested per-pair loop that referenced an unimported module) must
        match a numpy brute force."""
        import encodermap_tpu as em
        from encodermap_tpu.loading.features import ResidueMinDistanceFeature

        t = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))
        contacts = [(0, 3), (1, 5), (2, 6)]
        f = ResidueMinDistanceFeature(t.top, contacts, periodic=False)
        out = np.asarray(f.transform(t.xyz[:5]))
        assert out.shape == (5, 3)
        for k, (r0, r1) in enumerate(contacts):
            a0 = [a.index for a in t.top.residue(r0).atoms
                  if a.element != "H"]
            a1 = [a.index for a in t.top.residue(r1).atoms
                  if a.element != "H"]
            ref = np.min(
                np.linalg.norm(
                    t.xyz[:5][:, a0, None, :] - t.xyz[:5][:, None, a1, :],
                    axis=-1,
                ),
                axis=(1, 2),
            )
            np.testing.assert_allclose(out[:, k], ref, atol=1e-5)

    @needs_data
    def test_residue_mindist_all_and_count_contacts(self):
        """``add_residue_mindist()`` must work argument-free like the
        reference (residue_pairs='all' -> every protein pair >= 3 apart in
        sequence, reference ``featurizer.py:984-992``), and
        ``count_contacts`` must collapse to a per-frame contact count with
        the reference's 'counted' label (``features.py:2242-2255``)."""
        import encodermap_tpu as em
        from encodermap_tpu.loading.features import ResidueMinDistanceFeature
        from encodermap_tpu.loading.featurizer import SingleTrajFeaturizer

        t = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))
        feat = SingleTrajFeaturizer(t)
        feat.add_residue_mindist()  # argument-free, like the reference
        f = feat.features[-1]
        n_res = t.top.n_residues
        expected_pairs = [(i, j) for i in range(n_res)
                          for j in range(i + 3, n_res)]
        assert [tuple(p) for p in f.contacts] == expected_pairs
        assert f.describe()[0].startswith("RES_DIST (closest-heavy)")
        out = np.asarray(f.transform(t.xyz[:4]))
        assert out.shape == (4, len(expected_pairs))

        # count_contacts: single column counting pairs below threshold
        fc = ResidueMinDistanceFeature(
            t.top, "all", threshold=0.8, periodic=False, count_contacts=True
        )
        cnt = np.asarray(fc.transform(t.xyz[:4]))
        assert cnt.shape == (4, 1)
        fd = ResidueMinDistanceFeature(t.top, "all", periodic=False)
        ref_cnt = (np.asarray(fd.transform(t.xyz[:4])) < 0.8).sum(axis=1)
        np.testing.assert_array_equal(cnt[:, 0], ref_cnt)
        assert fc.describe() == ["counted RES_DIST (closest-heavy) "
                                 "number of contacts"]

        # count_contacts without a threshold is the reference's ValueError
        with pytest.raises(ValueError, match="contact threshold"):
            ResidueMinDistanceFeature(t.top, "all", count_contacts=True)

    def test_pairs_and_parse_pairwise_input(self):
        """The reference's pair-expansion helpers (``featurizer.py:307-386``):
        flat int lists expand to intra-group pairs (or the inter-group
        product minus shared atoms), with value-distance neighbor
        exclusion."""
        from encodermap_tpu.loading.featurizer import (
            _parse_pairwise_input,
            pairs,
        )

        # excluded_neighbors measures VALUE distance, pairs are value-sorted
        p = pairs([0, 1, 2, 3, 4], excluded_neighbors=2)
        assert [tuple(r) for r in p] == [(0, 3), (0, 4), (1, 4)]
        p = pairs([4, 0, 2], excluded_neighbors=0)
        assert sorted(tuple(r) for r in p) == [(0, 2), (0, 4), (2, 4)]

        # flat list -> all unique intra-group pairs (sorted, deduplicated)
        out = _parse_pairwise_input([3, 1, 1, 2])
        assert [tuple(r) for r in out] == [(1, 2), (1, 3), (2, 3)]
        # inter-group: product, atoms already in group 1 removed from group 2
        out = _parse_pairwise_input([1, 2], indices2=[2, 5])
        assert [tuple(r) for r in out] == [(1, 5), (2, 5)]
        # (n, 2) arrays pass through untouched
        out = _parse_pairwise_input([[7, 3], [2, 9]])
        assert [tuple(r) for r in out] == [(7, 3), (2, 9)]

    @needs_data
    def test_add_distances_ca_and_add_all(self):
        """The reference's add_distances_ca / add_all / aligning
        add_selection surface (``featurizer.py:647-890``) must exist and
        compute what it says."""
        import encodermap_tpu as em
        from encodermap_tpu.loading.featurizer import SingleTrajFeaturizer

        t = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))
        feat = SingleTrajFeaturizer(t)
        feat.add_distances_ca(periodic=False)
        f = feat.features[-1]
        ca = [a.index for a in t.top.atoms if a.name == "CA"]
        n_res = len(ca)  # asp7: one CA per residue
        expected = [(ca[i], ca[j]) for i in range(n_res)
                    for j in range(i + 1, n_res) if j - i > 2]
        assert [tuple(r) for r in f._indices] == expected
        d = np.asarray(f.transform(t.xyz[:3]))
        ref = np.linalg.norm(
            t.xyz[:3][:, [a for a, _ in expected]]
            - t.xyz[:3][:, [b for _, b in expected]], axis=-1,
        )
        np.testing.assert_allclose(d, ref, atol=1e-5)

        # add_all: flattened coordinates of every atom
        feat2 = SingleTrajFeaturizer(t)
        feat2.add_all()
        out = np.asarray(feat2.features[-1].transform(t.xyz[:2]))
        np.testing.assert_allclose(
            out, t.xyz[:2].reshape(2, -1), atol=1e-6
        )

        # add_all with a reference: frame 0 as reference aligns frame 0
        # onto itself (identity) and reduces other frames' RMSD
        feat3 = SingleTrajFeaturizer(t)
        feat3.add_all(reference=t.xyz[0])
        al = np.asarray(feat3.features[-1].transform(t.xyz[:3]))
        al = al.reshape(3, -1, 3)
        np.testing.assert_allclose(al[0], t.xyz[0], atol=1e-4)
        raw_rmsd = np.sqrt(((t.xyz[2] - t.xyz[0]) ** 2).sum(-1).mean())
        ali_rmsd = np.sqrt(((al[2] - t.xyz[0]) ** 2).sum(-1).mean())
        assert ali_rmsd <= raw_rmsd + 1e-6

        # flat-iterable add_distances with indices2
        feat4 = SingleTrajFeaturizer(t)
        feat4.add_distances([0, 5], indices2=[9])
        assert [tuple(r) for r in feat4.features[-1]._indices] == [
            (0, 9), (5, 9)
        ]

    @needs_data
    def test_same_class_features_do_not_clobber_output(self):
        """Two features of the same class (e.g. add_distances_ca +
        add_distances) previously collided on the class-name CV key and the
        first one's columns were silently LOST from get_output."""
        import encodermap_tpu as em
        from encodermap_tpu.loading.featurizer import SingleTrajFeaturizer

        t = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))
        feat = SingleTrajFeaturizer(t)
        feat.add_distances_ca(periodic=False)
        feat.add_distances(np.array([[0, 5], [0, 9], [5, 9]]),
                           periodic=False)
        out = feat.get_output()
        names = list(out.keys())
        assert names == ["DistanceFeature", "DistanceFeature_2"]
        assert out["DistanceFeature"].shape[1] == len(feat.features[0]._indices)
        assert out["DistanceFeature_2"].shape[1] == 3

    @needs_data
    def test_backbone_torsions_interleaved(self):
        """BackboneTorsionFeature columns alternate (phi_i, psi_i) like the
        reference, not all-phi-then-all-psi."""
        import encodermap_tpu as em
        from encodermap_tpu.loading.features import BackboneTorsionFeature

        t = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))
        f = BackboneTorsionFeature(t.top)
        # kind from the quad's first atom: phi starts at C(i-1), psi at N(i)
        kinds = [
            "PHI" if t.top.atom(int(q[0])).name == "C" else "PSI"
            for q in f._indices
        ]
        # the reference interleaves by plain zip(phi, psi)
        # (``features.py:2145-2148``): PHI, PSI, PHI, PSI, ... where the
        # k-th phi (residue k+2) pairs with the k-th psi (residue k+1) —
        # never the old all-phi-then-all-psi blocks
        assert kinds == ["PHI", "PSI"] * 6, kinds
        # column order must be the reference's exactly: the k-th PHI quad
        # is residue k+2, the k-th PSI quad residue k+1
        phi_res = [t.top.atom(int(q[1])).residue.index
                   for q in f._indices[0::2]]
        psi_res = [t.top.atom(int(q[1])).residue.index
                   for q in f._indices[1::2]]
        assert phi_res == [1, 2, 3, 4, 5, 6]
        assert psi_res == [0, 1, 2, 3, 4, 5]
        # reference label format
        labels = f.describe()
        assert labels[0].startswith("PHI 0 ") and labels[1].startswith("PSI 0 ")

    @needs_data
    def test_backbone_torsions_selstr(self):
        """``add_backbone_torsions(selstr=...)`` restricts to the selected
        residues' torsions like the reference (``featurizer.py:718``,
        ``features.py:2131-2143``)."""
        import encodermap_tpu as em
        from encodermap_tpu.loading.featurizer import SingleTrajFeaturizer

        t = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))
        feat = SingleTrajFeaturizer(t)
        feat.add_backbone_torsions("resname ASP")
        f = feat.features[-1]
        assert len(f._indices) > 0
        for q in f._indices:
            assert t.top.atom(int(q[1])).residue.name == "ASP"
        out = np.asarray(f.transform(t.xyz[:3]))
        assert out.shape == (3, len(f._indices))
        assert np.isfinite(out).all()

        # sidechain torsions accept the same selstr filter
        feat2 = SingleTrajFeaturizer(t)
        feat2.add_sidechain_torsions("resname ASP")
        fs = feat2.features[-1]
        full = SingleTrajFeaturizer(t)
        full.add_sidechain_torsions()
        n_asp_chis = sum(
            1 for q in full.features[-1]._indices
            if t.top.atom(int(q[1])).residue.name == "ASP"
        )
        assert len(fs._indices) == n_asp_chis > 0

    @needs_data
    def test_add_list_of_feats_deg_omega_check_aas(self):
        """add_list_of_feats gains the reference's deg / omega / check_aas
        arguments (``featurizer.py:458-598``): deg converts angular
        features to degrees, omega drops backbone omegas, check_aas raises
        on unknown residues instead of silently skipping them."""
        import encodermap_tpu as em
        from encodermap_tpu.loading.featurizer import SingleTrajFeaturizer

        t = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))
        rad = SingleTrajFeaturizer(t)
        rad.add_list_of_feats(["central_dihedrals"])
        degf = SingleTrajFeaturizer(t)
        degf.add_list_of_feats(["central_dihedrals"], deg=True)
        a = np.asarray(rad.features[-1].transform(t.xyz[:2]))
        b = np.asarray(degf.features[-1].transform(t.xyz[:2]))
        np.testing.assert_allclose(np.rad2deg(a), b, atol=1e-3)

        no_om = SingleTrajFeaturizer(t)
        no_om.add_list_of_feats(["central_dihedrals"], omega=False)
        assert (no_om.features[-1].dimension
                == rad.features[-1].dimension * 2 // 3)

        # cartesian features must NOT receive the deg kwarg
        carts = SingleTrajFeaturizer(t)
        carts.add_list_of_feats("all", deg=True)

        # unknown residue: check_aas=True raises, =False skips silently
        gtop = _mini_top([("ALA", 1, 0, BB), ("XYZ", 2, 0, ["P1", "P2"])])

        class _FakeTraj:
            top = gtop

        ft = SingleTrajFeaturizer(_FakeTraj())
        with pytest.raises(ValueError, match="XYZ"):
            ft.add_list_of_feats(["central_cartesians"])
        ft.add_list_of_feats(["central_cartesians"], check_aas=False)

        # add_minrmsd_to_ref takes a traj-like + ref_frame like the
        # reference (``featurizer.py:1241``)
        fr = SingleTrajFeaturizer(t)
        fr.add_minrmsd_to_ref(t, ref_frame=3)
        out = np.asarray(fr.features[-1].transform(t.xyz[:5]))
        assert out.shape == (5, 1)
        assert abs(out[3, 0]) < 1e-4  # frame 3 vs itself

    @needs_data
    def test_featurizer_describe_transform_ndim(self):
        """The reference's non-add Featurizer surface: describe() (all
        labels), transform() (one concatenated (frames, dim) array), ndim,
        select_Ca (``featurizer.py:1280-1410``)."""
        import encodermap_tpu as em
        from encodermap_tpu.loading.featurizer import SingleTrajFeaturizer

        t = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))
        feat = SingleTrajFeaturizer(t)
        feat.add_backbone_torsions()
        feat.add_distances_ca(periodic=False)
        assert feat.ndim == feat.dimension == len(feat.describe())
        mat = feat.transform()
        assert mat.shape == (t.n_frames, feat.dimension)
        assert np.isfinite(mat).all()
        # column order is feature order: first backbone torsions, then CA
        out = feat.get_output()
        np.testing.assert_allclose(
            mat[:, : out["BackboneTorsionFeature"].shape[1]],
            np.asarray(out["BackboneTorsionFeature"]), atol=1e-5,
        )
        ca = feat.select_Ca
        assert all(t.top.atom(int(i)).name == "CA" for i in ca)

    @needs_data
    def test_container_reference_conveniences(self):
        """The reference's container convenience surface: iterframes /
        itertrajs contracts, id on SingleTraj, grouping dicts,
        del_CVs/copy/unload, superpose, to_alignment_query / to_fasta,
        to_dataframe, from_textfile (``info_single.py:897-1984``,
        ``info_all.py:1077-3230``)."""
        import pandas as pd

        import encodermap_tpu as em

        t1 = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))
        t2 = em.load(str(DATA / "glu7.xtc"), str(DATA / "glu7.pdb"))
        t1.common_str, t2.common_str = "asp7", "glu7"
        trajs = em.TrajEnsemble([t1, t2])

        # SingleTraj.id: (n, 2) [traj_num, frame] once in an ensemble
        tt = trajs[0][::10]
        assert tt.id.shape == (10, 2)
        assert (tt.id[:, 0] == 0).all() and list(tt.id[:3, 1]) == [0, 10, 20]
        # iterframes yields ORIGINAL frame numbers
        pairs_ = [(i, f.n_frames) for i, f in tt.iterframes()]
        assert pairs_[:3] == [(0, 1), (10, 1), (20, 1)]
        # ensemble iterators
        assert [i for i, _ in trajs.itertrajs()] == [0, 1]
        first = next(trajs.iterframes())
        assert first[0] == 0 and first[1] == 0 and first[2].n_frames == 1

        # properties
        assert trajs.basenames == ["asp7", "glu7"]
        assert trajs.traj_nums == [0, 1]
        assert trajs.frames == [t1.n_frames, t2.n_frames]
        assert len(trajs.top) == 2 and len(trajs.top_files) == 2
        assert trajs.index_arr.shape == (trajs.n_frames, 2)
        assert trajs.name_arr[0] == "asp7" and trajs.name_arr[-1] == "glu7"
        assert len(trajs.trajs_by_common_str) >= 1
        assert set(trajs.trajs_by_traj_num) == {0, 1}
        assert len(trajs.trajs_by_top) == 2

        # to_fasta / to_alignment_query: asp7 is a hepta-ASP
        fasta = t1.top.to_fasta()
        assert fasta == ["DDDDDDD"], fasta
        q = trajs.to_alignment_query()
        assert "DDDDDDD" in q and "EEEEEEE" in q and q.count(">") >= 2

        # superpose: aligned frame k has smaller RMSD to ref frame 0
        sup = t1.superpose(t1, frame=0)
        raw = np.sqrt(((t1.xyz[50] - t1.xyz[0]) ** 2).sum(-1).mean())
        ali = np.sqrt(((sup.xyz[50] - t1.xyz[0]) ** 2).sum(-1).mean())
        assert ali < raw

        # del_CVs / copy / unload
        t1c = t1.copy()
        t1c.load_CV("central_dihedrals")
        assert "central_dihedrals" in t1c.CVs
        t1c.del_CVs()
        assert "central_dihedrals" not in t1c.CVs
        assert "central_dihedrals" not in t1.CVs  # copy was independent
        t1c.unload()
        assert t1c._xyz is None
        assert t1c.xyz.shape == t1.xyz.shape  # reloads from file

        # to_dataframe
        trajs2 = em.TrajEnsemble([t1.copy(), t1.copy()])
        trajs2.load_CVs("central_dihedrals")
        df = trajs2.to_dataframe("central_dihedrals")
        assert isinstance(df, pd.DataFrame)
        assert len(df) == trajs2.n_frames
        assert df["traj_num"].tolist() == [0] * t1.n_frames + [1] * t1.n_frames

        # traj_joined / ensemble featurizer / unload
        trajs3 = em.TrajEnsemble([t1.copy(), t1.copy()])
        tj = trajs3.traj_joined
        assert tj.n_frames == 2 * t1.n_frames
        np.testing.assert_array_equal(tj.xyz[: t1.n_frames], t1.xyz)
        fz = trajs3.featurizer
        assert fz is trajs3.featurizer  # cached
        trajs3.del_featurizer()
        assert fz is not trajs3.featurizer
        trajs3.unload()
        assert all(t._xyz is None for t in trajs3)

        # from_textfile
        listing = (
            f"{DATA / 'asp7.xtc'} {DATA / 'asp7.pdb'} asp\n"
            f"# comment line\n"
            f"{DATA / 'glu7.xtc'} {DATA / 'glu7.pdb'} glu\n"
        )
        import tempfile

        with tempfile.NamedTemporaryFile("w", suffix=".txt",
                                         delete=False) as fh:
            fh.write(listing)
        loaded = em.TrajEnsemble.from_textfile(fh.name)
        assert loaded.basenames == ["asp7", "glu7"]
        assert [t.common_str for t in loaded] == ["asp", "glu"]

    @needs_data
    def test_com_ref_geom_and_scheme_fallback(self):
        """COM features gain the reference's ref_geom superposition
        (``features.py:2647-2648``) and the empty-scheme fallback to the
        whole residue (``featurizer.py:1117-1120``); image_molecules is an
        explicit NotImplementedError, not a silent ignore."""
        import encodermap_tpu as em
        from encodermap_tpu.loading.features import (
            GroupCOMFeature,
            ResidueCOMFeature,
        )

        t = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))
        n_res = t.top.n_residues

        # ref_geom: COM of frame 0 computed after aligning onto frame 0
        # equals the raw COM of frame 0
        f = GroupCOMFeature(t.top, [[0, 1, 2, 3]], ref_geom=t.xyz[0])
        raw = GroupCOMFeature(t.top, [[0, 1, 2, 3]])
        np.testing.assert_allclose(
            np.asarray(f.transform(t.xyz[:1])),
            np.asarray(raw.transform(t.xyz[:1])), atol=1e-4,
        )
        # and later frames' aligned COMs differ from raw (frames moved)
        a2 = np.asarray(f.transform(t.xyz[50:51]))
        r2 = np.asarray(raw.transform(t.xyz[50:51]))
        assert np.isfinite(a2).all() and not np.allclose(a2, r2, atol=1e-5)

        # GLY has no sidechain atoms: scheme='sidechain' must fall back to
        # the whole residue instead of a NaN COM
        gtop = _mini_top([("GLY", 1, 0, BB), ("ALA", 2, 0, BB + ["CB"])])
        fr = ResidueCOMFeature(gtop, [0, 1], scheme="sidechain")
        assert list(fr.groups[0]) == [a.index for a in gtop.residue(0).atoms]
        assert list(fr.groups[1]) == [gtop.residue(1).atom("CB").index]
        xyz = np.random.default_rng(0).normal(size=(2, gtop.n_atoms, 3))
        out = np.asarray(fr.transform(xyz.astype(np.float32)))
        assert out.shape == (2, 6)
        assert np.isfinite(out).all()

        with pytest.raises(NotImplementedError, match="image_molecules"):
            GroupCOMFeature(t.top, [[0, 1]], image_molecules=True)
        with pytest.raises(ValueError, match="scheme"):
            ResidueCOMFeature(t.top, [0], scheme="bogus")

    def test_central_dihedral_generic_labels_without_omega(self):
        """omega=False generic labels must be unique and consistent with
        the omega=True labeling (duplicates collapsed ensemble columns)."""
        from encodermap_tpu.loading.features import CentralDihedrals

        top = _mini_top([
            ("ALA", 1, 0, BB), ("GLY", 2, 0, BB),
            ("SER", 3, 0, BB), ("VAL", 4, 0, BB),
        ])
        full = CentralDihedrals(top).generic_describe()
        no_omega = CentralDihedrals(top, omega=False).generic_describe()
        assert len(set(no_omega)) == len(no_omega)  # unique
        assert set(no_omega) == {l for l in full if "OMEGA" not in l}

    def test_sidechain_torsions_which_list(self):
        from encodermap_tpu.loading.features import SideChainTorsions

        top = _mini_top([
            ("ASP", 1, 0, BB + ["CB", "CG", "OD1", "OD2"]),
        ])
        f = SideChainTorsions(top, which=["chi1", "chi2"])
        assert len(f.describe()) == 2
        with pytest.raises(ValueError, match="chi1"):
            SideChainTorsions(top, which=["chii7"])
        gly = _mini_top([("GLY", 1, 0, BB)])
        with pytest.raises(ValueError, match="side chain"):
            SideChainTorsions(gly)

    def test_sidechain_family_consistent_for_gromacs_variants(self):
        """LYSH (GROMACS protonated lysine) must get consistent sidechain
        features across the whole family — dihedrals previously saw 0
        while cartesians/distances/angles saw the atoms."""
        from encodermap_tpu.loading.features import (
            SideChainAngles,
            SideChainBondDistances,
            SideChainCartesians,
            SideChainDihedrals,
        )

        top = _mini_top([
            ("LYSH", 1, 0, BB + ["CB", "CG", "CD", "CE", "NZ"]),
            ("ALA", 2, 0, BB + ["CB"]),
        ])
        n_di = len(SideChainDihedrals(top)._indices)
        assert n_di == 4  # chi1-4 of lysine
        assert top.sidechain_info() == {1: 4, 2: 0}
        # branch atoms: union of chi atoms minus N/CA = CB..NZ = 5
        assert len(SideChainCartesians(top)._indices) == 5
        assert len(SideChainBondDistances(top)._indices) == 5
        assert len(SideChainAngles(top)._indices) == 5

    def test_boxes_are_triclinic_relative_threshold(self):
        """f32 XTC noise on an orthorhombic box (1am7 carries -2.6e-7 on a
        6.06 nm cell) must NOT trigger the 27-image search; real skew
        must."""
        from encodermap_tpu.ops.geometry import boxes_are_triclinic

        ortho_noisy = np.array(
            [[6.06, 0, 0], [-2.6e-7, 6.06, 0], [-2.6e-7, -2.6e-7, 6.06]],
            np.float32,
        )
        assert not boxes_are_triclinic(ortho_noisy)
        dodec = np.array(
            [[5.37, 0, 0], [0, 5.37, 0], [2.685, 2.685, 3.797]], np.float32
        )
        assert boxes_are_triclinic(dodec)

    def test_orthorhombic_fast_path_matches_search(self):
        """mic_mode(False) (the static fast path the featurizer picks for
        orthorhombic cells) must agree with the general 27-image search."""
        import jax
        import jax.numpy as jnp

        from encodermap_tpu.ops import geometry as geom

        box = jnp.asarray(np.diag([4.0, 5.0, 6.0]).astype(np.float32))
        rng = np.random.default_rng(1)
        vecs = jnp.asarray(rng.uniform(-9, 9, (128, 3)).astype(np.float32))

        def wrap(v, b, triclinic):
            with geom.mic_mode(triclinic):
                return geom._mic_wrap(v, b)

        fast = np.asarray(jax.jit(wrap, static_argnums=2)(vecs, box, False))
        full = np.asarray(jax.jit(wrap, static_argnums=2)(vecs, box, True))
        np.testing.assert_allclose(fast, full, atol=1e-5)
        # and the static flag genuinely selects different traced programs
        j = jax.jit(wrap, static_argnums=2)
        fast_txt = j.lower(vecs, box, False).as_text()
        full_txt = j.lower(vecs, box, True).as_text()
        assert len(fast_txt) < len(full_txt)

    @needs_data
    def test_featurizer_triclinic_flag_end_to_end(self):
        """Same features computed through the featurizer (static-flag jit
        path) and eagerly must agree for BOTH a triclinic traj (asp7,
        dodecahedron) and a noisy-orthorhombic one (1am7 slice)."""
        import encodermap_tpu as em
        from encodermap_tpu.loading.featurizer import SingleTrajFeaturizer
        from encodermap_tpu.ops import geometry as geom

        for xtc, pdb in [
            ("asp7.xtc", "asp7.pdb"),
            ("1am7_corrected.xtc", "1am7_protein.pdb"),
        ]:
            t = em.load(str(DATA / xtc), str(DATA / pdb))[:8]
            ca = [a.index for a in t.top.atoms if a.name == "CA"]
            pairs = [(ca[i], ca[i + 2]) for i in range(len(ca) - 2)]
            f = SingleTrajFeaturizer(t)
            f.add_distances(pairs, periodic=True)
            out = f.get_output()
            (name,) = list(out.keys())
            got = out[name].data
            feat = f.features[0]
            eager = np.asarray(
                feat.transform(t.xyz, t.unitcell_vectors)
            )
            np.testing.assert_allclose(got, eager, atol=2e-5)

    def test_triclinic_minimum_image_true_minimum(self):
        """A skewed (rhombic-dodecahedron-like) cell where per-component
        rounding is NOT the minimum image: the wrapped displacement must
        beat the naive round."""
        import jax.numpy as jnp

        from encodermap_tpu.ops.geometry import _mic_wrap

        box = jnp.asarray(
            [[4.0, 0.0, 0.0], [2.0, 3.4641, 0.0], [2.0, 1.1547, 3.2660]],
            jnp.float32,
        )  # dodecahedron-ish reduced cell
        rng = np.random.default_rng(0)
        vecs = jnp.asarray(
            rng.uniform(-6, 6, (200, 3)).astype(np.float32)
        )
        wrapped = np.asarray(_mic_wrap(vecs, box))
        # brute force over a generous 9^3 lattice neighborhood (the input
        # vectors span several cells before wrapping)
        shifts = np.array(
            [[i, j, k] for i in range(-4, 5) for j in range(-4, 5)
             for k in range(-4, 5)], np.float32) @ np.asarray(box)
        best = np.min(
            np.linalg.norm(np.asarray(vecs)[:, None, :] - shifts, axis=-1),
            axis=1,
        )
        np.testing.assert_allclose(
            np.linalg.norm(wrapped, axis=-1), best, atol=1e-4
        )


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


class TestWave7Fixes:
    """Round-3 review wave 7: container-convenience surface bugs found by
    the post-commit review of 83480dd..HEAD."""

    @needs_data
    def test_topology_value_equality_dedup(self):
        """Independently parsed copies of one topology file must group as
        ONE topology in .top / trajs_by_top / to_alignment_query (the
        reference dedupes by mdtraj value equality)."""
        import encodermap_tpu as em

        t1 = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))
        t2 = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))
        assert t1.top is not t2.top and t1.top == t2.top
        assert hash(t1.top) == hash(t2.top)
        trajs = em.TrajEnsemble([t1, t2])
        assert len(trajs.top) == 1
        assert len(trajs.trajs_by_top) == 1
        q = trajs.to_alignment_query()  # must not raise "2 topologies"
        assert q.count("DDDDDDD") >= 1
        # a custom chi-table patch makes them UNEQUAL again (different
        # dihedral tables, same atoms)
        t2p = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))
        t2p.load_custom_topology(
            {"ASP": {"chi2": ["CA", "CB", "CG", "OD1"]}}
        )
        assert t1.top != t2p.top

    @needs_data
    def test_shallow_copy_drops_stale_featurizer(self):
        """superpose/traj_joined products must not inherit a featurizer
        bound to the ORIGINAL trajectory's coordinates."""
        import encodermap_tpu as em

        t = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))
        _ = t.featurizer  # populate the cache
        sup = t.superpose(t, frame=0)
        assert sup.featurizer is not t.featurizer
        assert sup.featurizer.traj is sup

    @needs_data
    def test_grouping_preserves_parent_traj_nums(self):
        import encodermap_tpu as em

        a = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))
        b = em.load(str(DATA / "glu7.xtc"), str(DATA / "glu7.pdb"))
        c = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))
        trajs = em.TrajEnsemble([a, b, c])
        for t, cs in zip(trajs, ["a", "b", "a"]):
            t.common_str = cs
        by_cs = trajs.trajs_by_common_str
        assert by_cs["a"].traj_nums == [0, 2]
        assert by_cs["b"].traj_nums == [1]
        # id provenance carries the parent numbering
        assert set(by_cs["a"].id[:, 0]) == {0, 2}
        by_top = trajs.trajs_by_top
        assert sorted(sum((e.traj_nums for e in by_top.values()), [])) == \
            [0, 1, 2]
        nums = {frozenset(e.traj_nums) for e in by_top.values()}
        assert frozenset({0, 2}) in nums  # asp7 copies grouped together

    @needs_data
    def test_feature_shortcut_beats_same_named_directory(self, tmp_path,
                                                         monkeypatch):
        """A CWD directory named 'all' must not hijack load_CVs('all')."""
        import encodermap_tpu as em

        (tmp_path / "all").mkdir()
        (tmp_path / "central_dihedrals").mkdir()
        monkeypatch.chdir(tmp_path)
        t = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))
        trajs = em.TrajEnsemble([t])
        trajs.load_CVs("central_dihedrals")
        assert "central_dihedrals" in t.CVs

    def test_to_fasta_keeps_empty_chains(self):
        from encodermap_tpu.data.topology import Topology

        top = Topology()
        r0 = top.add_residue("HOH", 1, 0)
        top.add_atom("O", "O", r0)
        r1 = top.add_residue("ALA", 1, 1)
        for n, e in (("N", "N"), ("CA", "C"), ("C", "C")):
            top.add_atom(n, e, r1)
        assert top.to_fasta() == ["", "A"]

    @needs_data
    def test_align_frames_helper_matches_previous_behavior(self):
        """The shared Kabsch helper gives the same numbers the three
        call sites produced before the consolidation."""
        import jax
        import jax.numpy as jnp

        import encodermap_tpu as em
        from encodermap_tpu.ops.kabsch import align_frames, kabsch_weighted

        t = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))
        xyz = np.asarray(t.xyz[:8], np.float32)
        ref = xyz[0]
        got = np.asarray(align_frames(xyz, ref))

        def align_one(frame):
            _, R, t_ = kabsch_weighted(frame, jnp.asarray(ref))
            return jnp.matmul(
                frame, R.T, precision=jax.lax.Precision.HIGHEST
            ) + t_

        want = np.asarray(jax.vmap(align_one)(jnp.asarray(xyz)))
        np.testing.assert_allclose(got, want, atol=1e-6)
        # fit on a subset, transform the whole frame
        sel = t.top.select("name CA")
        got = np.asarray(align_frames(xyz, ref[sel], sel))
        assert got.shape == xyz.shape
        rms = np.sqrt(((got[3, sel] - ref[sel]) ** 2).sum(-1).mean())
        raw = np.sqrt(((xyz[3, sel] - ref[sel]) ** 2).sum(-1).mean())
        assert rms < raw


class TestDunderParity:
    """Reference container dunders: __eq__, __reversed__, context manager
    (``info_single.py:2014-2044``, ``info_all.py:3272``; reference tests
    ``test_trajinfo.py:305-342,817``)."""

    @needs_data
    def test_single_traj_equality(self):
        import encodermap_tpu as em

        t1 = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))
        t2 = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))
        assert t1 == t2 and hash(t1) == hash(t2)
        # different slicing breaks equality
        assert t1[::2] != t2
        assert t1[::2] == t2[::2]
        # CV presence participates
        t1.load_CV("central_dihedrals")
        assert t1 != t2
        t2.load_CV("central_dihedrals")
        assert t1 == t2
        # different file breaks equality
        g = em.load(str(DATA / "glu7.xtc"), str(DATA / "glu7.pdb"))
        assert t1 != g

    @needs_data
    def test_reversed(self):
        import encodermap_tpu as em

        t = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))
        marker = np.arange(t.n_frames, dtype=np.float32)[:, None]
        t.load_CV(marker, attr_name="marker")
        r = reversed(t)
        assert r.n_frames == t.n_frames
        np.testing.assert_array_equal(r.xyz[0], t.xyz[-1])
        assert float(r.CVs["marker"][0, 0]) == t.n_frames - 1
        # original frame numbers preserved through the reversal
        assert int(r.id[0, -1] if r.id.ndim == 2 else r.id[0]) \
            == t.n_frames - 1

    @needs_data
    def test_context_manager(self):
        import encodermap_tpu as em

        t = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))
        with t as held:
            assert held._xyz is not None
            assert held is t
        assert t._xyz is None  # unloaded on exit
        assert t.xyz.shape[0] > 0  # lazily reloads

    @needs_data
    def test_traj_ensemble_equality(self):
        import encodermap_tpu as em

        def make():
            a = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))
            b = em.load(str(DATA / "glu7.xtc"), str(DATA / "glu7.pdb"))
            return em.TrajEnsemble([a, b])

        e1, e2 = make(), make()
        assert e1 == e2
        assert e1 != e2.subsample(stride=2)
        assert e1 != em.TrajEnsemble([e1.trajs[0]._shallow_copy()])


class TestSelectors:
    """fsel/tsel identifier-based selection (reference ``SingleTrajFsel``
    ``info_single.py:169-213``, ``TrajEnsembleTsel`` ``info_all.py:757``)."""

    @needs_data
    def test_fsel_selects_by_original_frame_number(self):
        import encodermap_tpu as em

        t = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))
        sub = t[::10]  # original frame numbers 0, 10, 20, ...
        f = sub.fsel[20]
        assert f.n_frames == 1
        np.testing.assert_array_equal(f.xyz[0], t.xyz[20])
        multi = sub.fsel[[0, 30]]
        assert multi.n_frames == 2
        np.testing.assert_array_equal(multi.xyz[1], t.xyz[30])
        with pytest.raises(ValueError, match="No frames"):
            sub.fsel[7]  # 7 was dropped by the stride
        with pytest.raises(ValueError, match="takes an int"):
            sub.fsel[::2]

    @needs_data
    def test_tsel_selects_by_traj_num(self):
        import encodermap_tpu as em

        a = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))
        b = em.load(str(DATA / "glu7.xtc"), str(DATA / "glu7.pdb"))
        c = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))
        trajs = em.TrajEnsemble([a, b, c])
        for t, cs in zip(trajs, ["x", "y", "x"]):
            t.common_str = cs
        sub = trajs.trajs_by_common_str["x"]  # traj_nums [0, 2]
        assert sub.tsel[2].basename == "asp7"
        assert sub.tsel[2].traj_num == 2
        pair_ens = sub.tsel[[2, 0]]
        assert pair_ens.traj_nums == [2, 0]
        with pytest.raises(ValueError, match="No trajectory with traj_num"):
            sub.tsel[1]

    def test_hex_to_rgba(self):
        from encodermap_tpu.plot import hex_to_rgba

        assert hex_to_rgba("#ff0080") == "rgba(255, 0, 128, 0.8)"
        assert hex_to_rgba("00ff00", alpha=1.0) == "rgba(0, 255, 0, 1.0)"


class TestUrlLoading:
    """SingleTraj from a URL (reference ``info_single.py:593-609``,
    reference test ``test_trajinfo.py:292-303``): the URL stays the public
    traj_file/top_file identity while IO happens on a cached download."""

    @needs_data
    def test_url_traj(self, tmp_path, monkeypatch):
        import shutil
        import urllib.request

        import encodermap_tpu as em
        from encodermap_tpu.data import trajectory as tmod

        calls = {"n": 0}

        def fake_retrieve(url, target):
            calls["n"] += 1
            shutil.copyfile(DATA / "asp7.pdb", target)

        monkeypatch.setattr(urllib.request, "urlretrieve", fake_retrieve)

        url = "https://example.org/structures/asp7.pdb"
        # point the cache at tmp_path so the test is hermetic
        orig = tmod._fetch_url_cached
        monkeypatch.setattr(
            tmod, "_fetch_url_cached",
            lambda u, cache_dir="/unused": orig(u, str(tmp_path)),
        )
        t = em.SingleTraj(url)
        assert t.traj_file == url and t.top_file == url
        assert t.basename == "asp7" and t.extension == ".pdb"
        assert t.n_frames >= 1 and t.top.n_atoms > 0
        assert calls["n"] == 1
        # second construction hits the cache, no new download
        t2 = em.SingleTraj(url)
        assert calls["n"] == 1
        assert t2.xyz.shape == t.xyz.shape
        # slicing keeps the URL identity
        assert t[0].traj_file == url
        # unload + reload still works from the cache
        t.unload()
        assert t.xyz.shape[0] >= 1


class TestWave8Fixes:
    """Round-3 review wave 8: plot/parallel/alignment/kondata findings."""

    @needs_data
    def test_clustal_relabel_skips_flat_counter_labels(self):
        """ClustalW relabeling must not touch side_angles/side_distances
        (their generic labels end in flat feature counters, not residue
        numbers — rewriting them collides with other features' labels)."""
        from encodermap_tpu.data import load

        aln = (
            "CLUSTAL W multiple sequence alignment\n"
            "\n"
            "aspa   DDDDDDD--\n"
            "aspb   --DDDDDDD\n"
        )
        trajs = load(
            [DATA / "asp7.xtc", DATA / "asp7.xtc"],
            [DATA / "asp7.pdb"],
            common_str=["asp7"],
        )
        trajs.trajs[0].common_str = "aspa"
        trajs.trajs[1].common_str = "aspb"
        trajs.parse_clustal_w_alignment(aln)
        trajs.load_CVs(["side_angles", "side_dihedrals"], ensemble=True)
        labels = trajs.trajs[1]._CVs.entry("side_angles").labels
        # every label unique (no collision-collapse), and the label set is
        # the UNSHIFTED flat enumeration
        assert len(labels) == len(set(labels))
        per_traj_n = 14  # asp7: 7 ASP x (chi1, chi2) angles... count below
        n = len(labels)
        assert sorted(int(l.rsplit(" ", 1)[1]) for l in labels) == list(
            range(n)
        )
        # side_dihedrals (residue-numbered) DO get alignment columns
        sd_labels = trajs.trajs[1]._CVs.entry("side_dihedrals").labels
        assert any(l.endswith(" 9") for l in sd_labels)

    @needs_data
    def test_sharded_featurizer_dedups_same_class_features(self, tmp_path):
        import encodermap_tpu as em
        from encodermap_tpu.parallel.sharded_featurize import (
            ShardedFeaturizer,
        )

        traj = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))
        sf = ShardedFeaturizer(traj)
        sf.add_distances_ca(periodic=False)
        pairs = np.array([[0, 5], [1, 7]])
        sf.add_distances(pairs, periodic=False)
        out = sf.get_output()
        assert "DistanceFeature" in out and "DistanceFeature_2" in out
        n_ca_pairs = sf._inner.features[0].indices.shape[0]
        assert out["DistanceFeature"].shape == (traj.n_frames, n_ca_pairs)
        assert out["DistanceFeature_2"].shape[1] == 2
        p = tmp_path / "cv.h5"
        sf.to_hdf5(p)  # must not raise 'name already exists'
        import h5py

        with h5py.File(p) as f:
            assert "CVs/DistanceFeature" in f and "CVs/DistanceFeature_2" in f

    def test_distance_histogram_apply_respects_adc_param_split(self):
        from encodermap_tpu.parameters import ADCParameters, Parameters
        from encodermap_tpu.plot.interactive import (
            DistanceHistogramInteractive,
        )

        rng = np.random.default_rng(0)
        tuner = DistanceHistogramInteractive(
            rng.normal(size=(64, 4)).astype(np.float32), float("inf")
        )
        tuner.update(sig_h=7.0)
        adc = ADCParameters()
        before = tuple(adc.dist_sig_parameters)
        tuner.apply(adc)
        assert tuple(adc.cartesian_dist_sig_parameters)[0] == 7.0
        assert tuple(adc.dist_sig_parameters) == before  # untouched
        tuner.apply(adc, attribute="dist_sig_parameters")
        assert tuple(adc.dist_sig_parameters)[0] == 7.0
        p = Parameters()
        tuner.apply(p)
        assert tuple(p.dist_sig_parameters)[0] == 7.0
        with pytest.raises(AttributeError):
            tuner.apply(p, attribute="cartesian_dist_sig_parameters")

    def test_distance_histogram_subsamples_large_inputs(self):
        from encodermap_tpu.plot.interactive import (
            DistanceHistogramInteractive,
        )

        rng = np.random.default_rng(1)
        big = rng.normal(size=(5000, 3)).astype(np.float32)
        tuner = DistanceHistogramInteractive(big, float("inf"))
        assert len(tuner.distances) <= 1000 * 999 // 2
        tuner2 = DistanceHistogramInteractive(big, 2 * np.pi)
        assert len(tuner2.distances) <= 1000 * 999 // 2

    @needs_data
    def test_plot_cluster_multi_topology(self, tmp_path):
        import encodermap_tpu as em
        from encodermap_tpu.plot import plot_cluster

        a = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))
        b = em.load(str(DATA / "glu7.xtc"), str(DATA / "glu7.pdb"))
        assert a.top.n_atoms != b.top.n_atoms
        trajs = em.TrajEnsemble([a, b])
        n = trajs.n_frames
        membership = np.zeros(n, dtype=int)
        latent = np.random.default_rng(2).normal(size=(n, 2))
        # selection spans both topologies
        res = plot_cluster(trajs, 0, membership, latent, tmp_path,
                           max_structures=6)
        assert isinstance(res["pdb"], list) and len(res["pdb"]) == 2
        for pdb in res["pdb"]:
            assert Path(pdb).exists()
        assert 0 <= res["centroid_frame"] < n

    def test_initialize_explicit_coordinator_not_swallowed(self, monkeypatch):
        import encodermap_tpu.parallel.distributed as dist

        calls = []
        monkeypatch.setattr(dist, "_initialized", False)
        monkeypatch.setattr(
            dist.jax.distributed, "initialize",
            lambda **kw: calls.append(kw),
        )
        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        monkeypatch.delenv("MEGASCALE_COORDINATOR_ADDRESS", raising=False)
        monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
        dist.initialize()  # no-op path
        assert calls == []
        dist.initialize(coordinator_address="h:1234", num_processes=2,
                        process_id=0)
        assert len(calls) == 1  # explicit call went through
        dist.initialize(coordinator_address="h:1234", num_processes=2,
                        process_id=0)
        assert len(calls) == 1  # joined state latches

    def test_kondata_honors_download_flags(self, tmp_path, monkeypatch):
        import tarfile
        import urllib.request

        from encodermap_tpu.kondata import get_from_kondata

        payload = tmp_path / "payload"
        (payload / "checkpoints").mkdir(parents=True)
        (payload / "checkpoints" / "model.keras").write_text("x")
        (payload / "traj.h5").write_text("x")
        (payload / "extra_data").mkdir()
        (payload / "extra_data" / "big.dat").write_text("x")
        (payload / "README.md").write_text("hello")
        tar_path = tmp_path / "ds.tar"
        with tarfile.open(tar_path, "w") as tf:
            for p in sorted(payload.rglob("*")):
                tf.add(p, arcname=str(p.relative_to(payload)))

        def fake_retrieve(url, target):
            import shutil

            shutil.copyfile(tar_path, target)

        monkeypatch.setattr(urllib.request, "urlretrieve", fake_retrieve)
        out = get_from_kondata(
            "mini", output=tmp_path / "out", download_checkpoints=False,
            download_h5=False, download_extra_data=False,
        )
        out = Path(out)
        assert (out / "README.md").exists()
        assert not (out / "traj.h5").exists()
        assert not (out / "checkpoints" / "model.keras").exists()
        assert not (out / "extra_data" / "big.dat").exists()

    @needs_data
    def test_render_vmd_custom_script_is_verbatim(self, tmp_path):
        from encodermap_tpu.plot import render_vmd

        script = render_vmd(
            DATA / "asp7.pdb",
            custom_script="mol new my_scene.pdb",
            surf="quicksurf",
            ssupdate=True,
            drawframes=True,
            script_only=True,
            script_location=tmp_path / "s.tcl",
            image_location=tmp_path / "img",
        )
        text = Path(script).read_text()
        assert "my_scene" in text
        assert "Quicksurf" not in text and "ssrecalc" not in text


class TestWave9Fixes:
    """Round-3 review wave 9: training-core/persistence findings — sparse
    NaN propagation through generate/decode/train_for_references, stale
    trainer caches on set_train_data, NaN-abort checkpoint shadowing,
    streaming step overshoot, donated-state recovery, ADC encode chunking,
    metrics-writer lifecycle."""

    @staticmethod
    def _adc_arrays(n_frames=120, n_res=6, sparse=False):
        from tests.reference_impl import backmap_np

        rng = np.random.default_rng(3)
        n_atoms = 3 * n_res
        angles = rng.uniform(1.6, 2.4, (n_frames, n_atoms - 2)).astype(
            np.float32)
        dihedrals = rng.uniform(-np.pi, np.pi, (n_frames, n_atoms - 3)
                                ).astype(np.float32)
        distances = rng.uniform(0.13, 0.155, (n_frames, n_atoms - 1)).astype(
            np.float32)
        cart = backmap_np(distances, angles, dihedrals).astype(np.float32)
        side = rng.uniform(-np.pi, np.pi, (n_frames, 2 * n_res)).astype(
            np.float32)
        if sparse:
            # mixed-topology alignment NaN-pads columns some trajs lack
            angles = angles.copy()
            angles[: n_frames // 2, -1] = np.nan
            side[: n_frames // 2, -2:] = np.nan
        return {
            "central_angles": angles,
            "central_dihedrals": dihedrals,
            "central_cartesians": cart,
            "central_distances": distances,
            "side_dihedrals": side,
        }

    @staticmethod
    def _adc_params(tmp_path, **kw):
        from encodermap_tpu import ADCParameters

        d = dict(main_path=str(tmp_path), n_neurons=[8, 8, 2], n_steps=4,
                 steps_per_scan=2, batch_size=16, checkpoint_step=10000,
                 summary_step=100, seed=1, use_backbone_angles=True,
                 use_sidechains=True)
        d.update(kw)
        return ADCParameters(**d)

    def test_sparse_adc_generate_decode_refs_finite(self, tmp_path):
        """NaN-padded (sparse) train data must not leak NaN through the
        dataset means used by generate()/decode()/train_for_references()."""
        from encodermap_tpu.train.adc_autoencoder import (
            AngleDihedralCartesianEncoderMap,
        )

        cvs = self._adc_arrays(sparse=True)
        # dihedrals-only model: exercises the mean-angle substitution in
        # decode()/generate() with a NaN-padded angle column
        emap = AngleDihedralCartesianEncoderMap(
            cvs, self._adc_params(tmp_path, use_backbone_angles=False,
                                  use_sidechains=False),
            read_only=True,
        )
        assert emap.sparse
        emap.train()
        xyz = emap.generate(np.zeros((3, 2), np.float32))
        assert np.isfinite(xyz).all()
        decoded = emap.decode(np.zeros((3, 2), np.float32))
        for arr in decoded:
            assert np.isfinite(arr).all()
        refs = emap.train_for_references(maxiter=3)
        assert all(np.isfinite(v) for v in refs.values())

    def test_adc_set_train_data_guards(self, tmp_path):
        from encodermap_tpu.train.adc_autoencoder import (
            AngleDihedralCartesianEncoderMap,
        )

        dense = self._adc_arrays(sparse=False)
        emap = AngleDihedralCartesianEncoderMap(
            dense, self._adc_params(tmp_path), read_only=True
        )
        emap.train()
        # dense-built model + NaN data: no densifiers exist -> refuse
        with pytest.raises(ValueError, match="densifiers"):
            emap.set_train_data(self._adc_arrays(sparse=True))
        # width mismatch -> refuse
        bad = {k: v[:, :-1] if v.ndim == 2 else v[:, :-1]
               for k, v in dense.items()}
        with pytest.raises(ValueError, match="shape"):
            emap.set_train_data(bad)

    def test_adc_sparse_to_dense_resets_trainer(self, tmp_path):
        from encodermap_tpu.train.adc_autoencoder import (
            AngleDihedralCartesianEncoderMap,
        )

        emap = AngleDihedralCartesianEncoderMap(
            self._adc_arrays(sparse=True), self._adc_params(tmp_path),
            read_only=True,
        )
        emap.train()
        assert emap._trainer  # cached compiled chunks exist
        emap.set_train_data(self._adc_arrays(sparse=False))
        assert not emap.sparse
        assert emap._trainer is None  # traced-with-sparse steps dropped
        emap.p.n_steps = 8
        emap.train()  # retraces cleanly on the dense path

    def test_base_set_train_data_nan_on_dense_raises(self, tmp_path):
        import encodermap_tpu as em

        data = np.random.default_rng(0).normal(size=(64, 6)).astype(np.float32)
        p = em.Parameters(main_path=str(tmp_path), n_neurons=[8, 2],
                          activation_functions=["", "tanh", ""],
                          periodicity=float("inf"), n_steps=2,
                          steps_per_scan=2, batch_size=16)
        emap = em.EncoderMap(p, data, read_only=True)
        nan_data = data.copy()
        nan_data[:5, 0] = np.nan
        with pytest.raises(ValueError, match="densifier"):
            emap.set_train_data(nan_data)

    def test_nan_abort_does_not_persist(self, tmp_path):
        """NaNInterrupt must keep the diverged params away from
        CheckpointSaver AND the end-of-train save."""
        import jax.numpy as jnp

        import encodermap_tpu as em

        data = np.random.default_rng(0).normal(size=(64, 6)).astype(np.float32)
        p = em.Parameters(main_path=str(tmp_path / "run"), n_neurons=[8, 2],
                          activation_functions=["", "tanh", ""],
                          periodicity=float("inf"), n_steps=20,
                          steps_per_scan=10, batch_size=16,
                          checkpoint_step=5, summary_step=100)
        emap = em.EncoderMap(p, data)
        emap.add_loss(lambda params, batch: jnp.float32(np.nan), name="boom")
        emap.train()
        ckpts = list(Path(p.main_path).glob("saved_model_*.npz"))
        assert ckpts == []
        # parameters.json still points at the pre-training step
        from encodermap_tpu import Parameters

        reloaded = Parameters.from_file(Path(p.main_path) / "parameters.json")
        assert reloaded.current_training_step == 0

    def test_streaming_stops_exactly_at_n_steps(self, tmp_path):
        import encodermap_tpu as em

        data = np.random.default_rng(0).normal(size=(640, 6)).astype(np.float32)
        p = em.Parameters(main_path=str(tmp_path / "run"), n_neurons=[8, 2],
                          activation_functions=["", "tanh", ""],
                          periodicity=float("inf"), n_steps=25,
                          steps_per_scan=10, batch_size=16, seed=0)
        emap = em.EncoderMap(p, data[:32])

        class Source:
            def __iter__(self):
                return self

            def __next__(self):
                return data[np.random.default_rng(1).integers(
                    0, len(data), (10, 16))]

        history = emap.train_streaming(Source(), n_steps=25)
        assert int(emap.state.step) == 25
        assert len(history["loss"]) == 25
        assert emap.p.current_training_step == 25

    def test_profile_steps_leaves_model_usable(self, tmp_path):
        """The profiled trainer donates its input state; the model must get
        the newest (live) state back and stay usable."""
        import encodermap_tpu as em
        from encodermap_tpu.misc.profiling import profile_steps

        data = np.random.default_rng(0).normal(size=(64, 6)).astype(np.float32)
        p = em.Parameters(main_path=str(tmp_path / "run"), n_neurons=[8, 2],
                          activation_functions=["", "tanh", ""],
                          periodicity=float("inf"), n_steps=4,
                          steps_per_scan=2, batch_size=16)
        emap = em.EncoderMap(p, data, read_only=True)
        profile_steps(emap, n_steps=1, logdir=tmp_path / "prof")
        assert int(emap.state.step) == 4  # warmup + 1 traced chunk
        latent = emap.encode(data)  # params buffers are alive
        assert np.isfinite(latent).all()

    def test_adc_encode_is_chunked(self, tmp_path):
        """encode() of a big dataset uploads 8192-row chunks, and chunked
        equals unchunked."""
        from encodermap_tpu.train.adc_autoencoder import (
            AngleDihedralCartesianEncoderMap,
        )

        cvs = self._adc_arrays(n_frames=50, n_res=4)
        emap = AngleDihedralCartesianEncoderMap(
            cvs, self._adc_params(tmp_path, n_steps=2), read_only=True
        )
        big = {k: np.concatenate([v] * 200, axis=0)
               for k, v in cvs.items()}  # 10000 frames
        latent_big = emap.encode(big)
        assert latent_big.shape == (10000, 2)
        latent_small = emap.encode(cvs)
        np.testing.assert_allclose(latent_big[:50], latent_small[:50],
                                   atol=1e-6)

    def test_train_twice_reuses_metrics_file(self, tmp_path):
        """Re-training closes the previous writer (no leaked handle) and the
        JSONL accumulates both runs."""
        import encodermap_tpu as em

        data = np.random.default_rng(0).normal(size=(64, 6)).astype(np.float32)
        p = em.Parameters(main_path=str(tmp_path / "run"), n_neurons=[8, 2],
                          activation_functions=["", "tanh", ""],
                          periodicity=float("inf"), n_steps=4,
                          steps_per_scan=2, batch_size=16, summary_step=1)
        emap = em.EncoderMap(p, data)
        emap.train()
        assert emap._metrics_writer is None  # closed after the run
        n_lines = len((Path(p.main_path) / "train_metrics.jsonl")
                      .read_text().splitlines())
        emap.p.n_steps = 8
        emap.train()
        assert emap._metrics_writer is None
        n_lines2 = len((Path(p.main_path) / "train_metrics.jsonl")
                       .read_text().splitlines())
        assert n_lines2 > n_lines


class TestWave10Fixes:
    """Round-3 review wave 10: numerical-core findings — reference-exact
    cartesian_pwd defaults, oracle periodic distance leg + soft-start
    guard."""

    def test_cartesian_pwd_defaults_use_all_atoms(self):
        """cartesian_pwd_* = None means NO slicing, like the reference's
        PairwiseDistances (``layers.py:1252-1266`` slices with the raw None
        values); CA selection is start=1, step=3."""
        import jax.numpy as jnp

        from encodermap_tpu import ADCParameters
        from encodermap_tpu.models import adc

        xyz = jnp.asarray(
            np.random.default_rng(0).normal(size=(4, 12, 3)), jnp.float32
        )
        flat_default = adc.cartesian_pwd_slice(ADCParameters(), xyz)
        assert flat_default.shape == (4, 12 * 11 // 2)  # all 12 atoms
        p_ca = ADCParameters(cartesian_pwd_start=1, cartesian_pwd_step=3)
        flat_ca = adc.cartesian_pwd_slice(p_ca, xyz)
        assert flat_ca.shape == (4, 4 * 3 // 2)  # the 4 CAs

    def test_oracle_soft_start_instant_switch(self):
        """(a, a) soft-start: the oracle must match losses.soft_start_scale
        (instant switch-on) instead of dividing by zero."""
        import jax.numpy as jnp

        from encodermap_tpu.ops import adc_adjoint as PTA

        rng = np.random.default_rng(1)
        n_res, B = 5, 6
        n_atoms = 3 * n_res
        enc_w = [rng.normal(size=(s, t)).astype(np.float32) * 0.1
                 for s, t in [(2 * (n_atoms - 2) + 2 * (n_atoms - 3), 8),
                              (8, 2)]]
        enc_b = [np.zeros(8, np.float32), np.zeros(2, np.float32)]
        dec_w = [rng.normal(size=(s, t)).astype(np.float32) * 0.1
                 for s, t in [(2, 8),
                              (8, 2 * (n_atoms - 2) + 2 * (n_atoms - 3))]]
        dec_b = [np.zeros(8, np.float32),
                 np.zeros(2 * (n_atoms - 2) + 2 * (n_atoms - 3), np.float32)]
        angles = rng.uniform(1.6, 2.4, (B, n_atoms - 2)).astype(np.float32)
        dihedrals = rng.uniform(-np.pi, np.pi, (B, n_atoms - 3)).astype(
            np.float32)
        distances = rng.uniform(0.13, 0.155, (B, n_atoms - 1)).astype(
            np.float32)
        from tests.reference_impl import backmap_np

        cart = backmap_np(distances, angles, dihedrals).astype(np.float32)
        hyper = dict(
            periodicity=2 * np.pi,
            dihedral_cost_scale=1.0, dihedral_cost_reference=1.0,
            angle_cost_scale=1.0, angle_cost_reference=1.0,
            side_dihedral_cost_scale=1.0, side_dihedral_cost_reference=1.0,
            cartesian_cost_scale=5.0, cartesian_cost_reference=1.0,
            soft_start=(3, 3),
            cartesian_distance_cost_scale=1.0,
            cartesian_dist_sig_parameters=(6, 12, 6, 1, 2, 6),
            distance_cost_scale=None, dist_sig_parameters=(4.5, 12, 6, 1, 2, 6),
            center_cost_scale=0.0001, l2_reg_constant=0.001,
            ca_start=1, ca_step=3, pair_iu=np.triu_indices(n_res, k=1),
        )
        import jax.numpy as jnp

        for step, expect_on in [(2.0, False), (3.0, True), (4.0, True)]:
            *_, metrics = PTA.hand_adc_step(
                enc_w, enc_b, dec_w, dec_b,
                jnp.asarray(angles), jnp.asarray(dihedrals),
                jnp.asarray(cart[:, 1::3, :]), jnp.asarray(distances), None,
                jnp.asarray(step), hyper=hyper,
            )
            assert np.isfinite(float(metrics["loss"])), step
            cart_loss = float(metrics["cartesian_loss"])
            if expect_on:
                assert cart_loss > 0.0
            else:
                assert cart_loss == 0.0


class TestWave11Fixes:
    """Round-3 review wave 11 (this session's container/featurizer
    surface): lazy batch_iterator NaN/replace semantics, attrs survival,
    Feature.__eq__ crash, _FeatureList bypasses, file-list errors."""

    @pytest.fixture()
    def ragged_h5(self, tmp_path):
        import encodermap_tpu as em
        from encodermap_tpu.data import SingleTraj, TrajEnsemble

        D = Path("/root/reference/tests/data")
        t1 = SingleTraj(D / "asp7.xtc", D / "asp7.pdb", traj_num=0)
        t2 = SingleTraj(D / "glu7.xtc", D / "glu7.pdb", traj_num=1)
        trajs = TrajEnsemble([t1, t2])
        trajs.load_CVs("side_dihedrals", ensemble=True)
        # glu7 columns asp7 lacks are NaN; ADD an artificial CV where
        # asp7 rows are ALL NaN so whole frames must be skipped
        trajs.trajs[0].load_CV(
            np.full((t1.n_frames, 4), np.nan, np.float32), "allnan_for_0")
        trajs.trajs[1].load_CV(
            np.ones((t2.n_frames, 4), np.float32), "allnan_for_0")
        path = tmp_path / "ragged.h5"
        trajs.save(path)
        return str(path), trajs

    def test_lazy_iterator_skips_all_nan_frames(self, ragged_h5):
        path, trajs = ragged_h5
        it = trajs.batch_iterator(
            8, CV_names=["allnan_for_0"], yield_index=True, seed=0,
            lazy=path,
        )
        for _ in range(5):
            index, batch = next(it)
            assert np.all(index[:, 0] == 1), index
            assert not np.any(np.isnan(batch))
        it.close()

    def test_lazy_iterator_unique_and_raise(self, ragged_h5):
        path, trajs = ragged_h5
        n1 = trajs.trajs[1].n_frames
        it = trajs.batch_iterator(
            n1, CV_names=["allnan_for_0"], yield_index=True, seed=0,
            lazy=path,
        )
        index, _ = next(it)
        assert len({tuple(r) for r in index}) == n1  # no duplicates
        it.close()
        it2 = trajs.batch_iterator(
            n1 + 1, CV_names=["allnan_for_0"], seed=0, lazy=path,
        )
        with pytest.raises(Exception, match="unique"):
            next(it2)
        it2.close()

    def test_attrs_survive_frame_indexing_and_join(self):
        from encodermap_tpu.data import SingleTraj

        D = Path("/root/reference/tests/data")
        t = SingleTraj(D / "asp7.xtc", D / "asp7.pdb")
        t.load_CV(np.ones((t.n_frames, 2), np.float32), "a", deg=True)
        sub = t[::2]
        assert sub._CVs.entry("a").attrs.get("angle_units") == "deg"
        # the homogeneity guard keeps working on the slice
        with pytest.raises(AssertionError, match="inhomogeneous"):
            sub.load_CV(np.ones((sub.n_frames, 2), np.float32), "b",
                        deg=False)

    def test_feature_eq_across_topologies_no_crash(self):
        from encodermap_tpu.data import SingleTraj
        from encodermap_tpu.loading import features as F

        D = Path("/root/reference/tests/data")
        asp7 = SingleTraj(D / "asp7.xtc", D / "asp7.pdb")
        glu7 = SingleTraj(D / "glu7.xtc", D / "glu7.pdb")
        f1 = F.MinRmsdFeature(asp7.top, asp7.xyz[0])
        f2 = F.MinRmsdFeature(glu7.top, glu7.xyz[0])
        assert f1 != f2  # must not raise on different atom counts

    def test_featurelist_extend_insert_guarded(self):
        from encodermap_tpu.data import SingleTraj
        from encodermap_tpu.loading import features as F
        from encodermap_tpu.loading.featurizer import SingleTrajFeaturizer

        D = Path("/root/reference/tests/data")
        asp7 = SingleTraj(D / "asp7.xtc", D / "asp7.pdb")
        feat = SingleTrajFeaturizer(asp7)
        feat.add_distances([[0, 5]])
        dup = F.DistanceFeature(asp7.top, [[0, 5]])
        with pytest.warns(UserWarning, match="re-add"):
            feat.features.extend([dup])
        with pytest.warns(UserWarning, match="re-add"):
            feat.features += [dup]
        with pytest.warns(UserWarning, match="re-add"):
            feat.features.insert(0, dup)
        assert len(feat.features) == 1

    def test_cv_file_list_missing_file_raises_filenotfound(self, tmp_path):
        from encodermap_tpu.data import SingleTraj, TrajEnsemble

        D = Path("/root/reference/tests/data")
        t1 = SingleTraj(D / "asp7.xtc", D / "asp7.pdb")
        t2 = SingleTraj(D / "glu7.xtc", D / "glu7.pdb")
        trajs = TrajEnsemble([t1, t2])
        ok = tmp_path / "a.npy"
        np.save(ok, np.ones((t1.n_frames, 2)))
        with pytest.raises(FileNotFoundError, match="typo"):
            trajs.load_CVs([str(ok), str(tmp_path / "typo.npy")], "cv")


class TestWave13Fixes:
    """IO-format + callback findings: fixed-atom DCDs, truncated TRR,
    write_trr box shapes, GRO empty titles, PDB column overflow, EarlyStop
    missing monitor, offscreen image rendering, clustering jit reuse."""

    def test_dcd_with_fixed_atoms_refused(self, tmp_path):
        import struct

        from encodermap_tpu.data.formats import DCDReader

        p = tmp_path / "fixed.dcd"
        icntrl = [1] + [0] * 19
        icntrl[8] = 5  # NAMNF: 5 fixed atoms
        with open(p, "wb") as fh:
            fh.write(struct.pack("<i", 84))
            fh.write(b"CORD")
            fh.write(struct.pack("<20i", *icntrl))
            fh.write(struct.pack("<i", 84))
        with pytest.raises(IOError, match="fixed atoms"):
            DCDReader(p)

    def test_trr_truncated_final_frame_dropped(self, tmp_path):
        from encodermap_tpu.data.formats import TRRReader, write_trr

        xyz = np.random.default_rng(0).normal(
            size=(3, 4, 3)).astype(np.float32)
        p = tmp_path / "t.trr"
        write_trr(p, xyz)
        data = p.read_bytes()
        (tmp_path / "cut.trr").write_bytes(data[: len(data) - 20])
        r = TRRReader(tmp_path / "cut.trr")
        assert r.n_frames == 2
        out, _, _ = r.read()
        np.testing.assert_allclose(out, xyz[:2], atol=1e-6)

    def test_write_trr_accepts_box_lengths(self, tmp_path):
        from encodermap_tpu.data.formats import TRRReader, write_trr

        xyz = np.random.default_rng(1).normal(
            size=(2, 4, 3)).astype(np.float32)
        lengths = np.asarray([[3.0, 4.0, 5.0]] * 2, np.float32)
        p = tmp_path / "b.trr"
        write_trr(p, xyz, box=lengths)
        out, box, _ = TRRReader(p).read()
        np.testing.assert_allclose(out, xyz, atol=1e-6)
        np.testing.assert_allclose(box[0], np.diag([3.0, 4.0, 5.0]),
                                   atol=1e-6)
        with pytest.raises(ValueError, match="box"):
            write_trr(tmp_path / "bad.trr", xyz, box=np.zeros((2, 4)))

    def test_gro_with_empty_title(self, tmp_path):
        from encodermap_tpu.data.formats import load_gro

        gro = (
            "\n"
            "    2\n"
            "    1LYS      N    1   1.000   2.000   3.000\n"
            "    1LYS     CA    2   1.100   2.100   3.100\n"
            "   5.00000   5.00000   5.00000\n"
        )
        p = tmp_path / "empty_title.gro"
        p.write_text(gro)
        top, xyz, box = load_gro(p)
        assert top.n_atoms == 2
        np.testing.assert_allclose(xyz[0, 0], [1.0, 2.0, 3.0])

    def test_write_pdb_wraps_large_serials_and_resseqs(self, tmp_path):
        from encodermap_tpu.data.pdb import load_pdb, write_pdb
        from encodermap_tpu.data.topology import Topology

        top = Topology()
        r = top.add_residue("ALA", 12345, 0)  # resSeq > 9999
        top.add_atom("CA", "C", r)
        xyz = np.asarray([[[1.0, 2.0, 3.0]]], np.float32)
        p = tmp_path / "wrap.pdb"
        write_pdb(p, top, xyz)
        top2, xyz2, _ = load_pdb(p)
        np.testing.assert_allclose(xyz2[0, 0], xyz[0, 0], atol=1e-3)
        assert top2.residues[0].resSeq == 12345 % 10000

    def test_earlystop_missing_monitor_warns_not_crashes(self):
        from encodermap_tpu.train.callbacks import EarlyStop

        cb = EarlyStop(monitor="val_loss")
        with pytest.warns(UserWarning, match="val_loss"):
            out = cb.on_chunk_end(0, {"loss": np.ones(5)})
        assert out is None
        # second chunk: silent skip
        assert cb.on_chunk_end(5, {"loss": np.ones(5)}) is None

    def test_image_summary_leaves_backend_alone(self, tmp_path):
        import matplotlib

        from encodermap_tpu.misc.summaries import image_summary

        before = matplotlib.get_backend()
        latent = np.random.default_rng(0).normal(size=(100, 2))
        out = image_summary(latent, 1, tmp_path)
        assert Path(out).exists()
        assert matplotlib.get_backend() == before

    def test_step_labels_match_jsonl_rows(self, tmp_path):
        """NaNInterrupt's printed step must equal the JSONL row's step
        field (first_step + i + 1)."""
        from encodermap_tpu.train.callbacks import NaNInterrupt

        loss = np.ones(10, np.float32)
        loss[3] = np.nan
        cb = NaNInterrupt()
        import io
        from contextlib import redirect_stdout

        buf = io.StringIO()
        with redirect_stdout(buf):
            stop = cb.on_chunk_end(100, {"loss": loss})
        assert stop is False
        assert "step 104" in buf.getvalue()

    def test_pairwise_rmsd_matrix_reuses_one_jit(self):
        from encodermap_tpu.misc import clustering

        xyz = np.random.default_rng(2).normal(
            size=(6, 5, 3)).astype(np.float32)
        a = clustering.pairwise_rmsd_matrix(xyz)
        before = clustering._rmsd_matrix_jit._cache_size()
        b = clustering.pairwise_rmsd_matrix(xyz)
        assert clustering._rmsd_matrix_jit._cache_size() == before
        np.testing.assert_allclose(a, b)
        assert a.shape == (6, 6)


class TestWave14Fixes:
    """Training-core / IO / DSSP review findings: native-writer bounds,
    boolean masks, lazy-iterator id order, Adam epsilon parity, alignment
    path errors, DSSP chain-break handling."""

    @needs_data
    def test_write_xtc_rejects_short_time_and_steps(self, tmp_path):
        from encodermap_tpu.data.xtc import write_xtc

        xyz = np.random.default_rng(0).normal(
            size=(10, 4, 3)).astype(np.float32)
        with pytest.raises(ValueError, match="time"):
            write_xtc(tmp_path / "a.xtc", xyz,
                      time=np.arange(3, dtype=np.float32))
        with pytest.raises(ValueError, match="steps"):
            write_xtc(tmp_path / "b.xtc", xyz,
                      steps=np.arange(20, dtype=np.int32))

    @needs_data
    def test_xtc_reader_boolean_mask(self):
        from encodermap_tpu.data.xtc import XTCReader

        r = XTCReader("/root/reference/tests/data/asp7.xtc")
        mask = np.zeros(r.n_frames, bool)
        mask[[2, 5, 7]] = True
        xyz_mask, _, _, _ = r.read(mask)
        xyz_int, _, _, _ = r.read(np.asarray([2, 5, 7]))
        np.testing.assert_array_equal(xyz_mask, xyz_int)
        with pytest.raises(IndexError, match="mask"):
            r.read(np.zeros(3, bool))

    @needs_data
    def test_lazy_batch_iterator_ids_follow_file_order(self, tmp_path):
        """An ensemble whose list order permutes traj_nums must yield
        correct [traj_num, frame] ids from the lazy iterator."""
        from encodermap_tpu.data import SingleTraj, TrajEnsemble

        D = "/root/reference/tests/data/"
        # list order REVERSED relative to traj_num order
        t5 = SingleTraj(D + "glu7.xtc", D + "glu7.pdb", traj_num=5)
        t2 = SingleTraj(D + "asp7.xtc", D + "asp7.pdb", traj_num=2)
        trajs = TrajEnsemble([t5, t2])
        trajs.load_CVs("all", ensemble=True)
        trajs.save(tmp_path / "ens.h5")
        it = trajs.batch_iterator(batch_size=16, yield_index=True,
                                  CV_names=["central_dihedrals"],
                                  deterministic=True)
        ids, batch = next(it)
        cd = {t.traj_num: t.central_dihedrals for t in trajs}
        for row_id, row in zip(ids, batch):
            tn, fn = int(row_id[0]), int(row_id[1])
            np.testing.assert_allclose(row, cd[tn][fn], atol=1e-6,
                                       err_msg=f"id ({tn},{fn}) mismatched")

    def test_adam_epsilon_matches_keras(self):
        from encodermap_tpu.train.core import make_optimizer

        opt = make_optimizer(1e-3)
        # the adam transform is the second link of the chain
        import optax

        params = {"w": np.ones(3, np.float32)}
        state = opt.init(params)
        # tiny gradients: update magnitude is lr * g/(sqrt(v_hat)+eps)
        # with g constant = lr * 1/(1+eps/sqrt(v_hat)) -> for g -> 0 the
        # eps floor dominates; compare against explicit 1e-7 adam
        ref = optax.chain(optax.clip(1.0), optax.adam(1e-3, eps=1e-7))
        rstate = ref.init(params)
        g = {"w": np.full(3, 1e-12, np.float32)}
        u1, _ = opt.update(g, state, params)
        u2, _ = ref.update(g, rstate, params)
        np.testing.assert_array_equal(u1["w"], u2["w"])

    def test_parse_clustal_w_missing_file_raises(self, tmp_path):
        from encodermap_tpu.loading.alignment import parse_clustal_w

        with pytest.raises(FileNotFoundError):
            parse_clustal_w(tmp_path / "missing.aln")
        with pytest.raises(FileNotFoundError):
            parse_clustal_w(str(tmp_path / "typo.aln"))
        # alignment TEXT without newline issues is still accepted
        seqs = parse_clustal_w("CLUSTAL W\n\nseq1  ACDE\nseq2  ACDE\n")
        assert seqs == {"seq1": "ACDE", "seq2": "ACDE"}

    def test_hdf5_source_closes_handle_on_any_error(self, tmp_path):
        import h5py

        from encodermap_tpu.train.core import HDF5BatchSource

        p = tmp_path / "odd.h5"
        with h5py.File(p, "w") as f:
            g = f.create_group("traj_joined")  # non-integer suffix
            g.create_group("CVs")
        with pytest.raises(Exception):
            HDF5BatchSource(p, ["x"], 4, steps_per_scan=2)
        # the handle must not be left open: the file is re-writable
        with h5py.File(p, "w") as f:
            f.create_dataset("ok", data=np.zeros(3))

    def test_dssp_hbond_exclusion_respects_chain_breaks(self):
        """A real inter-chain H-bond between table-adjacent residues
        (last of chain A, first of chain B) must survive; the same pair
        WITHIN a chain is the peptide partner and stays excluded."""
        from encodermap_tpu.ops.dssp import kabsch_sander_hbonds

        F, R = 1, 4
        # spread residues far apart so only the crafted pair can bond
        base = np.arange(R, dtype=np.float64)[None, :, None] * [50.0, 0, 0]
        n = np.zeros((F, R, 3)) + base
        ca = n + [1.5, 0.0, 0.0]
        c = n + [2.4, 0.5, 0.0]
        o = n + [2.9, 1.6, 0.0]
        h = n + [-0.5, -0.8, 0.0]
        # ideal H-bond: CO of residue 2 to NH of residue 3
        o[0, 2] = c[0, 2] + [0.0, 1.23, 0.0]
        n[0, 3] = c[0, 2] + [0.0, 3.13, 0.0]
        h[0, 3] = n[0, 3] - [0.0, 1.0, 0.0]
        ca[0, 3] = n[0, 3] + [1.5, 0.0, 0.0]
        c[0, 3] = n[0, 3] + [2.4, 0.5, 0.0]
        brk = np.zeros(R - 1, bool)
        brk[2] = True
        hb_break = kabsch_sander_hbonds(n, ca, c, o, h=h, chain_break=brk)
        hb_nobrk = kabsch_sander_hbonds(
            n, ca, c, o, h=h, chain_break=np.zeros(R - 1, bool)
        )
        assert hb_break[0, 2, 3], "inter-chain H-bond wrongly excluded"
        assert not hb_nobrk[0, 2, 3], "peptide partner must stay excluded"


class TestWave15Fixes:
    """Feature-equality / labeling / plotting review findings."""

    @needs_data
    def _traj(self):
        from encodermap_tpu.data import SingleTraj

        return SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb")

    @needs_data
    def test_sidechain_torsions_cossin_doubles_labels(self):
        from encodermap_tpu.loading.features import SideChainTorsions

        t = self._traj()
        f_plain = SideChainTorsions(t.top)
        f_cs = SideChainTorsions(t.top, cossin=True)
        assert len(f_cs.describe()) == 2 * len(f_plain.describe())
        assert f_cs.dimension == 2 * f_plain.dimension
        import jax.numpy as jnp

        out = np.asarray(f_cs.transform(jnp.asarray(t.xyz[:3])))
        assert out.shape == (3, f_cs.dimension)
        assert f_cs.describe()[0].startswith("COS(")

    @needs_data
    def test_distinct_com_features_not_deduped(self):
        from encodermap_tpu.loading.featurizer import SingleTrajFeaturizer

        t = self._traj()
        feat = SingleTrajFeaturizer(t)
        feat.add_group_COM([[0, 1, 2]])
        feat.add_group_COM([[5, 6, 7]])
        assert len(feat.features) == 2
        feat.add_residue_COM([0, 1], scheme="backbone")
        feat.add_residue_COM([0, 1], scheme="sidechain")
        assert len(feat.features) == 4
        # mass-weighting is load-bearing too
        feat.add_group_COM([[0, 1, 2]], mass_weighted=False)
        assert len(feat.features) == 5

    @needs_data
    def test_deg_variant_not_deduped(self):
        from encodermap_tpu.loading.featurizer import SingleTrajFeaturizer

        t = self._traj()
        feat = SingleTrajFeaturizer(t)
        feat.add_backbone_torsions()
        feat.add_backbone_torsions(deg=True)
        assert len(feat.features) == 2

    @needs_data
    def test_residue_mindist_scheme_validation(self):
        from encodermap_tpu.loading.features import (
            ResidueMinDistanceFeature,
        )

        t = self._traj()
        with pytest.raises(ValueError, match="scheme"):
            ResidueMinDistanceFeature(t.top, scheme="closest_heavy")
        f = ResidueMinDistanceFeature(t.top, scheme="sidechain-heavy")
        backbone = {"N", "CA", "C", "O", "H", "HA"}
        for block in f._pair_blocks:
            for i, j in block:
                for a in (t.top.atom(int(i)), t.top.atom(int(j))):
                    assert a.element != "H"
                    assert a.name not in backbone

    @needs_data
    def test_all_cartesians_consistent_with_side_features(self):
        from encodermap_tpu.loading.features import (
            AllCartesians,
            CentralCartesians,
            SideChainCartesians,
        )

        t = self._traj()
        all_c = AllCartesians(t.top)
        central = CentralCartesians(t.top)
        side = SideChainCartesians(t.top)
        assert len(all_c.indices) == len(central.indices) + len(side.indices)

    @needs_data
    def test_render_vmd_drawframes_emits_directive(self, tmp_path):
        from encodermap_tpu.plot.plotting import render_vmd

        t = self._traj()[:3]
        pdb = tmp_path / "t.pdb"
        t.save_pdb(pdb) if hasattr(t, "save_pdb") else None
        if not pdb.exists():
            from encodermap_tpu.data.pdb import write_pdb

            t.load()
            write_pdb(pdb, t.top, t.xyz)
        out = render_vmd(
            pdb,
            drawframes=True,
            script_only=True,
            script_location=tmp_path / "render_vmd.tcl",
        )
        text = Path(out).read_text() if isinstance(out, (str, Path)) \
            else str(out)
        assert "mol drawframes" in text

    def test_periodic_distance_histogram_chunked(self):
        import matplotlib

        matplotlib.use("Agg")
        from encodermap_tpu.plot.plotting import distance_histogram

        rng = np.random.default_rng(0)
        data = rng.uniform(-np.pi, np.pi, size=(200, 30))
        axes = distance_histogram(data, 2 * np.pi, (0.2, 3, 6, 1, 2, 6))
        assert axes is not None


class TestWave16Fixes:
    """Model/trainer review findings: sparse encode slots, clash units,
    fused-trainer densifier gate, reconstruct+sparse guard."""

    def _sparse_adc(self, tmp_path):
        import encodermap_tpu as em
        from encodermap_tpu.data import SingleTraj, TrajEnsemble

        D = "/root/reference/tests/data/"
        t1 = SingleTraj(D + "asp7.xtc", D + "asp7.pdb", traj_num=0)
        t2 = SingleTraj(D + "glu7.xtc", D + "glu7.pdb", traj_num=1)
        trajs = TrajEnsemble([t1, t2])
        trajs.load_CVs("all", ensemble=True)
        p = em.ADCParameters(
            main_path=str(tmp_path / "adc"), n_steps=10, steps_per_scan=5,
            batch_size=32, use_backbone_angles=True, use_sidechains=True,
            seed=0,
        )
        return em.AngleDihedralCartesianEncoderMap(trajs, p)

    @needs_data
    def test_sparse_encode_accepts_short_tuples(self, tmp_path):
        adc = self._sparse_adc(tmp_path)
        assert adc.sparse
        a, d = adc.train_data[0], adc.train_data[1]
        sd = adc.train_data[4]
        lat3 = adc.encode((a[:8], d[:8], sd[:8]))
        assert lat3.shape == (8, 2)
        assert np.isfinite(lat3).all()
        full = adc.encode(tuple(x[:8] for x in adc.train_data))
        np.testing.assert_allclose(lat3, full, atol=1e-6)

    @needs_data
    def test_reconstruct_sidechains_sparse_raises_early(self, tmp_path):
        import encodermap_tpu as em
        from encodermap_tpu.data import SingleTraj, TrajEnsemble

        D = "/root/reference/tests/data/"
        traj = SingleTraj(D + "asp7.xtc", D + "asp7.pdb", traj_num=0)
        trajs = TrajEnsemble([traj])
        trajs.load_CVs(
            ["central_angles", "central_dihedrals", "all_cartesians",
             "central_distances", "side_angles", "side_dihedrals",
             "side_distances"]
        )
        data = tuple(
            np.asarray(trajs.CVs[k], np.float32)
            for k in ("central_angles", "central_dihedrals",
                      "all_cartesians", "central_distances", "side_angles",
                      "side_dihedrals", "side_distances")
        )
        data[4][0, 0] = np.nan  # one NaN -> sparse mode
        p = em.ADCParameters(
            main_path=str(tmp_path / "r"), reconstruct_sidechains=True,
            n_steps=5, steps_per_scan=5, batch_size=16, seed=0,
        )
        with pytest.raises(ValueError, match="sparse"):
            em.AngleDihedralCartesianEncoderMap(trajs, p, dataset=data)

    def test_fused_trainer_gate_respects_densifier_params(self, tmp_path):
        import encodermap_tpu as em

        data, _ = em.create_n_cube(3, points_along_edge=20, seed=0)
        data = np.asarray(data, np.float32)
        nan_data = data.copy()
        nan_data[::2, 0] = np.nan
        p = em.Parameters(main_path=str(tmp_path / "s"), n_steps=10,
                          steps_per_scan=5, batch_size=16,
                          periodicity=float("inf"), seed=1)
        emap = em.EncoderMap(p, nan_data)
        assert "densifier" in emap.state.params
        # simulate from_checkpoint with clean data: sparse=False but the
        # densifier is still in the params — fused routing must refuse
        emap.sparse = False
        assert emap._maybe_fused_trainer(5) is None

    @needs_data
    def test_clash_metric_uses_reference_threshold(self, tmp_path):
        import encodermap_tpu as em
        from encodermap_tpu.data import SingleTraj, TrajEnsemble

        D = "/root/reference/tests/data/"
        trajs = TrajEnsemble([SingleTraj(D + "asp7.xtc", D + "asp7.pdb")])
        trajs.load_CVs("all")
        p = em.ADCParameters(
            main_path=str(tmp_path / "c"), n_steps=10, steps_per_scan=5,
            batch_size=16, use_backbone_angles=True, track_clashes=True,
            seed=0,
        )
        adc = em.AngleDihedralCartesianEncoderMap(trajs, p)
        h = adc.train()
        # a sane structure has FEW sub-1-Angstrom contacts; the old 1.0 nm
        # threshold counted every bonded pair (hundreds per frame)
        assert "clashes" in h
        assert np.asarray(h["clashes"][-1]) < 50


class TestWave17Fixes:
    """ops-layer review findings: MIC kernel choice for concrete boxes,
    offline-backmap jit reuse."""

    def test_concrete_ortho_box_skips_image_search(self):
        import jax
        import jax.numpy as jnp

        from encodermap_tpu.ops import geometry as geom

        xyz = np.random.default_rng(0).normal(
            size=(2, 8, 3)).astype(np.float32)
        pairs = np.asarray([[0, 1], [2, 3]])
        ortho = np.broadcast_to(np.eye(3, dtype=np.float32) * 4.0,
                                (2, 3, 3)).copy()
        tric = ortho.copy()
        tric[:, 1, 0] = 2.0
        jaxpr_ortho = str(jax.make_jaxpr(
            lambda x: geom.compute_distances(x, pairs, ortho)
        )(jnp.asarray(xyz)))
        jaxpr_tric = str(jax.make_jaxpr(
            lambda x: geom.compute_distances(x, pairs, tric)
        )(jnp.asarray(xyz)))
        # the 27-image search contains an argmin; the cheap fractional
        # round does not
        assert "argmin" not in jaxpr_ortho
        assert "argmin" in jaxpr_tric
        # and the values agree for an orthorhombic cell
        a = geom.compute_distances(jnp.asarray(xyz), pairs, ortho)
        with geom.mic_mode(True):
            b = geom.compute_distances(jnp.asarray(xyz), pairs, ortho)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    @needs_data
    def test_backmap_topology_reuses_one_jit(self):
        from encodermap_tpu.data import SingleTraj
        from encodermap_tpu.misc import backmapping_offline as bo

        traj = SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb")
        top = traj.top
        quads = top.indices_phi
        targets = np.zeros((2, len(quads)), np.float32)
        out1 = bo.backmap_topology(top, traj.xyz[0], targets,
                                   dihedral_indices=quads)
        size = bo._rotate_frames_jit._cache_size()
        out2 = bo.backmap_topology(top, traj.xyz[0], targets,
                                   dihedral_indices=quads)
        assert bo._rotate_frames_jit._cache_size() == size
        np.testing.assert_allclose(out1, out2, atol=1e-6)


class TestWave18Fixes:
    """Big-file (trajectory/featurizer) review findings."""

    @needs_data
    def test_h5_traj_with_pdb_topology(self, tmp_path):
        from encodermap_tpu.data import SingleTraj

        t = SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb")
        t.save(tmp_path / "asp7.h5")
        mixed = SingleTraj(tmp_path / "asp7.h5", DATA / "asp7.pdb")
        assert mixed.n_frames == t.n_frames
        np.testing.assert_allclose(mixed.xyz, t.xyz, atol=1e-6)

    @needs_data
    def test_ensemble_deg_rad_homogeneity_guard(self):
        from encodermap_tpu.data import SingleTraj, TrajEnsemble

        trajs = TrajEnsemble(
            [SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb")]
        )
        trajs.load_CVs(["central_angles"], deg=True)
        with pytest.raises(AssertionError, match="inhomogeneous"):
            trajs.load_CVs(["central_dihedrals"], deg=False)

    @needs_data
    def test_triclinic_cell_survives_h5_roundtrip(self, tmp_path):
        from encodermap_tpu.data import SingleTraj

        t = SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb")
        t.load()
        tric = np.asarray(t.unitcell_vectors).copy()
        tric[:, 1, 0] = 1.5  # skew the cell
        t._unitcell = tric
        t.save(tmp_path / "tric.h5")
        back = SingleTraj(tmp_path / "tric.h5")
        np.testing.assert_allclose(back.unitcell_vectors, tric, atol=1e-6)

    @needs_data
    def test_single_traj_on_ensemble_h5_raises_helpfully(self, tmp_path):
        from encodermap_tpu.data import SingleTraj, TrajEnsemble

        t1 = SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb", traj_num=0)
        trajs = TrajEnsemble([t1])
        trajs.save(tmp_path / "ens.h5")
        with pytest.raises(ValueError, match="from_dataset"):
            SingleTraj(tmp_path / "ens.h5").top

    @needs_data
    def test_del_cvs_disconnects_lazy_source(self, tmp_path):
        from encodermap_tpu.data import SingleTraj, TrajEnsemble

        t1 = SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb", traj_num=0)
        trajs = TrajEnsemble([t1])
        trajs.load_CVs(["central_dihedrals"])
        trajs.save(tmp_path / "ens.h5")
        assert trajs._source_h5 is not None
        trajs.del_CVs()
        assert trajs._source_h5 is None
        with pytest.raises(Exception):
            next(trajs.batch_iterator(8, CV_names=["central_dihedrals"]))

    @needs_data
    def test_join_with_vacuum_member(self):
        from encodermap_tpu.data import SingleTraj, TrajEnsemble

        t1 = SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb", traj_num=0)
        t2 = SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb", traj_num=1)
        t1.load(), t2.load()
        t2._unitcell = None  # vacuum member
        joined = TrajEnsemble([t1, t2]).join()
        out = next(iter(joined.values())) if isinstance(joined, dict) \
            else joined
        # boxes are dropped rather than crashing np.concatenate
        assert out is not None

    @needs_data
    def test_tsel_pair_rows_select_frames(self):
        from encodermap_tpu.data import SingleTraj, TrajEnsemble

        t1 = SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb")
        t2 = SingleTraj(DATA / "glu7.xtc", DATA / "glu7.pdb")
        trajs = TrajEnsemble([t1, t2])
        tn = trajs.trajs[1].traj_num  # the glu7 member's actual number
        sel = trajs.tsel[np.array([[tn, 0], [tn, 1]])]
        assert sel.n_trajs == 1
        assert sel.n_frames == 2
        np.testing.assert_allclose(sel.trajs[0].xyz,
                                   trajs.trajs[1][0:2].xyz, atol=1e-6)

    @needs_data
    def test_user_named_custom_feature_kept(self):
        import encodermap_tpu as em
        from encodermap_tpu.data import SingleTraj
        from encodermap_tpu.loading.featurizer import SingleTrajFeaturizer

        traj = SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb")
        f = em.features.CustomFeature(fun=lambda t: t.xyz[:, 0, :1], dim=1)
        f.name = "my_cv"
        feat = SingleTrajFeaturizer(traj)
        feat.add_custom_feature(f)
        out = feat.get_output()
        assert list(out) == ["my_cv"]

    @needs_data
    def test_url_top_distinct_from_traj_is_fetched(self, tmp_path,
                                                   monkeypatch):
        from encodermap_tpu.data import trajectory as T

        calls = []

        def fake_fetch(url, cache_dir="/tmp/em_url_cache"):
            calls.append(url)
            return str(DATA / "asp7.pdb") if url.endswith(".pdb") \
                else str(DATA / "asp7.xtc")

        monkeypatch.setattr(T, "_fetch_url_cached", fake_fetch)
        t = T.SingleTraj("https://example.org/a.xtc",
                         "https://example.org/top.pdb")
        assert t.n_frames == 100
        assert "https://example.org/top.pdb" in calls


class TestWave19NativeHardening:
    """Native decoder guards: header span wrap, smallidx bombs, random
    corruption never crashes the process; build.py race/rebuild safety."""

    def _copy(self, tmp_path):
        import shutil

        p = tmp_path / "c.xtc"
        shutil.copyfile(DATA / "asp7.xtc", p)
        return p

    @needs_data
    def test_span_wrap_header_rejected(self, tmp_path):
        import struct

        from encodermap_tpu.data.xtc import XTCReader

        p = self._copy(tmp_path)
        data = bytearray(p.read_bytes())
        # frame 0 layout: magic+natoms+step+time(16) + box(36) + natoms(4)
        # + lsize(4) + precision(4) = 64 -> minint[3] then maxint[3]
        struct.pack_into(">3i", data, 64, -1000, -1000, -(2**31))
        struct.pack_into(">3i", data, 76, 1000, 1000, 2**31 - 1)
        p.write_bytes(bytes(data))
        with pytest.raises(IOError):
            XTCReader(p).read([0])

    @needs_data
    def test_random_corruption_never_crashes(self, tmp_path):
        """Fuzz the compressed payload: every mutation must either decode
        or raise a Python exception — no SIGFPE/SIGSEGV (which would kill
        pytest itself)."""
        import struct

        from encodermap_tpu.data.xtc import XTCReader

        base = bytearray(self._copy(tmp_path).read_bytes())
        rng = np.random.default_rng(42)
        p = tmp_path / "fuzz.xtc"
        survived = 0
        for _ in range(150):
            data = bytearray(base)
            # corrupt 4 random bytes within the first frame's payload
            for pos in rng.integers(56, min(len(data), 600), size=4):
                data[pos] = int(rng.integers(0, 256))
            p.write_bytes(bytes(data))
            try:
                r = XTCReader(p)
                if r.n_frames:
                    r.read([0])
                survived += 1
            except Exception:
                survived += 1
        assert survived == 150

    def test_empty_xtc_roundtrip(self, tmp_path):
        from encodermap_tpu.data.xtc import XTCReader, write_xtc

        p = tmp_path / "empty.xtc"
        write_xtc(p, np.zeros((0, 5, 3), np.float32))
        r = XTCReader(p)
        assert r.n_frames == 0
        xyz, box, t, s = r.read()
        assert xyz.shape[0] == 0 and xyz.shape[2] == 3

    def test_build_library_concurrent_and_rebuilds(self, tmp_path):
        import shutil
        import threading

        from encodermap_tpu.data import native
        from encodermap_tpu.data.native import build as B

        so = B._HERE / "libxdr_xtc.so"
        backup = so.read_bytes() if so.exists() else None
        try:
            B._LIB.clear()
            so.unlink(missing_ok=True)
            results = []

            def worker():
                results.append(B.load_library("xdr_xtc"))

            ts = [threading.Thread(target=worker) for _ in range(4)]
            [t.start() for t in ts]
            [t.join() for t in ts]
            assert all(r is not None for r in results)
            # corrupt binary triggers ONE rebuild instead of permanent None
            B._LIB.clear()
            so.write_bytes(b"not a shared object")
            import os
            import time

            os.utime(so, (time.time() + 60, time.time() + 60))
            assert B.load_library("xdr_xtc") is not None
        finally:
            B._LIB.clear()
            if backup is not None and not so.exists():
                so.write_bytes(backup)
            B.load_library("xdr_xtc")


class TestWave21Fixes:
    """Round-4 continuation review wave: yaml code-tuple round-trip,
    save() validate-before-truncate, magnitude-based unit guards,
    host-numpy sigmoid-tuning distances, memoized topology patching."""

    def test_custom_topology_yaml_roundtrip_with_code(self, tmp_path):
        """to_yaml/from_yaml must round-trip residues WITH a one-letter
        code: yaml serializes the (code, tables) tuple as a list, which
        from_custom_aas previously fed to dict() and crashed."""
        from encodermap_tpu.data import SingleTraj
        from encodermap_tpu.data.custom_topology import CustomTopology

        t = SingleTraj("/root/reference/tests/data/asp7.pdb")
        ct = CustomTopology.from_custom_aas(
            t.top, {"ASP": ("D", {"CHI1": ["N", "CA", "CB", "CG"]})}
        )
        rt = CustomTopology.from_yaml(ct.to_yaml(), t.top)
        assert rt._one_letter_codes == {"ASP": "D"}
        assert rt._custom_chi["chi1"]["ASP"] == ["N", "CA", "CB", "CG"]
        # not_* markers survive inside the code tuple too
        ct2 = CustomTopology.from_custom_aas(
            t.top, {"ASP": ("D", {"not_OMEGA": True})}
        )
        rt2 = CustomTopology.from_yaml(ct2.to_yaml(), t.top)
        assert ("OMEGA", "ASP") in rt2._not_dihedrals

    def test_save_validates_cv_names_before_truncating(self, tmp_path):
        """A typo'd CV name must not destroy an existing h5 file (the
        'w' mode truncates) — on SingleTraj.save and TrajEnsemble.save."""
        import pytest

        from encodermap_tpu.data import SingleTraj, TrajEnsemble

        t = SingleTraj("/root/reference/tests/data/asp7.pdb")
        t.load_CV(np.arange(len(t), dtype=np.float32)[:, None], "lowd")
        p = tmp_path / "traj.h5"
        t.save(p)
        size = p.stat().st_size
        with pytest.raises(KeyError, match="lowd_typo"):
            t.save(p, CVs=["lowd_typo"], overwrite=True)
        assert p.stat().st_size == size  # untouched
        with pytest.raises(ValueError, match="CVs must be"):
            t.save(p, CVs=42, overwrite=True)
        assert p.stat().st_size == size
        SingleTraj(p)  # still loadable

        ens = TrajEnsemble([t])
        pe = tmp_path / "ens.h5"
        ens.save(pe)
        size_e = pe.stat().st_size
        with pytest.raises(KeyError, match="lowd_typo"):
            ens.save(pe, CVs=["lowd_typo"], overwrite=True)
        assert pe.stat().st_size == size_e

    def test_ramachandran_all_negative_degrees(self):
        """All-negative degree data (a pure alpha-helix basin) must be
        detected as degrees — the reference's signed np.all(psi < 4)
        check would clip every point out of a [-pi, pi] range."""
        import matplotlib.pyplot as plt

        from encodermap_tpu.plot import plot_ramachandran

        rng = np.random.default_rng(5)
        psi = rng.uniform(-70, -20, (20, 6))  # deg, all negative
        phi = rng.uniform(-80, -40, (20, 6))
        fig, ax = plt.subplots()
        try:
            plot_ramachandran((psi, phi), ax=ax)
            counts = ax.collections[-1].get_array()
            assert float(np.sum(counts)) == 20 * 6  # nothing clipped
            assert ax.get_xlim() == (-180.0, 180.0)
        finally:
            plt.close(fig)

    def test_backmapping_unit_guards_use_magnitude(self):
        """All-negative degree arrays are legitimate degree data (typical
        all-phi selections); the guard must test |d| > pi, not d > pi."""
        import pytest

        from encodermap_tpu.data import SingleTraj, TrajEnsemble
        from encodermap_tpu.loading.features import CentralDihedrals
        from encodermap_tpu.misc.backmapping_offline import (
            mdtraj_backmapping,
        )

        t = SingleTraj("/root/reference/tests/data/asp7.pdb")
        trajs = TrajEnsemble([t])
        n_c = len(CentralDihedrals(t.top)._indices)
        rng = np.random.default_rng(6)
        deg_neg = rng.uniform(-180.0, -10.0, (2, n_c)).astype(np.float32)
        # correctly labeled all-negative degrees: accepted
        out = mdtraj_backmapping(
            trajs=trajs, dihedrals=deg_neg, angle_type="degree"
        )
        assert np.isfinite(np.asarray(out)).all()
        # the same values mislabeled as radians: rejected on magnitude
        with pytest.raises(ValueError, match="look like degrees"):
            mdtraj_backmapping(
                trajs=trajs, dihedrals=deg_neg, angle_type="radian"
            )

    def test_subsampled_pdists_host_numpy_matches_ops(self):
        """The sigmoid-tuning histogram distances are host numpy (no XLA
        compile in a plotting helper) but must match the jitted ops
        conventions to float32 fidelity, periodic and not."""
        from encodermap_tpu.ops.distances import (
            pairwise_dist,
            pairwise_dist_periodic,
        )
        from encodermap_tpu.plot.plotting import _subsampled_pdists

        rng = np.random.default_rng(7)
        data = rng.uniform(-np.pi, np.pi, (40, 18)).astype(np.float32)
        iu = np.triu_indices(len(data), k=1)

        host = _subsampled_pdists(data, float("inf"))
        ops_flat = np.asarray(pairwise_dist(data, flat=True))[0]
        np.testing.assert_allclose(host, ops_flat, atol=1e-5)

        host_p = _subsampled_pdists(data, 2 * np.pi)
        ops_p = np.asarray(
            pairwise_dist_periodic(data, 2 * np.pi))[iu]
        np.testing.assert_allclose(host_p, ops_p, atol=1e-5)

    def test_patched_topology_memoized(self):
        """indices_chi1..5 reads reuse ONE patched topology; any
        definition mutation invalidates the cache."""
        from encodermap_tpu.data import SingleTraj
        from encodermap_tpu.data.custom_topology import CustomTopology

        t = SingleTraj("/root/reference/tests/data/asp7.pdb")
        ct = CustomTopology.from_custom_aas(
            t.top, {"ASP": {"CHI1": ["N", "CA", "CB", "CG"]}}
        )
        assert ct._patched() is ct._patched()
        before = ct.indices_chi1.copy()
        ct.remove_dihedral("OMEGA", "ASP")  # mutation -> fresh patch
        after = ct._patched()
        assert after is not None and ct._patched() is after
        np.testing.assert_array_equal(ct.indices_chi1, before)


class TestAdviceR4Fixes:
    """Round-4 advisor findings: MolData must load side_dihedrals when
    absent, ensemble save rejects stray CVs values, topology fingerprint
    in the patch cache key."""

    @needs_data
    def test_moldata_loads_missing_side_dihedrals(self):
        """A chi-bearing traj that arrives with only the four central CVs
        must trigger a load, not silently get an (n, 0) array."""
        import encodermap_tpu as em
        from encodermap_tpu.moldata import MolData

        t = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))
        trajs = em.TrajEnsemble([t])
        trajs.load_CVs([
            "central_angles", "central_dihedrals",
            "central_cartesians", "central_distances",
        ])
        assert "side_dihedrals" not in trajs.CVs
        md = MolData(trajs)
        assert md.sidedihedrals.shape[1] > 0  # asp7 has chi dihedrals

    @needs_data
    def test_moldata_chiless_still_falls_back(self):
        """Chi-less peptides (no side dihedrals at all) still get the
        (n, 0) fallback after the reload attempt."""
        import encodermap_tpu as em
        from encodermap_tpu.moldata import MolData

        t = em.load(str(DATA / "Ala10_helix.xtc"),
                    str(DATA / "Ala10_helix.pdb"))
        md = MolData(em.TrajEnsemble([t]))
        assert md.sidedihedrals.shape == (len(t), 0)

    @needs_data
    def test_ensemble_save_rejects_stray_cvs_value(self, tmp_path):
        """A stray non-'all' string/scalar must raise instead of silently
        saving every CV (parity with SingleTraj.save's guard)."""
        from encodermap_tpu.data import SingleTraj, TrajEnsemble

        t = SingleTraj(str(DATA / "asp7.pdb"))
        t.load_CV(np.arange(len(t), dtype=np.float32)[:, None], "lowd")
        ens = TrajEnsemble([t])
        p = tmp_path / "e.h5"
        ens.save(p)
        size = p.stat().st_size
        with pytest.raises(ValueError, match="CVs must be"):
            ens.save(p, CVs="lowd", overwrite=True)
        assert p.stat().st_size == size  # raised before truncation

    @needs_data
    def test_patch_cache_keyed_on_topology_fingerprint(self):
        """In-place mutation of the bound topology invalidates the
        memoized patched topology (not just definition mutations)."""
        from encodermap_tpu.data import SingleTraj
        from encodermap_tpu.data.custom_topology import CustomTopology

        t = SingleTraj(str(DATA / "asp7.pdb"))
        ct = CustomTopology.from_custom_aas(
            t.top, {"ASP": {"CHI1": ["N", "CA", "CB", "CG"]}}
        )
        first = ct._patched()
        assert ct._patched() is first
        r = ct.top.add_residue("ALA", 99, 0)
        for name in ("N", "CA", "C", "O"):
            ct.top.add_atom(name, name[0], r)
        assert ct._patched() is not first  # fingerprint changed


class TestWave22Fixes:
    """Round-5 review wave over the round-5 feature commits: multimer
    encode() input guard, generate() backend on CV-dict models, patch-cache
    fingerprint vs in-place renames, MolData chi-less re-featurization."""

    def test_multimer_encode_rejects_short_tuple(self, tmp_path):
        """The multimer encoder needs REAL cartesians for its pairwise
        block; the documented short-tuple form must raise clearly, not
        die with an opaque matmul shape error."""
        import encodermap_tpu as em
        from tests.test_multimer import _dimer_cvs, _multimer_params

        rng = np.random.default_rng(3)
        cvs = _dimer_cvs(rng, F=16)
        p = _multimer_params(tmp_path)
        emap = em.AngleDihedralCartesianEncoderMap(cvs, p, read_only=True)
        with pytest.raises(ValueError, match="pairwise-distance block"):
            emap.encode((cvs["central_angles"], cvs["central_dihedrals"],
                         cvs["side_dihedrals"]))
        # stacked feature matrices have no cartesians either
        stacked = np.concatenate(
            [cvs["central_angles"], cvs["central_dihedrals"],
             cvs["side_dihedrals"]], axis=1)
        with pytest.raises(ValueError, match="pairwise-distance block"):
            emap.encode(stacked)
        # the full tuple and the training CVs still work
        lat = emap.encode()
        assert lat.shape == (16, 2)

    def test_generate_topology_backend_on_cv_dict_model(self, tmp_path):
        """backend='mdtraj'/'mdanalysis' on a CV-dict-constructed model
        (self.trajs is a raw dict) must raise the helpful no-topology
        error, not AttributeError on trajs.top."""
        import encodermap_tpu as em

        rng = np.random.default_rng(0)
        F, n_res = 16, 5
        n = 3 * n_res
        cvs = {
            "central_angles": rng.uniform(1.7, 2.4, (F, n - 2)).astype(
                np.float32),
            "central_dihedrals": rng.uniform(
                -np.pi, np.pi, (F, n - 3)).astype(np.float32),
            "central_cartesians": rng.uniform(0, 2, (F, n, 3)).astype(
                np.float32),
            "central_distances": rng.uniform(0.12, 0.16, (F, n - 1)).astype(
                np.float32),
            "side_dihedrals": rng.uniform(-np.pi, np.pi, (F, 4)).astype(
                np.float32),
        }
        p = em.ADCParameters(
            use_backbone_angles=True, use_sidechains=True,
            n_neurons=[16, 16, 2], main_path=str(tmp_path))
        emap = em.AngleDihedralCartesianEncoderMap(cvs, p, read_only=True)
        for backend in ("mdtraj", "mdanalysis"):
            with pytest.raises(ValueError, match="constructed from CV"):
                emap.generate(np.zeros((2, 2), np.float32), backend=backend)

    def test_patch_cache_invalidates_on_inplace_rename(self):
        """Renames that keep n_atoms/n_residues (HIS->HID, atom renames)
        must invalidate the memoized patched topology — the count-only
        fingerprint missed them."""
        from encodermap_tpu.data.custom_topology import CustomTopology
        from encodermap_tpu.data.topology import Topology

        t = Topology()
        r = t.add_residue("HIS", 1, 0)
        for n, e in [("N", "N"), ("CA", "C"), ("C", "C"), ("O", "O"),
                     ("CB", "C"), ("CG", "C"), ("ND1", "N"), ("CD2", "C")]:
            t.add_atom(n, e, r)
        ct = CustomTopology(t)
        assert len(ct.indices_chi1) == 1
        t.atoms[5].name = "CGX"  # break chi1's 4th atom IN PLACE
        assert len(ct.indices_chi1) == 0  # stale cache would still say 1

    @needs_data
    def test_moldata_chiless_does_not_refeaturize(self):
        """Chi-less peptides can never satisfy a side_dihedrals CV; the
        'needed' trigger must not re-run load_CVs('all') on every MolData
        construction."""
        import encodermap_tpu as em
        from encodermap_tpu.moldata import MolData

        t = em.load(str(DATA / "Ala10_helix.xtc"),
                    str(DATA / "Ala10_helix.pdb"))
        trajs = em.TrajEnsemble([t])
        md = MolData(trajs)  # first construction loads the central CVs
        assert md.sidedihedrals.shape == (len(t), 0)

        def _boom(*a, **k):  # second construction must not featurize
            raise AssertionError("MolData re-ran load_CVs on a chi-less "
                                 "trajectory with CVs already loaded")

        trajs.load_CVs = _boom
        md2 = MolData(trajs)
        assert md2.sidedihedrals.shape == (len(t), 0)


class TestWave23PlotParity:
    """Plot-module review wave: reference parameter/return parity and
    crash fixes in plotting.py / interactive.py."""

    def test_free_energy_minener_zero_kwarg(self):
        from encodermap_tpu.plot import get_free_energy, to_free_energy

        rng = np.random.default_rng(0)
        x, y = rng.standard_normal((2, 400))
        # reference-compatible call must not TypeError, default unshifted
        _, _, F = get_free_energy(x, y, bins=10, minener_zero=False)
        _, _, F0 = get_free_energy(x, y, bins=10, minener_zero=True)
        assert np.nanmin(F0[np.isfinite(F0)]) == 0.0
        assert np.nanmin(F[np.isfinite(F)]) > 0.0
        D = np.array([[0.5, 0.25], [0.25, 0.0]])
        F = to_free_energy(D, kT=2.0, minener_zero=True)
        assert F[0, 0] == 0.0 and np.isinf(F[1, 1])

    def test_digitize_dssp_abc_mixing(self):
        """Colors follow the reference's abc_to_rgb complement mixing:
        pure helix -> cyan, not red."""
        from encodermap_tpu.plot.plotting import digitize_dssp

        dssp = np.full((4, 10), "H")  # all-helix frames
        colors = digitize_dssp(np.zeros((4, 2)), dssp, imshow=False)
        np.testing.assert_allclose(colors, [[0.0, 1.0, 1.0]] * 4)
        img = digitize_dssp(
            np.random.default_rng(0).standard_normal((4, 2)), dssp, bins=5)
        populated = ~np.all(img == 1.0, axis=-1)
        assert populated.any()
        np.testing.assert_allclose(
            img[populated],
            np.tile([0.0, 1.0, 1.0], (int(populated.sum()), 1)),
        )

    def test_distance_histogram_returns_three_axes(self):
        from encodermap_tpu.plot import distance_histogram

        rng = np.random.default_rng(0)
        data = rng.uniform(-np.pi, np.pi, (100, 6))
        ax1, ax2, ax3 = distance_histogram(data, 2 * np.pi,
                                           (4.5, 12, 6, 1, 2, 6))
        # ax2 is ax1's twinx and carries the sigmoid curves
        assert ax2.figure is ax1.figure and len(ax2.lines) >= 2
        assert ax3 is not ax1

    @needs_data
    def test_plot_end2end_reference_kwargs(self, tmp_path):
        import encodermap_tpu as em
        from encodermap_tpu.plot import plot_end2end

        t = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))
        out = plot_end2end(t, selstr="name CA", subsample=2,
                           rolling_avg_window=3,
                           save_path=tmp_path / "e2e.png")
        assert Path(out).stat().st_size > 0

    @needs_data
    def test_plot_cluster_accepts_single_traj(self, tmp_path):
        import encodermap_tpu as em
        from encodermap_tpu.plot import plot_cluster

        t = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))
        n = len(t)
        membership = np.full(n, -1)
        membership[:5] = 0
        latent = np.random.default_rng(0).standard_normal((n, 2))
        res = plot_cluster(t, 0, membership, latent, tmp_path / "c0")
        assert res["n_frames"] == 5 and "pdb" in res

    def test_dssp_name_tables_agree(self):
        """The plot_dssp legend names and dssp_to_text are one table."""
        from encodermap_tpu.plot.plotting import (
            _DSSP_NAMES_FULL, _DSSP_NAMES_SIMPLE, dssp_to_text)

        for code, name in _DSSP_NAMES_FULL.items():
            assert dssp_to_text(code) == name, code
        for code, name in _DSSP_NAMES_SIMPLE.items():
            assert dssp_to_text(code, simplified=True) == name, code

    def test_path_scrubber_clamps_single_point_path(self):
        from types import SimpleNamespace

        from encodermap_tpu.plot import interactive_path_visualization

        rng = np.random.default_rng(0)
        box = interactive_path_visualization(
            SimpleNamespace(xyz=np.zeros((1, 5, 3))),
            rng.standard_normal((50, 2)),
            rng.standard_normal((1, 2)).astype(np.float32),
        )
        box._on_change({"new": 1})  # would previously show an empty marker
        dot = box._figure.axes[0].lines[-1]
        assert len(dot.get_xdata()) == 1


class TestWave24DataApiParity:
    """data/api + kondata + format review wave: reference signature
    parity for load/load_project/get_from_kondata, format interop."""

    def _local_project(self, tmp_path, monkeypatch, n_frames=6):
        from encodermap_tpu.data import SingleTraj

        project = tmp_path / "mirror" / "proj24"
        project.mkdir(parents=True)
        t = SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb")[0:n_frames]
        t.save(project / "trajs.h5")
        monkeypatch.setenv("ENCODERMAP_DATA_DIR", str(tmp_path / "mirror"))
        return project

    @needs_data
    def test_load_project_reference_defaults(self, tmp_path, monkeypatch):
        """Default load_autoencoder=False (ensemble only, no tuple);
        traj > -1 selects a SingleTraj; other negatives mean 'all'."""
        import encodermap_tpu as em
        from encodermap_tpu.data import SingleTraj, TrajEnsemble

        self._local_project(tmp_path, monkeypatch)
        out = em.load_project("proj24")  # no kwargs, like reference code
        assert isinstance(out, TrajEnsemble)
        sel = em.load_project("proj24", traj=0)
        assert isinstance(sel, SingleTraj)
        allt = em.load_project("proj24", traj=-2)  # reference: traj > -1
        assert isinstance(allt, TrajEnsemble)

    def test_get_from_kondata_positional_force_overwrite(
            self, tmp_path, monkeypatch):
        """Reference signature order: 3rd positional is force_overwrite
        (not this package's mirror_dirs), and it skips the local copy."""
        import urllib.request

        from encodermap_tpu.kondata import get_from_kondata

        out = tmp_path / "dset"
        out.mkdir()
        (out / "data.txt").write_text("local")

        # without force_overwrite the local copy wins
        assert get_from_kondata("dset", out) == str(out)

        def boom(url, target):
            raise OSError("no egress")

        monkeypatch.setattr(urllib.request, "urlretrieve", boom)
        with pytest.raises(RuntimeError, match="could not be downloaded"):
            get_from_kondata("dset", out, True)  # positional like reference

    def test_get_from_kondata_mk_parentdir(self, tmp_path, monkeypatch):
        import urllib.request

        from encodermap_tpu.kondata import get_from_kondata

        target = tmp_path / "missing_parent" / "dset"
        with pytest.raises(FileNotFoundError, match="mk_parentdir"):
            get_from_kondata("dset", target)

        def boom(url, t):
            raise OSError("no egress")

        monkeypatch.setattr(urllib.request, "urlretrieve", boom)
        with pytest.raises(RuntimeError):  # parent created, download fails
            get_from_kondata("dset", target, mk_parentdir=True)
        assert target.parent.is_dir()

    def test_get_from_kondata_stray_file_candidate(self, tmp_path,
                                                   monkeypatch):
        """A regular FILE where the dataset dir would be must not crash
        with NotADirectoryError before the curated error."""
        import urllib.request

        from encodermap_tpu.kondata import get_from_kondata

        stray = tmp_path / "dset"
        stray.write_text("not a directory")
        monkeypatch.setattr(
            urllib.request, "urlretrieve",
            lambda u, t: (_ for _ in ()).throw(OSError("no egress")))
        with pytest.raises(RuntimeError, match="not available locally"):
            get_from_kondata("dset", stray)

    @needs_data
    def test_load_forwards_backend_and_common_str(self, tmp_path):
        import encodermap_tpu as em

        t = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"),
                    common_str="prod")
        assert t.common_str == "prod"
        # backend='mdtraj' errors at construction for a missing file
        with pytest.raises(Exception):
            em.load(str(tmp_path / "nope.xtc"), str(DATA / "asp7.pdb"),
                    backend="mdtraj")
        ens = em.load([str(DATA / "asp7.xtc"), str(DATA / "glu7.xtc")],
                      [str(DATA / "asp7.pdb"), str(DATA / "glu7.pdb")],
                      common_str=["asp7", "glu7"], backend="mdtraj")
        assert ens.n_trajs == 2 and ens.n_frames > 0
        # and the eager error surfaces for ensembles too
        with pytest.raises(Exception):
            em.load([str(tmp_path / "nope.xtc")], [str(DATA / "asp7.pdb")],
                    backend="mdtraj")

    @needs_data
    def test_load_h5_returns_ensemble(self, tmp_path):
        """Reference dispatch (__init__.py:505-509): single .h5 paths go
        to TrajEnsemble, never SingleTraj."""
        import encodermap_tpu as em
        from encodermap_tpu.data import SingleTraj, TrajEnsemble

        t1 = SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb", traj_num=0)
        t2 = SingleTraj(DATA / "glu7.xtc", DATA / "glu7.pdb", traj_num=1)
        ens_h5 = tmp_path / "ens.h5"
        TrajEnsemble([t1, t2]).save(ens_h5)
        out = em.load(str(ens_h5))
        assert isinstance(out, TrajEnsemble) and out.n_trajs == 2

        single_h5 = tmp_path / "single.h5"
        t1[0:5].save(single_h5)
        out = em.load(str(single_h5))
        assert isinstance(out, TrajEnsemble) and out.n_trajs == 1
        assert out.trajs[0].n_frames == 5

    def test_dcd_writer_sets_charmm_version(self, tmp_path):
        """icntrl[19] must be non-zero or VMD/mdtraj read the cell record
        as coordinates (X-PLOR format has no cell block)."""
        import struct

        from encodermap_tpu.data.formats import write_dcd

        xyz = np.zeros((2, 3, 3), np.float32)
        p = tmp_path / "t.dcd"
        write_dcd(p, xyz, cell_lengths=np.full((2, 3), 2.0, np.float32))
        raw = p.read_bytes()
        icntrl = struct.unpack("<20i", raw[8:88])
        assert icntrl[10] == 1 and icntrl[19] != 0

    def test_gro_empty_intermediate_title(self, tmp_path):
        """A blank title line on frame 2+ is legal GRO; only pure trailing
        blanks end the file."""
        from encodermap_tpu.data.formats import load_gro

        atom = "    1ALA      N    1   1.000   2.000   3.000"
        frame = ["t", "1", atom, "   5.0   5.0   5.0"]
        frame2 = ["", "1", atom.replace("1.000", "1.500"),
                  "   5.0   5.0   5.0"]
        p = tmp_path / "t.gro"
        p.write_text("\n".join(frame + frame2 + ["", ""]))
        top, xyz, box = load_gro(p)
        assert xyz.shape == (2, 1, 3)
        assert abs(xyz[1, 0, 0] - 1.5) < 1e-6

    def test_gro_two_letter_elements(self, tmp_path):
        from encodermap_tpu.data.formats import load_gro

        lines = [
            "ions", "2",
            "    1CL      CL    1   1.000   2.000   3.000",
            "    2NA      NA    2   2.000   3.000   4.000",
            "   5.0   5.0   5.0",
        ]
        p = tmp_path / "i.gro"
        p.write_text("\n".join(lines))
        top, _, _ = load_gro(p)
        assert top.atoms[0].element == "CL"
        assert top.atoms[1].element == "NA"

    def test_pdb_write_clamps_long_atom_names(self, tmp_path):
        """A 5-char atom name (legal in GRO) must not shift PDB columns."""
        from encodermap_tpu.data.pdb import load_pdb, write_pdb
        from encodermap_tpu.data.topology import Topology

        top = Topology()
        r = top.add_residue("ALA", 1, 0)
        top.add_atom("HD11X", "H", r)  # 5 chars
        top.add_atom("CA", "C", r)
        xyz = np.array([[[0.1, 0.2, 0.3], [0.4, 0.5, 0.6]]], np.float32)
        p = tmp_path / "t.pdb"
        write_pdb(p, top, xyz)
        top2, xyz2, _ = load_pdb(p)
        np.testing.assert_allclose(xyz2, xyz, atol=1e-3)
        assert top2.atoms[0].name == "HD11"  # clamped, columns intact


class TestWave25TrainInfra:
    """train/core + callbacks + summaries + saving review wave."""

    def test_plain_streaming_from_hdf5batchsource(self, tmp_path):
        """The DOCUMENTED streaming path: plain EncoderMap driven directly
        by an HDF5BatchSource (1-tuple superbatches must unwrap)."""
        import h5py

        import encodermap_tpu as em
        from encodermap_tpu.train.core import HDF5BatchSource

        rng = np.random.default_rng(0)
        data = rng.standard_normal((512, 4)).astype(np.float32)
        h5 = tmp_path / "d.h5"
        with h5py.File(h5, "w") as f:
            f.create_dataset("features", data=data)
        p = em.Parameters(main_path=str(tmp_path / "run"), n_steps=20,
                          steps_per_scan=10, batch_size=32,
                          periodicity=float("inf"), seed=0,
                          fused_trainer=False)
        emap = em.EncoderMap(p, data[:8])
        src = HDF5BatchSource(h5, ["features"], 32, 10)
        hist = emap.train_streaming(src)
        assert len(hist["loss"]) == 20
        assert np.isfinite(hist["loss"]).all()

    def test_hdf5batchsource_flat_group_wins_over_stray_traj_items(
            self, tmp_path):
        import h5py

        from encodermap_tpu.train.core import HDF5BatchSource

        h5 = tmp_path / "d.h5"
        with h5py.File(h5, "w") as f:
            g = f.create_group("CVs")
            g.create_dataset("x", data=np.zeros((64, 3), np.float32))
            f.create_dataset("traj_0", data=np.zeros(3))   # stray DATASET
            f.create_group("traj_joined")                  # unparsable num
        src = HDF5BatchSource(h5, ["x"], 8, 2, group="CVs")
        batch = next(iter(src))
        assert batch[0].shape == (2, 8, 3)
        src.close()

    def test_checkpoint_and_image_step_zero_disable(self, tmp_path):
        import encodermap_tpu as em
        from encodermap_tpu.train.callbacks import CheckpointSaver, ImageCallback

        data, _ = em.create_n_cube(3, points_along_edge=10, seed=1)
        p = em.Parameters(main_path=str(tmp_path / "r"), n_steps=10,
                          steps_per_scan=5, batch_size=16,
                          periodicity=float("inf"), seed=1)
        emap = em.EncoderMap(p, data, read_only=True)
        metrics = {"loss": np.zeros(5)}
        CheckpointSaver(emap, 0).on_chunk_end(0, metrics)   # no ZeroDivision
        ImageCallback(emap, 0).on_chunk_end(0, metrics)
        assert not list(Path(tmp_path, "r").glob("saved_model_*"))

    def test_image_summary_inf_and_1d_latents(self, tmp_path):
        from encodermap_tpu.misc.summaries import image_summary

        inf_latent = np.array([[1.0, np.inf], [0.0, 1.0]], np.float32)
        out = image_summary(inf_latent, 1, tmp_path)   # must not raise
        assert Path(out).exists()
        lat1d = np.random.default_rng(0).standard_normal((50, 1))
        out = image_summary(lat1d, 2, tmp_path)
        assert Path(out).exists()

    def test_renamed_checkpoint_warns_not_silent(self, tmp_path):
        import warnings

        from encodermap_tpu.misc.saving import (load_checkpoint,
                                                load_checkpoint_rng,
                                                save_pytree)

        f = tmp_path / "best_model"  # renamed checkpoint, no .npz suffix
        save_pytree({"w": np.zeros(3)}, tmp_path / "t.npz")
        (tmp_path / "t.npz").rename(f)
        import shutil
        shutil.copyfile(f, str(f) + ".npz")
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            load_checkpoint(f)
            assert any("sidecar" in str(x.message) for x in w)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            assert load_checkpoint_rng(f) is None
            assert any("sidecar" in str(x.message) for x in w)

    def test_streaming_runs_callbacks_and_writes_metrics(self, tmp_path):
        """run_streaming fires the same callback/metric machinery as the
        in-memory loop: checkpoints appear, JSONL rows are written with
        the first_step+i+1 labels, images fire at image_step."""
        import json

        import h5py

        import encodermap_tpu as em
        from encodermap_tpu.train.core import HDF5BatchSource

        rng = np.random.default_rng(0)
        data = rng.standard_normal((512, 4)).astype(np.float32)
        h5 = tmp_path / "d.h5"
        with h5py.File(h5, "w") as f:
            f.create_dataset("features", data=data)
        run = tmp_path / "run"
        p = em.Parameters(main_path=str(run), n_steps=40, steps_per_scan=20,
                          batch_size=32, periodicity=float("inf"), seed=0,
                          checkpoint_step=20, summary_step=1,
                          fused_trainer=False)
        emap = em.EncoderMap(p, data[:8])
        emap.add_images_to_tensorboard(image_step=20)
        emap.train_streaming(HDF5BatchSource(h5, ["features"], 32, 20))
        assert (run / "saved_model_20.npz").exists()  # CheckpointSaver ran
        assert list(run.glob("latent_*.png"))         # ImageCallback ran
        rows = [json.loads(l) for l in
                (run / "train_metrics.jsonl").read_text().splitlines()]
        steps = [r["step"] for r in rows if "loss" in r]
        assert steps[0] == 1 and steps[-1] == 40      # first_step+i+1 labels

    def test_streaming_nan_interrupt_no_persist(self, tmp_path):
        """A NaN mid-stream stops training and does NOT overwrite the last
        finite checkpoint/parameters.json (same contract as train())."""
        import h5py

        import encodermap_tpu as em
        from encodermap_tpu.train.core import HDF5BatchSource

        data = np.random.default_rng(0).standard_normal(
            (256, 4)).astype(np.float32)
        data[128:] = np.nan  # second half poisons the stream
        h5 = tmp_path / "d.h5"
        with h5py.File(h5, "w") as f:
            f.create_dataset("features", data=data)
        run = tmp_path / "run"
        p = em.Parameters(main_path=str(run), n_steps=40, steps_per_scan=10,
                          batch_size=256, periodicity=float("inf"), seed=0,
                          checkpoint_step=1000, fused_trainer=False)
        emap = em.EncoderMap(p, data[:8])
        src = HDF5BatchSource(h5, ["features"], 256, 10,
                              slab_frames=256, n_windows=1)
        hist = emap.train_streaming(src)
        assert len(hist["loss"]) < 40        # interrupted early
        import json as _json
        saved = _json.loads((run / "parameters.json").read_text()) \
            if (run / "parameters.json").exists() else {}
        assert saved.get("current_training_step", 0) == 0  # not persisted


class TestWave26ParallelMisc:
    """parallel/ + misc matching/clustering + alignment review wave."""

    def test_match_files_tie_breaks_by_list_order(self):
        from encodermap_tpu.misc.misc import match_files

        tops, cs = match_files(
            ["/d/asp7_long.xtc"], ["asp7.pdb", "asp7_long.pdb"],
            ["asp7", "asp7_long"],
        )
        # reference: rightmost-occurrence tail, FIRST list entry found in
        # it wins — 'asp7' (misc.py:236-238), not the lexicographic max
        assert cs == ["asp7"] and tops == ["asp7.pdb"]

    def test_common_str_no_silent_topology_fallback(self):
        from encodermap_tpu.misc.misc import get_full_common_str_and_ref

        with pytest.raises(Exception, match="does not match|No topology"):
            get_full_common_str_and_ref(
                ["a_1.xtc", "b_2.xtc"], ["a_top.pdb", "x_top.pdb"],
                ["a_", "b_"],
            )

    def test_single_top_no_common_str_uses_stems(self):
        from encodermap_tpu.misc.misc import get_full_common_str_and_ref

        _, tops, cs = get_full_common_str_and_ref(
            ["runs/x.xtc", "runs/y.xtc"], ["top.pdb"], [])
        assert tops == ["top.pdb", "top.pdb"]
        assert cs == ["x", "y"]  # reference misc.py:320-321

    @needs_data
    def test_cluster_to_dict_reference_contract(self):
        import encodermap_tpu as em

        t = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))
        trajs = em.TrajEnsemble([t])
        membership = np.full(trajs.n_frames, -1)
        membership[::4] = 0
        trajs.load_CVs(membership, "cluster_membership")
        cluster = trajs.cluster(0)
        from encodermap_tpu.misc.clustering import cluster_to_dict

        d = cluster_to_dict(cluster)
        assert {"ensemble", "series", "joined_per_top", "joined",
                "stacked"} <= set(d)
        n = int((membership == 0).sum())
        assert d["joined"].n_frames == n
        assert d["stacked"].n_frames == 1
        assert d["stacked"].n_atoms == n * t.n_atoms
        assert len(d["series"]) == n and set(d["series"]) == {0}
        # legacy int-array form still works
        legacy = cluster_to_dict(np.array([0, 0, 1, -1]))
        assert set(legacy) == {0, 1}

    def test_alignment_unmapped_residues_never_collide(self):
        import warnings

        from encodermap_tpu.loading.alignment import apply_alignment_to_labels

        res_to_col = {1: 3, 2: 5, 3: 9}  # residue 9 NOT covered
        # PSI maps ordinal -> same residue (PHI shifts by one, wave 32)
        labels = ["CENTERDIH PSI   3", "CENTERDIH PSI   9"]
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            out = apply_alignment_to_labels(labels, res_to_col)
            assert any("not covered" in str(x.message) for x in w)
        assert out[0].endswith(" 9")          # residue 3 -> column 9
        assert not out[1].endswith(" 9")      # unmapped must NOT collide
        assert len(set(out)) == 2

    def test_make_mesh_clear_error_on_too_many_devices(self):
        import jax

        from encodermap_tpu.parallel.mesh import make_mesh

        n = len(jax.devices())
        with pytest.raises(ValueError, match="only"):
            make_mesh(n_devices=2 * n, tp=2)

    @needs_data
    def test_sharded_to_hdf5_preserves_custom_dtype(self, tmp_path):
        import h5py

        import encodermap_tpu as em
        from encodermap_tpu.loading import CustomFeature
        from encodermap_tpu.parallel.sharded_featurize import ShardedFeaturizer

        t = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))

        def com_f64(traj):
            return np.asarray(traj.xyz, np.float64).mean(axis=1)

        feat = CustomFeature(com_f64, 3)
        sf = ShardedFeaturizer(t)
        sf.add_custom_feature(feat)
        out = sf.get_output()
        name = [k for k in out.keys()][0]
        native = out.entry(name).data
        p = tmp_path / "cv.h5"
        sf.to_hdf5(p)
        with h5py.File(p, "r") as f:
            stored = f["CVs"][name][:]
        assert stored.dtype == native.dtype == np.float64
        np.testing.assert_array_equal(stored, native)


class TestWave27OfflineBackmapLossesCVStore:
    """backmapping_offline + loss_classes + cvstore review wave."""

    @needs_data
    def test_legacy_block_order_rotates_right_dihedrals(self):
        """dihedral_backmapping consumes the reference's BLOCK layout
        (all psi, all omega, all phi) — each column must end up at its
        target, which the interleaved central-CV mapping would scramble."""
        import encodermap_tpu as em
        from encodermap_tpu.misc.backmapping_offline import (
            dihedral_backmapping)
        from encodermap_tpu.ops.geometry import compute_dihedrals

        traj = em.load(str(DATA / "asp7.pdb"))
        top = traj.top
        psi = np.asarray(top.indices_psi).reshape(-1, 4)
        omega = np.asarray(top.indices_omega).reshape(-1, 4)
        phi = np.asarray(top.indices_phi).reshape(-1, 4)
        rng = np.random.default_rng(1)
        targets = np.concatenate([
            rng.uniform(-2.5, 2.5, len(psi)),
            np.full(len(omega), np.pi * 0.98),   # near-trans omegas
            rng.uniform(-2.5, 2.5, len(phi)),
        ]).astype(np.float32)[None]
        out = dihedral_backmapping(str(DATA / "asp7.pdb"), targets)
        got_psi = np.asarray(compute_dihedrals(out, psi))[0]
        got_phi = np.asarray(compute_dihedrals(out, phi))[0]
        np.testing.assert_allclose(got_psi, targets[0, :len(psi)],
                                   atol=5e-3)
        np.testing.assert_allclose(
            got_phi, targets[0, len(psi) + len(omega):], atol=5e-3)

    def test_attached_loss_densifies_sparse_batches(self, tmp_path):
        """An attached loss class on a sparse (NaN-padded) model must go
        through the densifier like the built-in terms (no NaN loss)."""
        import os

        os.environ["ENCODERMAP_TESTING"] = "True"
        try:
            import encodermap_tpu as em
            from encodermap_tpu.loss_classes import DihedralLoss

            rng = np.random.default_rng(0)
            F, n_res = 64, 5
            n = 3 * n_res
            cvs = {
                "central_angles": rng.uniform(1.7, 2.4, (F, n - 2)).astype(
                    np.float32),
                "central_dihedrals": rng.uniform(
                    -np.pi, np.pi, (F, n - 3)).astype(np.float32),
                "central_cartesians": rng.uniform(0, 2, (F, n, 3)).astype(
                    np.float32),
                "central_distances": rng.uniform(
                    0.12, 0.16, (F, n - 1)).astype(np.float32),
                "side_dihedrals": rng.uniform(
                    -np.pi, np.pi, (F, 4)).astype(np.float32),
            }
            cvs["side_dihedrals"][:32, 2:] = np.nan  # NaN-padded ensemble
            p = em.ADCParameters(
                main_path=str(tmp_path), n_steps=20, steps_per_scan=10,
                batch_size=32, use_backbone_angles=True,
                use_sidechains=True, seed=0)
            emap = em.AngleDihedralCartesianEncoderMap(cvs, p)
            assert emap.sparse
            DihedralLoss(p).attach(emap)
            hist = emap.train()
            assert np.isfinite(hist["loss"]).all()
            assert np.isfinite(hist["dihedral_loss_class"]).all()
        finally:
            os.environ.pop("ENCODERMAP_TESTING", None)

    def test_large_label_lists_round_trip(self, tmp_path):
        """>64KB of labels must survive save/load (HDF5 attr cap)."""
        from encodermap_tpu.data.cvstore import CVCollection

        c = CVCollection()
        labels = [f"ATOM somelongprefix {i:06d} X Y Z" for i in range(4000)]
        c.add("big", np.zeros((3, 4000), np.float32), labels)
        p = tmp_path / "c.h5"
        c.to_hdf5(p)
        back = CVCollection.from_hdf5(p)
        assert back.entry("big").labels == labels

    def test_reserved_cv_names_rejected(self):
        from encodermap_tpu.data.cvstore import CVCollection

        c = CVCollection()
        with pytest.raises(ValueError, match="reserved"):
            c.add("my__indices", np.zeros((2, 2)))

    @needs_data
    def test_explicit_topology_object_wins_over_trajs(self):
        import encodermap_tpu as em
        from encodermap_tpu.misc.backmapping_offline import mdtraj_backmapping

        t = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))
        top = t.top
        phi = np.asarray(top.indices_phi).reshape(-1, 4)
        psi = np.asarray(top.indices_psi).reshape(-1, 4)
        dih = np.zeros((1, len(phi) + len(psi)), np.float32)
        out = mdtraj_backmapping(top=top, dihedrals=dih, trajs=t)
        assert out.shape == (1, t.n_atoms, 3)
        # mismatched explicit topology raises clearly
        t2 = em.load(str(DATA / "glu7.pdb"))
        with pytest.raises(ValueError, match="same structure"):
            mdtraj_backmapping(top=t2.top, dihedrals=dih, trajs=t)

    def test_missing_cd_bond_marks_unrotatable(self):
        from encodermap_tpu.misc.backmapping_offline import near_and_far_masks

        top = _mini_top([("ALA", 1, 0, ["A", "B", "C", "D"])])
        # bond list misses C-D: the dihedral A-B-C-D can never reach its
        # target by rotating about B-C, so it must be unrotatable
        bonds = [(0, 1), (1, 2)]
        masks, rotatable = near_and_far_masks(
            top, np.asarray([[0, 1, 2, 3]]), bonds=bonds)
        assert not rotatable[0]


# ---------------------------------------------------------------------------
# review wave 29: pdb/topology/dssp
# ---------------------------------------------------------------------------


class TestWave29PDB:
    def _write(self, tmp_path, lines, name="x.pdb"):
        f = tmp_path / name
        f.write_text("\n".join(lines) + "\n")
        return f

    def _atom_line(self, serial, name, res, resseq, x, y, z, chain="A",
                   hetatm=False):
        rec = "HETATM" if hetatm else "ATOM  "
        name_fmt = f" {name:<3s}" if len(name) < 4 else f"{name:<4s}"
        return (f"{rec}{serial:5d} {name_fmt} {res:<4s}{chain}{resseq:4d}"
                f"    {x:8.3f}{y:8.3f}{z:8.3f}  1.00  0.00")

    def test_triclinic_cryst1_preserved(self, tmp_path):
        """CRYST1 angles != 90 must yield a (F, 3, 3) cell, not a silently
        orthorhombic box (wave 29)."""
        from encodermap_tpu.data.pdb import load_pdb

        f = self._write(tmp_path, [
            "CRYST1   60.000   70.000   80.000  90.00 120.00  90.00 P 1",
            self._atom_line(1, "N", "ALA", 1, 1.0, 2.0, 3.0),
            self._atom_line(2, "CA", "ALA", 1, 2.0, 2.0, 3.0),
            "END",
        ])
        top, xyz, cell = load_pdb(f)
        assert cell is not None and cell.shape == (1, 3, 3)
        v = cell[0]
        # lengths survive
        np.testing.assert_allclose(
            np.linalg.norm(v, axis=-1), [6.0, 7.0, 8.0], atol=1e-4)
        # beta = angle(v1, v3) = 120 degrees
        cosb = np.dot(v[0], v[2]) / (
            np.linalg.norm(v[0]) * np.linalg.norm(v[2]))
        assert np.degrees(np.arccos(cosb)) == pytest.approx(120.0, abs=0.01)

    def test_orthorhombic_cryst1_stays_lengths(self, tmp_path):
        from encodermap_tpu.data.pdb import load_pdb

        f = self._write(tmp_path, [
            "CRYST1   60.000   70.000   80.000  90.00  90.00  90.00 P 1",
            self._atom_line(1, "N", "ALA", 1, 1.0, 2.0, 3.0),
            "END",
        ])
        _, _, cell = load_pdb(f)
        assert cell.shape == (1, 3)
        np.testing.assert_allclose(cell[0], [6.0, 7.0, 8.0], atol=1e-4)

    def test_save_pdb_round_trips_box(self, tmp_path):
        """save_pdb used to hardcode unitcell=None — a periodic system
        silently went non-periodic on a PDB round-trip (wave 29)."""
        from encodermap_tpu.data import SingleTraj
        from encodermap_tpu.data.pdb import load_pdb, write_pdb
        from encodermap_tpu.data.topology import Topology

        top = Topology()
        r = top.add_residue("ALA", 1, 0)
        for n in ("N", "CA", "C"):
            top.add_atom(n, n[0], r)
        xyz = np.arange(9, dtype=np.float32).reshape(1, 3, 3) * 0.1
        f1 = tmp_path / "in.pdb"
        write_pdb(f1, top, xyz, unitcell=np.asarray([[4.0, 5.0, 6.0]]))
        t = SingleTraj(f1)
        t.load()
        assert t.unitcell_vectors is not None
        f2 = tmp_path / "out.pdb"
        t.save_pdb(f2)
        _, _, cell2 = load_pdb(f2)
        assert cell2 is not None
        np.testing.assert_allclose(
            np.asarray(cell2[0]), [4.0, 5.0, 6.0], atol=1e-3)

    def test_write_pdb_triclinic_cell_angles(self, tmp_path):
        from encodermap_tpu.data.pdb import (
            _cell_from_lengths_angles, load_pdb, write_pdb,
        )
        from encodermap_tpu.data.topology import Topology

        top = Topology()
        r = top.add_residue("ALA", 1, 0)
        top.add_atom("CA", "C", r)
        cell = _cell_from_lengths_angles((6.0, 7.0, 8.0), (90.0, 120.0, 90.0))
        f = tmp_path / "tri.pdb"
        write_pdb(f, top, np.zeros((1, 1, 3), np.float32),
                  unitcell=cell[None])
        _, _, cell2 = load_pdb(f)
        np.testing.assert_allclose(np.asarray(cell2[0]), cell, atol=2e-3)

    def test_ragged_model_tail_extra_atoms_trimmed(self, tmp_path):
        from encodermap_tpu.data.pdb import load_pdb

        f = self._write(tmp_path, [
            "MODEL        1",
            self._atom_line(1, "N", "ALA", 1, 1.0, 0.0, 0.0),
            self._atom_line(2, "CA", "ALA", 1, 2.0, 0.0, 0.0),
            "ENDMDL",
            "MODEL        2",
            self._atom_line(1, "N", "ALA", 1, 1.5, 0.0, 0.0),
            self._atom_line(2, "CA", "ALA", 1, 2.5, 0.0, 0.0),
            self._atom_line(3, "O", "HOH", 2, 9.0, 0.0, 0.0, hetatm=True),
            "ENDMDL",
            "END",
        ])
        top, xyz, _ = load_pdb(f)
        assert xyz.shape == (2, 2, 3)
        assert xyz[1, 0, 0] == pytest.approx(0.15)

    def test_ragged_model_midchain_extra_atom_raises(self, tmp_path):
        """A mid-chain extra atom positionally trimmed would pair every
        later coordinate with the wrong atom — must raise (wave 29)."""
        from encodermap_tpu.data.pdb import load_pdb

        f = self._write(tmp_path, [
            "MODEL        1",
            self._atom_line(1, "N", "ALA", 1, 1.0, 0.0, 0.0),
            self._atom_line(2, "CA", "ALA", 1, 2.0, 0.0, 0.0),
            "ENDMDL",
            "MODEL        2",
            self._atom_line(1, "N", "ALA", 1, 1.5, 0.0, 0.0),
            self._atom_line(2, "CB", "ALA", 1, 9.0, 0.0, 0.0),
            self._atom_line(3, "CA", "ALA", 1, 2.5, 0.0, 0.0),
            "ENDMDL",
            "END",
        ])
        with pytest.raises(ValueError, match="mid-chain"):
            load_pdb(f)

    def test_heme_na_is_nitrogen_sodium_ion_is_na(self, tmp_path):
        from encodermap_tpu.data.pdb import load_pdb

        f = self._write(tmp_path, [
            self._atom_line(1, "NA", "HEM", 1, 1.0, 0.0, 0.0, hetatm=True),
            self._atom_line(2, "NA", "NA", 2, 5.0, 0.0, 0.0, hetatm=True),
            "END",
        ])
        top, _, _ = load_pdb(f)
        assert top.atoms[0].element == "N"   # heme pyrrole nitrogen
        assert top.atoms[1].element == "NA"  # sodium ion residue

    def test_gro_triclinic_box_line(self, tmp_path):
        from encodermap_tpu.data.formats import load_gro

        f = tmp_path / "tri.gro"
        f.write_text(
            "title\n"
            "    1\n"
            "    1ALA      N    1   0.100   0.200   0.300\n"
            "   6.00000   6.50000   7.00000   0.00000   0.00000"
            "   3.00000   0.00000   0.00000   0.00000\n"
        )
        _, _, box = load_gro(f)
        assert box.shape == (1, 3, 3)
        np.testing.assert_allclose(
            box[0], [[6.0, 0, 0], [3.0, 6.5, 0], [0, 0, 7.0]], atol=1e-5)


class TestWave29Topology:
    def test_cross_topology_atom_equality_no_recursion(self):
        BB = ["N", "CA", "C", "O"]
        a = _mini_top([("ALA", 1, 0, BB)])
        b = _mini_top([("ALA", 1, 0, BB)])
        # value __eq__ on the dataclasses recursed Atom.residue ->
        # Residue.atoms -> Atom... for cross-topology comparisons and
        # killed hashability (wave 29: identity semantics)
        assert a.atoms[0] == a.atoms[0]
        assert a.atoms[0] != b.atoms[0]
        assert len({*a.atoms, *b.atoms}) == 8
        assert a.residues[0] != b.residues[0]
        assert a == b  # Topology-level value equality still holds

    def test_sidechain_selection_excludes_backbone_variants(self):
        names = ["N", "CA", "C", "O", "HN", "H1", "HA2", "HA3",
                 "OT1", "OT2", "CB", "HB1"]
        top = _mini_top([("ALA", 1, 0, names)])
        sel = top.select("sidechain")
        got = {top.atoms[i].name for i in sel}
        assert got == {"CB", "HB1"}


class TestWave29DSSP:
    def _helix(self, n_res, rng):
        """Ideal-ish alpha-helix backbone (N, CA, C, O per residue)."""
        import encodermap_tpu  # noqa: F401  (jax config)
        t = np.arange(n_res) * 100.0 * np.pi / 180.0
        ca = np.stack([2.3 * np.cos(t), 2.3 * np.sin(t),
                       1.5 * np.arange(n_res)], axis=1)
        return ca

    def test_single_outlier_frame_does_not_break_all_frames(self):
        from encodermap_tpu.ops.dssp import kabsch_sander_hbonds

        rng = np.random.default_rng(0)
        R, F = 8, 3
        n = rng.normal(size=(1, R, 3)) * 3.0
        n = np.repeat(n, F, axis=0)
        ca = n + [1.0, 0, 0]
        c = n + [2.0, 0, 0]
        o = c + [0, 1.0, 0]
        # frame 1: stretch the bond between residues 3 and 4 only there
        n_broken = n.copy()
        n_broken[1, 4:] += 50.0
        ca_b, c_b, o_b = ca.copy(), c.copy(), o.copy()
        ca_b[1, 4:] += 50.0
        c_b[1, 4:] += 50.0
        o_b[1, 4:] += 50.0
        hb_all = kabsch_sander_hbonds(n_broken, ca_b, c_b, o_b)
        hb_clean = kabsch_sander_hbonds(n[:1], ca[:1], c[:1], o[:1])
        # frames 0 and 2 must be identical to the unbroken single-frame
        # result — the old all-frame max() poisoned every frame
        np.testing.assert_array_equal(hb_all[0], hb_clean[0])
        np.testing.assert_array_equal(hb_all[2], hb_clean[0])

    def test_chain_initial_donation_contract(self):
        """Documented contract (module docstring): a chain-initial residue
        donates ONLY via an explicit H (no preceding carbonyl to
        reconstruct from) — without one it never donates."""
        from encodermap_tpu.ops.dssp import kabsch_sander_hbonds

        R = 4
        base = np.arange(R, dtype=np.float64)[None, :, None] * [50.0, 0, 0]
        n = np.zeros((1, R, 3)) + base
        ca = n + [1.5, 0.0, 0.0]
        c = n + [2.4, 0.5, 0.0]
        o = n + [2.9, 1.6, 0.0]
        # ideal H-bond geometry: CO of residue 2 accepts from NH of
        # residue 0 (non-adjacent, so the peptide-partner exclusion and
        # the CA prefilter don't interfere) — co-locate them
        o[0, 2] = c[0, 2] + [0.0, 1.23, 0.0]
        n[0, 0] = c[0, 2] + [0.0, 3.13, 0.0]
        ca[0, 0] = n[0, 0] + [1.5, 0.0, 0.0]
        h = np.full((1, R, 3), np.nan)
        h[0, 0] = n[0, 0] - [0.0, 1.0, 0.0]
        # with an explicit H residue 0 donates...
        hb = kabsch_sander_hbonds(n, ca, c, o, h=h)
        assert hb[0, 2, 0]
        # ...without one it cannot (nothing to reconstruct from)
        hb2 = kabsch_sander_hbonds(n, ca, c, o)
        assert not hb2[0, :, 0].any()


# ---------------------------------------------------------------------------
# review wave 30: streaming persist contract, sharded featurizer, h5 interop
# ---------------------------------------------------------------------------


class TestWave30Streaming:
    def _adc(self, tmp_path, **kw):
        import encodermap_tpu as em
        from tests.test_adc import _params, synthetic_cvs

        cvs = synthetic_cvs(np.random.default_rng(0), n_frames=64, n_res=4)
        p = _params(tmp_path, n_steps=10, steps_per_scan=5, batch_size=16,
                    **kw)
        return em.AngleDihedralCartesianEncoderMap(cvs, p), cvs

    def test_adc_finish_streaming_honors_nan_stop(self, tmp_path):
        """The ADC override used to persist unconditionally — a
        NaN-diverged streaming run saved parameters.json pointing at NaN
        weights (wave 30: shared _finish_streaming guard)."""
        adc, _ = self._adc(tmp_path)
        before = adc.p.current_training_step
        pj = Path(tmp_path) / "parameters.json"
        if pj.exists():  # the constructor may have written it already
            pj.unlink()
        adc._streaming_nan_stop = True
        adc._finish_streaming({"loss": [1.0]})
        assert adc.p.current_training_step == before
        assert not pj.exists()
        adc._streaming_nan_stop = False
        adc._finish_streaming({"loss": [1.0]})
        assert pj.exists()

    def test_streaming_budget_is_global_like_train(self, tmp_path):
        """train() treats p.n_steps as a GLOBAL budget; train_streaming's
        default must match so a restored model does not overshoot its
        step-dependent schedules (wave 30)."""
        import io
        from contextlib import redirect_stdout

        adc, cvs = self._adc(tmp_path)
        adc.train()
        assert int(adc.state.step) == 10
        buf = io.StringIO()
        with redirect_stdout(buf):
            n = adc._streaming_budget(None)
        assert n <= 0
        assert "already been trained" in buf.getvalue()
        # an EXPLICIT n_steps stays steps-from-here
        assert adc._streaming_budget(7) == 7

    def test_nan_interrupt_subclass_sets_flag(self, tmp_path):
        """run_streaming must detect NaNInterrupt SUBCLASSES (isinstance,
        not class-name equality) so user-extended interrupts keep the
        no-persist protection (wave 30)."""
        import encodermap_tpu as em
        from encodermap_tpu.train.callbacks import NaNInterrupt
        from encodermap_tpu.train.core import run_streaming

        class LoggingNaNInterrupt(NaNInterrupt):
            def on_chunk_end(self, first_step, metrics):
                return False  # simulate immediate divergence abort

        data = np.random.default_rng(0).normal(size=(64, 6)).astype(
            np.float32)
        p = em.Parameters(main_path=str(tmp_path), n_steps=4,
                          steps_per_scan=2, batch_size=8,
                          periodicity=float("inf"))
        emap = em.EncoderMap(p, data, read_only=True)
        emap.callbacks.append(LoggingNaNInterrupt())

        def source():
            while True:
                yield data[None, :8].repeat(2, axis=0)

        run_streaming(emap, source(), 4)
        assert getattr(emap, "_streaming_nan_stop", False)


class TestWave30ShardedFeaturizer:
    @needs_data
    def test_run_blocks_does_not_full_load_parent(self):
        """Reading traj.unitcell_vectors up front load()ed the ENTIRE
        trajectory, defeating out-of-core streaming; blocks decide
        triclinicity from their own boxes now (wave 30)."""
        import encodermap_tpu as em
        from encodermap_tpu.parallel.sharded_featurize import (
            ShardedFeaturizer,
        )

        traj = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))

        def _trap():
            raise AssertionError(
                "parent traj.load() called — full-trajectory materialize")

        traj.load = _trap
        sf = ShardedFeaturizer(traj, block_size=32)
        sf._inner.add_backbone_torsions()
        out = sf.get_output()
        assert out["BackboneTorsionFeature"].shape[0] == traj.n_frames

    def test_zero_frame_to_hdf5_round_trips(self, tmp_path):
        import encodermap_tpu as em
        from encodermap_tpu.data.cvstore import CVCollection
        from encodermap_tpu.parallel.sharded_featurize import (
            ShardedFeaturizer,
        )

        if not DATA.exists():
            pytest.skip("reference data not mounted")
        traj = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))[0:0]
        assert traj.n_frames == 0
        sf = ShardedFeaturizer(traj, block_size=8)
        sf._inner.add_backbone_torsions()
        f = tmp_path / "zero.h5"
        sf.to_hdf5(f)
        back = CVCollection.from_hdf5(f)
        e = back.entry("BackboneTorsionFeature")
        assert e.data.shape[0] == 0
        assert e.labels  # labels survived the zero-frame path

    def test_non_ascii_labels_round_trip(self, tmp_path):
        from encodermap_tpu.data.cvstore import CVCollection

        c = CVCollection()
        c.add("angstroms", np.zeros((2, 1), np.float32),
              labels=["bond length (Å)"])
        f = tmp_path / "l.h5"
        c.to_hdf5(f)
        back = CVCollection.from_hdf5(f)
        assert back.entry("angstroms").labels == ["bond length (Å)"]


class TestWave30H5Interop:
    def test_topology_json_carries_bonds(self, tmp_path):
        """The mdtraj-schema 'bonds' field was always [] — external
        readers got no connectivity from our files (wave 30)."""
        import json

        import encodermap_tpu as em
        from encodermap_tpu.data.mdtraj_h5 import (
            topology_from_json, topology_to_json,
        )

        if not DATA.exists():
            pytest.skip("reference data not mounted")
        traj = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))[:2]
        traj.load()
        f = tmp_path / "t.h5"
        traj.save(f)
        import h5py

        with h5py.File(f, "r") as fh:
            data = json.loads(fh["topology"][0].decode())
        assert len(data["bonds"]) > traj.n_atoms * 0.8  # covalent chain
        # loader keeps the file's list available
        top2 = topology_from_json(json.dumps(data))
        assert top2._file_bonds == [tuple(b) for b in data["bonds"]]
        # a topology loaded WITH file bonds re-saves them verbatim
        assert json.loads(topology_to_json(
            top2, bonds=top2._file_bonds))["bonds"] == data["bonds"]


class TestWave30MolData:
    @needs_data
    def test_moldata_accepts_paths_and_top(self, tmp_path):
        from encodermap_tpu.moldata import MolData

        md = MolData([str(DATA / "asp7.xtc")], top=str(DATA / "asp7.pdb"))
        assert md.dihedrals.shape[1] > 0
        assert len(md) == md.cartesians.shape[0]

    @needs_data
    def test_moldata_cache_path_round_trips(self, tmp_path):
        import encodermap_tpu as em
        from encodermap_tpu.moldata import MolData

        cache = tmp_path / "cvcache"
        t1 = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))
        md1 = MolData(t1, cache_path=str(cache))
        assert any(cache.glob("*.npy"))  # cache written
        # second construction loads FROM the cache (no featurization):
        # poison the featurizer path to prove it is not taken
        t2 = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))
        ens = em.TrajEnsemble([t2])

        md2 = MolData(ens, cache_path=str(cache))
        np.testing.assert_array_equal(md1.dihedrals, md2.dihedrals)

    def test_moldata_top_with_prebuilt_trajs_raises(self):
        import encodermap_tpu as em
        from encodermap_tpu.moldata import MolData

        if not DATA.exists():
            pytest.skip("reference data not mounted")
        t = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))
        with pytest.raises(ValueError, match="top"):
            MolData(t, top="something.pdb")


class TestWave30SidechainFast:
    def test_single_residue_fast_matches_sequential(self):
        """n_cdi == 0 (single residue) used to index -1 into the EMPTY
        central prefix-product axis — an OOB gather with unspecified
        results (wave 30: identity-rotation guard)."""
        import jax.numpy as jnp

        from encodermap_tpu.ops.backmap_sidechains import (
            backmap_sidechains, backmap_sidechains_fast, make_spec,
        )

        rng = np.random.default_rng(0)
        for info in ({1: 2}, {1: 0}):
            spec = make_spec(info)
            R = spec.n_residues
            n_side = spec.n_sidechain_atoms
            n_sdi = (spec.dihedral_quadruplets.shape[0]
                     - spec.n_central_dihedrals)
            B = 3

            def arr(n, lo, hi):
                return jnp.asarray(
                    rng.uniform(lo, hi, size=(B, n)).astype(np.float32))

            args = (arr(3 * R - 1, 0.12, 0.16), arr(3 * R - 2, 1.7, 2.2),
                    arr(3 * R - 3, -3, 3), arr(n_side, 0.12, 0.16),
                    arr(n_side, 1.7, 2.2), arr(n_sdi, -3, 3))
            slow = np.asarray(backmap_sidechains(spec, *args))
            fast = np.asarray(backmap_sidechains_fast(spec, *args))
            np.testing.assert_allclose(fast, slow, atol=2e-3)


# ---------------------------------------------------------------------------
# review wave 31: parameters, featurizer pipeline, interactive session
# ---------------------------------------------------------------------------


class TestWave31Parameters:
    def test_neuron_activation_length_mismatch_raises(self):
        import encodermap_tpu as em

        # reference raises at construction (parameters.py:204-207); the
        # old silent zip-truncation put tanh on the latent layer
        with pytest.raises(ValueError, match="activation_functions"):
            em.Parameters(n_neurons=[128, 2])
        with pytest.raises(ValueError, match="activation_functions"):
            em.ADCParameters(n_neurons=[16, 16, 16, 2])
        em.Parameters(n_neurons=[8, 2],
                      activation_functions=["", "tanh", ""])  # consistent

    def test_save_backs_up_existing_file(self, tmp_path):
        import encodermap_tpu as em

        p = em.Parameters(main_path=str(tmp_path))
        f = p.save()
        p.n_steps = 123
        p.save()
        backs = list(Path(tmp_path).glob("parameters_back_*.json"))
        assert len(backs) == 1  # old file preserved, not overwritten
        import json

        assert json.loads(Path(f).read_text())["n_steps"] == 123

    def test_save_unknown_extension_raises(self, tmp_path):
        import encodermap_tpu as em

        with pytest.raises(OSError, match="extension"):
            em.Parameters(main_path=str(tmp_path)).save(tmp_path / "p.txt")


class TestWave31Featurizer:
    def test_feature_list_insert_skips_empty(self):
        from encodermap_tpu.loading.featurizer import _FeatureList

        class FakeFeat:
            dimension = 0

            def describe(self):
                return []

        fl = _FeatureList()
        with pytest.warns(UserWarning, match="empty"):
            fl.insert(0, FakeFeat())
        assert len(fl) == 0

    @needs_data
    def test_zero_frame_featurize_keeps_width(self):
        import encodermap_tpu as em

        traj = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))[0:0]
        traj.load_CV("central_dihedrals")
        cv = np.asarray(traj.CVs["central_dihedrals"])
        assert cv.shape[0] == 0 and cv.shape[1] > 0  # width preserved

    @needs_data
    def test_apply_reuses_featurizers_across_calls(self):
        import encodermap_tpu as em
        from encodermap_tpu.loading.featurizer import EnsembleFeaturizer

        t = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))
        trajs = em.TrajEnsemble([t])
        feat = EnsembleFeaturizer(trajs)
        feat.add_backbone_torsions()
        c1 = feat._containers()
        feat.apply()
        c2 = feat._containers()
        # the same replayed featurizer objects (and their jitted runners)
        # must be reused — a fresh build per call re-traced every program
        assert list(c1.values())[0] is list(c2.values())[0]


class TestWave31Losses:
    def test_periodic_distance_single_sourced(self):
        from encodermap_tpu import losses
        from encodermap_tpu.ops import distances

        assert losses._periodic_distance is distances.periodic_distance


class TestWave31Interactive:
    def test_adc_session_exposes_highd_data(self, tmp_path):
        import encodermap_tpu as em
        from encodermap_tpu.plot.interactive import InteractivePlotting
        from tests.test_adc import _params, synthetic_cvs

        cvs = synthetic_cvs(np.random.default_rng(0), n_frames=48, n_res=4)
        p = _params(tmp_path, n_steps=2, steps_per_scan=2,
                    use_backbone_angles=True, use_sidechains=True)
        adc = em.AngleDihedralCartesianEncoderMap(cvs, p, read_only=True)
        sess = InteractivePlotting(adc)
        # the high-D data is the encoder-input concatenation, not None
        assert sess.data is not None
        exp = (cvs["central_angles"].shape[1]
               + cvs["central_dihedrals"].shape[1]
               + cvs["side_dihedrals"].shape[1])
        assert sess.data.shape == (48, exp)
        assert sess.latent.shape[0] == 48


# ---------------------------------------------------------------------------
# review wave 32: alignment, custom topology, kondata/api, clustering, COM
# ---------------------------------------------------------------------------


class TestWave32Alignment:
    def test_phi_labels_map_to_next_residue_column(self):
        """PHI ordinal i is the phi OF residue i+1; the reference maps phi
        labels to the [1:] alignment columns (features.py:3178-3182) —
        using residue i's column was off by one at gap boundaries."""
        from encodermap_tpu.loading.alignment import (
            apply_alignment_to_labels,
        )

        # alignment: residue 1 -> col 1, residue 2 -> col 4 (gap between)
        res_to_col = {1: 1, 2: 4, 3: 5}
        out = apply_alignment_to_labels(
            ["CENTERDIH PSI 1", "CENTERDIH OMEGA 1", "CENTERDIH PHI 1"],
            res_to_col,
        )
        assert out[0] == "CENTERDIH PSI 1"     # psi_1 = residue 1
        assert out[1] == "CENTERDIH OMEGA 1"   # omega_1 = residue 1
        assert out[2] == "CENTERDIH PHI 4"     # phi_1 = residue 2!

    def test_alignment_residue_count_validated(self, tmp_path):
        import encodermap_tpu as em

        if not DATA.exists():
            pytest.skip("reference data not mounted")
        t = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))
        trajs = em.TrajEnsemble([t])
        # asp7 has 7 residues; a 3-residue sequence must be rejected
        aln = f"CLUSTAL W\n\n{t.basename}  AD-A\n"
        with pytest.raises(ValueError, match="residues"):
            trajs.parse_clustal_w_alignment(aln)


class TestWave32CustomTopology:
    def test_tuple_keys_scope_by_common_str(self):
        from encodermap_tpu.data.custom_topology import CustomTopology

        BB = ["N", "CA", "C", "O"]
        top = _mini_top([("XYZ", 1, 0, BB + ["CB", "CG", "CD"])])
        custom = {("mutant", "XYZ"): {"CHI1": ["N", "CA", "CB", "CG"]}}
        # matching common_str: definition applies
        ct = CustomTopology.from_custom_aas(top, custom,
                                            common_str="mutant")
        assert "XYZ" in ct.apply().chi_table(1)
        # non-matching: silently scoped out (reference
        # trajinfo_utils.py:591-594)
        ct2 = CustomTopology.from_custom_aas(top, custom,
                                             common_str="wildtype")
        assert "XYZ" not in ct2.apply().chi_table(1)

    def test_not_chi_deletion_honored(self):
        from encodermap_tpu.data.custom_topology import CustomTopology

        BB = ["N", "CA", "C", "O"]
        top = _mini_top([("ASP", 1, 0, BB + ["CB", "CG", "OD1"])])
        n_before = len(top.indices_chi(2))
        assert n_before == 1  # ASP has a chi2
        ct = CustomTopology.from_custom_aas(
            top, {"ASP": ("D", {"not_CHI2": True})}
        )
        patched = ct.apply()
        assert len(patched.indices_chi(2)) == 0
        assert len(patched.indices_chi(1)) == 1  # chi1 untouched


class TestWave32KondataApi:
    def test_non_tar_source_falls_through(self, tmp_path, monkeypatch):
        """An HTTP-200 error page is not a tar — the next mirror must
        still be tried instead of aborting the whole fetch."""
        import io
        import tarfile as tarmod
        import urllib.request

        import encodermap_tpu.kondata as kd

        good_tar = tmp_path / "good.tar"
        payload = tmp_path / "payload"
        payload.mkdir()
        (payload / "data.txt").write_text("hello")
        with tarmod.open(good_tar, "w") as t:
            t.add(payload, arcname="testds")

        calls = []

        def fake_retrieve(url, target):
            calls.append(url)
            if "bad" in url:
                Path(target).write_text("<html>error</html>")
            else:
                Path(target).write_bytes(good_tar.read_bytes())

        monkeypatch.setattr(urllib.request, "urlretrieve", fake_retrieve)
        monkeypatch.setattr(
            kd, "_download_urls",
            lambda name: ["https://bad.example/x", "https://ok.example/x"],
        )
        out = kd.get_from_kondata(
            "testds", str(tmp_path / "out"), mk_parentdir=True,
            silence_overwrite_message=True,
        )
        assert len(calls) == 2  # fell through to the second source
        assert (Path(out) / "data.txt").exists() or any(
            Path(out).rglob("data.txt")
        )

    @needs_data
    def test_load_h5_unwraps_tops_list(self, tmp_path):
        import encodermap_tpu as em

        t = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))[:2]
        t.load()
        f = tmp_path / "single.h5"
        t.save(f)
        # tops given as a LIST used to reach SingleTraj unconverted and
        # stringify to a garbage "['top.pdb']" path
        t2 = em.load(str(f), tops=[str(DATA / "asp7.pdb")])
        assert t2.trajs[0].n_atoms == t.n_atoms

    @needs_data
    def test_load_ensemble_h5_backend_mdtraj_eager(self, tmp_path):
        import encodermap_tpu as em

        t = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))[:2]
        trajs = em.TrajEnsemble([t])
        trajs.load_CVs("all")
        f = tmp_path / "ens.h5"
        trajs.save(f)
        out = em.load(str(f), backend="mdtraj")
        # eager contract: coordinates already materialized at return
        assert all(tt._xyz is not None for tt in out.trajs)


class TestWave32Clustering:
    @needs_data
    def test_cluster_to_dict_base_traj_hosts_joined(self):
        import encodermap_tpu as em
        from encodermap_tpu.misc.clustering import cluster_to_dict

        t = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))
        trajs = em.TrajEnsemble([t])
        membership = np.full(t.n_frames, -1, np.int64)
        membership[::2] = 0
        trajs.load_CVs(membership, attr_name="cluster_membership")
        cluster = trajs.cluster(0)
        parent = t[:1]
        parent.load()
        d = cluster_to_dict(cluster, base_traj=parent)
        joined = d["joined"]
        assert joined.n_frames == cluster.n_frames
        # the joined view is hosted on base_traj's topology object
        assert joined.top is parent.top
        np.testing.assert_allclose(
            joined.xyz, d["stacked"].xyz.reshape(joined.n_frames, -1, 3),
            atol=1e-6,
        )

    @needs_data
    def test_cluster_to_dict_views_still_correct(self):
        import encodermap_tpu as em
        from encodermap_tpu.misc.clustering import cluster_to_dict

        t = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))
        trajs = em.TrajEnsemble([t])
        membership = np.full(t.n_frames, -1, np.int64)
        membership[:10] = 0
        trajs.load_CVs(membership, attr_name="cluster_membership")
        d = cluster_to_dict(trajs.cluster(0))
        assert d["joined"].n_frames == 10
        assert d["stacked"].n_frames == 1
        assert d["stacked"].n_atoms == 10 * t.n_atoms
        assert len(d["series"]) == 10


class TestWave32COM:
    def test_group_com_segment_matches_loop_oracle(self):
        import jax.numpy as jnp

        from encodermap_tpu.loading.features import GroupCOMFeature

        BB = ["N", "CA", "C", "O"]
        top = _mini_top([("ALA", 1, 0, BB + ["CB"]),
                         ("GLY", 2, 0, BB)])
        groups = [[0, 1, 2], [4, 5], [6, 7, 8]]
        f = GroupCOMFeature(top, groups, mass_weighted=True)
        rng = np.random.default_rng(0)
        xyz = rng.normal(size=(5, top.n_atoms, 3)).astype(np.float32)
        got = np.asarray(f.transform(jnp.asarray(xyz)))
        # per-group numpy oracle
        exp = []
        for g, m in zip(f.groups, f.masses):
            w = m / m.sum()
            exp.append((xyz[:, g] * w[None, :, None]).sum(axis=1))
        exp = np.concatenate(exp, axis=1)
        np.testing.assert_allclose(got, exp.reshape(5, -1), atol=1e-5)


# ---------------------------------------------------------------------------
# review wave 33: offline backmap, ADC special modes, dashboard, xtc
# ---------------------------------------------------------------------------


class TestWave33GuessBonds:
    def test_lower_index_next_residue_partner_kept(self):
        """The old `b > a` filter permanently dropped inter-residue bonds
        whose next-residue partner has a LOWER global atom index
        (interleaved topologies) — normalize to (min, max) instead."""
        from encodermap_tpu.data.topology import Topology
        from encodermap_tpu.misc.backmapping_offline import guess_bonds

        top = Topology()
        r1 = top.add_residue("ALA", 1, 0)
        r2 = top.add_residue("ALA", 2, 0)
        top.add_atom("C", "C", r1)    # idx 0 -- placed AFTER r2's N below
        top.add_atom("N", "N", r2)    # idx 1
        top.add_atom("CA", "C", r2)   # idx 2
        top.add_atom("CA", "C", r1)   # idx 3 (res1 CA, HIGHER than r2's N)
        # geometry: res1 CA(3)-C(0) bonded, C(0)-N(1) peptide, N(1)-CA(2)
        xyz = np.asarray([
            [0.15, 0.0, 0.0],   # 0 res1 C
            [0.28, 0.0, 0.0],   # 1 res2 N
            [0.42, 0.0, 0.0],   # 2 res2 CA
            [0.0, 0.0, 0.0],    # 3 res1 CA
        ], np.float32)
        bonds = guess_bonds(top, xyz)
        assert (0, 1) in bonds   # the C(res1, idx 0) - N(res2, idx 1) bond
        assert (0, 3) in bonds
        assert (1, 2) in bonds


class TestWave33Dihedral:
    def test_current_dihedral_matches_geometry_kernel(self):
        import jax.numpy as jnp

        from encodermap_tpu.misc.backmapping_offline import _current_dihedral
        from encodermap_tpu.ops import geometry as geom

        rng = np.random.default_rng(0)
        xyz = rng.normal(size=(4, 3)).astype(np.float32)
        quad = np.asarray([0, 1, 2, 3])
        got = float(_current_dihedral(jnp.asarray(xyz), quad))
        exp = float(np.asarray(geom.compute_dihedrals(
            jnp.asarray(xyz[None]), quad[None]
        ))[0, 0])
        assert got == pytest.approx(exp, abs=1e-5)


class TestWave33OfflineBackmap:
    @needs_data
    def test_return_indices_reflects_rotatable_filter(self):
        """1am7 contains prolines: the returned tables must exclude the
        unrotatable quadruplets that backmap_topology skips."""
        import encodermap_tpu as em
        from encodermap_tpu.misc.backmapping_offline import mdtraj_backmapping

        t = em.load(str(DATA / "1am7_protein.pdb"))
        top = t.top
        phi = np.asarray(top.indices_phi, np.int64).reshape(-1, 4)
        psi = np.asarray(top.indices_psi, np.int64).reshape(-1, 4)
        n = len(phi) + len(psi)
        dih = np.zeros((1, n), np.float32)
        out, tables = mdtraj_backmapping(
            top=str(DATA / "1am7_protein.pdb"), dihedrals=dih,
            return_indices=True)
        # prolines make some phi unrotatable -> filtered tables shrink
        assert len(tables["dihedrals"]) < n
        assert out.shape[1] == t.n_atoms


class TestWave33ADCModes:
    def test_reconstruct_generate_mdtraj_passes_side_dihedrals(self,
                                                              tmp_path,
                                                              monkeypatch):
        import jax

        from encodermap_tpu import ADCParameters
        from encodermap_tpu.misc import backmapping_offline as bo
        from encodermap_tpu.ops.backmap_sidechains import (
            backmap_sidechains, make_spec,
        )
        from encodermap_tpu.train.adc_autoencoder import (
            AngleDihedralCartesianEncoderMap,
        )
        from tests.test_sidechain_reconstruction import INFO, _random_inputs

        rng = np.random.default_rng(2)
        spec, inputs = _random_inputs(rng, INFO, B=32)
        cd, ca, cdi, sd, sa, sdi = inputs
        xyz = np.asarray(
            jax.jit(lambda *a: backmap_sidechains(spec, *a))(*inputs))
        cvs = {
            "central_angles": ca, "central_dihedrals": cdi,
            "all_cartesians": xyz, "central_distances": cd,
            "side_angles": sa, "side_dihedrals": sdi, "side_distances": sd,
        }
        p = ADCParameters(
            main_path=str(tmp_path), n_neurons=[16, 16, 2],
            reconstruct_sidechains=True, sidechain_info=INFO,
            use_backbone_angles=True, use_sidechains=True, seed=0,
            batch_size=8,
        )
        emap = AngleDihedralCartesianEncoderMap(cvs, p, read_only=True)
        captured = {}

        def fake_backmap(top=None, dihedrals=None,
                         sidechain_dihedrals=None, trajs=None, **kw):
            captured["dih"] = np.asarray(dihedrals)
            captured["side"] = np.asarray(sidechain_dihedrals)
            return np.zeros((len(dihedrals), 3, 3), np.float32)

        monkeypatch.setattr(bo, "mdtraj_backmapping", fake_backmap)
        lat = emap.encode()[:2]
        emap.generate(lat, backend="mdtraj", top="dummy")
        # decoded[2] is side ANGLES (width n_side_atoms); the chi targets
        # must be decoded[3] (width n_side_dihedrals)
        assert captured["side"].shape[1] == sdi.shape[1]
        assert captured["dih"].shape[1] == cdi.shape[1]

    def test_encode_four_tuple_on_sidechain_model_raises_clearly(self,
                                                                 tmp_path):
        import encodermap_tpu as em
        from tests.test_adc import _params, synthetic_cvs

        cvs = synthetic_cvs(np.random.default_rng(0), n_frames=32, n_res=4)
        p = _params(tmp_path, use_backbone_angles=True, use_sidechains=True)
        emap = em.AngleDihedralCartesianEncoderMap(cvs, p, read_only=True)
        four = (cvs["central_angles"], cvs["central_dihedrals"],
                cvs["central_cartesians"], cvs["central_distances"])
        with pytest.raises(ValueError, match="side_dihedrals"):
            emap.encode(four)

    def test_train_for_references_multimer(self, tmp_path):
        import encodermap_tpu as em
        from tests.test_multimer import _dimer_cvs, _multimer_params

        cvs = _dimer_cvs(np.random.default_rng(0), F=64)
        p = _multimer_params(tmp_path, batch_size=16, seed=0)
        emap = em.AngleDihedralCartesianEncoderMap(cvs, p, read_only=True)
        means = emap.train_for_references(maxiter=3)
        assert all(np.isfinite(v) for v in means.values())

    def test_train_for_references_reconstruct(self, tmp_path):
        import jax

        from encodermap_tpu import ADCParameters
        from encodermap_tpu.ops.backmap_sidechains import backmap_sidechains
        from encodermap_tpu.train.adc_autoencoder import (
            AngleDihedralCartesianEncoderMap,
        )
        from tests.test_sidechain_reconstruction import INFO, _random_inputs

        rng = np.random.default_rng(1)
        spec, inputs = _random_inputs(rng, INFO, B=48)
        cd, ca, cdi, sd, sa, sdi = inputs
        xyz = np.asarray(
            jax.jit(lambda *a: backmap_sidechains(spec, *a))(*inputs))
        n_bb = 3 * spec.n_residues
        cvs = {
            "central_angles": ca, "central_dihedrals": cdi,
            "all_cartesians": xyz, "central_distances": cd,
            "side_angles": sa, "side_dihedrals": sdi, "side_distances": sd,
            "central_cartesians": xyz[:, :n_bb],
        }
        p = ADCParameters(
            main_path=str(tmp_path), n_neurons=[16, 16, 2],
            reconstruct_sidechains=True, sidechain_info=INFO,
            use_backbone_angles=True, use_sidechains=True, seed=0,
            batch_size=16,
        )
        emap = AngleDihedralCartesianEncoderMap(cvs, p, read_only=True)
        means = emap.train_for_references(maxiter=3)
        assert all(np.isfinite(v) for v in means.values())
        # without central_cartesians the error is descriptive
        cvs2 = {k: v for k, v in cvs.items() if k != "central_cartesians"}
        emap2 = AngleDihedralCartesianEncoderMap(cvs2, p, read_only=True)
        with pytest.raises(ValueError, match="central_cartesians"):
            emap2.train_for_references(maxiter=1)


class TestWave33Misc:
    @needs_data
    def test_xtc_reader_scalar_index(self):
        from encodermap_tpu.data.xtc import XTCReader

        r = XTCReader(str(DATA / "asp7.xtc"))
        xyz, box, time, _ = r.read(5)
        assert xyz.shape == (1, r.n_atoms, 3)

    def test_dashboard_stale_top_index(self):
        from encodermap_tpu.plot.dashboard import DashboardSession, TopPage

        sess = DashboardSession()
        page = TopPage(sess)
        assert page.describe_top(7) == []  # no trajs at all -> []


# ---------------------------------------------------------------------------
# review wave 34: kernel gates and dead-code cleanups
# ---------------------------------------------------------------------------


class TestWave34KernelGates:
    def test_fused_gate_rejects_wide_nonperiodic(self, monkeypatch):
        """The width gate was periodic-only: wide NON-periodic data routed
        into the fused kernel whose pairwise loop unrolls one (B,B)
        broadcast per feature column (wave 34)."""
        import jax

        import encodermap_tpu as em
        from encodermap_tpu.ops.pallas_train import fused_trainer_available

        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        p = em.Parameters(periodicity=float("inf"))
        assert fused_trainer_available(p, {}, input_dim=3)
        assert not fused_trainer_available(p, {}, input_dim=190)
        p2 = em.Parameters()  # periodic default
        assert not fused_trainer_available(p2, {}, input_dim=190)

    def test_fused_gate_rejects_densifier_params(self, monkeypatch):
        import jax

        import encodermap_tpu as em
        from encodermap_tpu.ops.pallas_train import fused_trainer_available

        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        p = em.Parameters(periodicity=float("inf"))
        assert not fused_trainer_available(
            p, {"encoder": [], "decoder": [], "densifier": {}}, input_dim=3)

    def test_sigmoid_single_sourced(self):
        from encodermap_tpu.ops import adc_adjoint, distances, pallas_train

        assert pallas_train._sig is distances.sig_value
        assert pallas_train._dsig_over_r is distances.dsig_over_r
        assert adc_adjoint._sig is distances.sig_value
        assert adc_adjoint._dsig_over_r is distances.dsig_over_r

    def test_make_mesh_indivisible_tp_raises_valueerror(self):
        from encodermap_tpu.parallel.mesh import make_mesh

        with pytest.raises(ValueError, match="divide"):
            make_mesh(tp=3)  # 8 virtual devices; 3 does not divide 8


class TestWave34ScopedResidueKeys:
    """The reference's 'ASP-2' CustomAAsDict key form scopes a definition
    to ONE residue (3-letter code + '-' + 1-based resSeq,
    trajinfo_utils.py:598-602) — previously such keys never matched any
    residue and were silently ignored."""

    def _two_asp(self):
        BB = ["N", "CA", "C", "O"]
        side = ["CB", "CG", "OD1"]
        return _mini_top([("ASP", 1, 0, BB + side),
                          ("ASP", 2, 0, BB + side)])

    def test_scoped_chi_addition(self):
        from encodermap_tpu.data.custom_topology import CustomTopology

        top = self._two_asp()
        # give ONLY residue 2 a custom chi3 (standard ASP has none)
        ct = CustomTopology.from_custom_aas(
            top, {"ASP-2": {"CHI3": ["CB", "CG", "OD1", "N"]}})
        patched = ct.apply()
        chi3 = patched.indices_chi(3)
        assert len(chi3) == 1
        # the quad belongs to residue 2's atoms
        assert all(a >= top.n_atoms // 2 for a in chi3[0][:3])
        # residue 1 untouched
        assert len(patched.indices_chi(2)) == 2  # both ASPs keep chi2

    def test_scoped_not_chi_deletion(self):
        from encodermap_tpu.data.custom_topology import CustomTopology

        top = self._two_asp()
        ct = CustomTopology.from_custom_aas(
            top, {"ASP-2": {"not_CHI2": True}})
        patched = ct.apply()
        chi2 = patched.indices_chi(2)
        assert len(chi2) == 1  # only residue 1's chi2 survives
        assert all(a < top.n_atoms // 2 for a in chi2[0])

    def test_scoped_not_phi(self):
        from encodermap_tpu.data.custom_topology import CustomTopology

        top = self._two_asp()
        base_phi = len(CustomTopology(top).apply().indices_phi)
        ct = CustomTopology.from_custom_aas(top, {"ASP-2": {"not_PHI": True}})
        assert len(ct.apply().indices_phi) == base_phi - 1
