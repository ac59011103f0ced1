# tests/test_featurizer.py
"""Featurization vs independent NumPy geometry, mirroring the reference's
``tests/test_featurizer.py`` strategy (there: mdtraj is ground truth; here:
the float64 NumPy oracles in ``tests/reference_impl.py``)."""

from pathlib import Path

import numpy as np
import pytest

from encodermap_tpu.data import SingleTraj, load
from encodermap_tpu.loading.featurizer import (
    EnsembleFeaturizer,
    Featurizer,
    SingleTrajFeaturizer,
)
from tests import reference_impl as ref

DATA = Path("/root/reference/tests/data")

pytestmark = pytest.mark.skipif(
    not DATA.exists(), reason="reference test data not mounted"
)


@pytest.fixture(scope="module")
def asp7():
    return SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb")


class TestADCFeatures:
    def test_adc_shapes(self, asp7):
        feat = SingleTrajFeaturizer(asp7)
        feat.add_list_of_feats("all")
        out = feat.get_output()
        n_res = len([r for r in asp7.top.residues if r.is_protein])
        n_frames = asp7.n_frames
        assert out["central_cartesians"].shape == (n_frames, 3 * n_res, 3)
        assert out["central_distances"].shape == (n_frames, 3 * n_res - 1)
        assert out["central_angles"].shape == (n_frames, 3 * n_res - 2)
        assert out["central_dihedrals"].shape == (n_frames, 3 * n_res - 3)
        assert out["side_dihedrals"].shape[1] == 2 * n_res  # ASP: chi1+chi2

    def test_central_dihedrals_values(self, asp7):
        """Dihedrals from the featurizer equal the float64 oracle on the
        central-chain windows."""
        feat = SingleTrajFeaturizer(asp7)
        feat.add_list_of_feats(["central_dihedrals"])
        out = feat.get_output()["central_dihedrals"]
        chain = asp7.top.central_atom_indices()
        xyz = asp7.xyz.astype(np.float64)
        p = xyz[:, chain]
        expected = ref.dihedral_from_xyz_np(
            p[:, :-3], p[:, 1:-2], p[:, 2:-1], p[:, 3:]
        )
        np.testing.assert_allclose(out, expected, atol=1e-4)

    def test_central_angles_values(self, asp7):
        feat = SingleTrajFeaturizer(asp7)
        feat.add_list_of_feats(["central_angles"])
        out = feat.get_output()["central_angles"]
        chain = asp7.top.central_atom_indices()
        p = asp7.xyz.astype(np.float64)[:, chain]
        expected = ref.angle_from_xyz_np(p[:, :-2], p[:, 1:-1], p[:, 2:])
        np.testing.assert_allclose(out, expected, atol=1e-4)

    def test_central_distances_values(self, asp7):
        feat = SingleTrajFeaturizer(asp7)
        feat.add_list_of_feats(["central_distances"])
        out = feat.get_output()["central_distances"]
        chain = asp7.top.central_atom_indices()
        p = asp7.xyz.astype(np.float64)[:, chain]
        expected = np.linalg.norm(np.diff(p, axis=1), axis=-1)
        np.testing.assert_allclose(out, expected, atol=1e-5)

    def test_dihedral_labels(self, asp7):
        feat = SingleTrajFeaturizer(asp7)
        feat.add_list_of_feats(["central_dihedrals"])
        out = feat.get_output()
        labels = out.entry("central_dihedrals").labels
        assert labels[0].startswith("CENTERDIH PSI")
        assert labels[1].startswith("CENTERDIH OMEGA")
        assert labels[2].startswith("CENTERDIH PHI")


class TestGenericFeatures:
    def test_distance_feature(self, asp7):
        feat = SingleTrajFeaturizer(asp7)
        pairs = [[0, 10], [5, 20]]
        feat.add_distances(pairs, periodic=False)
        out = feat.get_output()["DistanceFeature"]
        xyz = asp7.xyz.astype(np.float64)
        expected = np.stack(
            [
                np.linalg.norm(xyz[:, 10] - xyz[:, 0], axis=-1),
                np.linalg.norm(xyz[:, 20] - xyz[:, 5], axis=-1),
            ],
            axis=1,
        )
        np.testing.assert_allclose(out, expected, atol=1e-5)

    def test_periodic_distance_uses_mic(self, asp7):
        """With MIC on, distances never exceed half the box diagonal."""
        feat = SingleTrajFeaturizer(asp7)
        n = asp7.top.n_atoms
        pairs = [[0, n - 1]]
        feat.add_distances(pairs, periodic=True)
        out = feat.get_output()["DistanceFeature"]
        box = asp7.unitcell_vectors
        half_diag = np.linalg.norm(box.diagonal(axis1=1, axis2=2), axis=1) / 2
        assert np.all(out[:, 0] <= half_diag * 1.01)

    def test_backbone_torsions(self, asp7):
        feat = SingleTrajFeaturizer(asp7)
        feat.add_backbone_torsions()
        out = feat.get_output()["BackboneTorsionFeature"]
        n_res = len([r for r in asp7.top.residues if r.is_protein])
        assert out.shape[1] == 2 * (n_res - 1)
        assert np.all(out >= -np.pi) and np.all(out <= np.pi)

    def test_sidechain_torsions(self, asp7):
        feat = SingleTrajFeaturizer(asp7)
        feat.add_sidechain_torsions()
        out = feat.get_output()["SideChainTorsions"]
        assert np.all(np.isfinite(out))

    def test_com_feature(self, asp7):
        feat = SingleTrajFeaturizer(asp7)
        feat.add_residue_COM([0, 1])
        out = feat.get_output()["ResidueCOMFeature"]
        assert out.shape == (asp7.n_frames, 6)

    def test_selection_feature(self, asp7):
        feat = SingleTrajFeaturizer(asp7)
        feat.add_selection([0, 1, 2])
        out = feat.get_output()["SelectionFeature"]
        np.testing.assert_allclose(
            out, asp7.xyz[:, :3].reshape(asp7.n_frames, -1), atol=1e-6
        )


class TestEnsembleAlignment:
    def test_mixed_topologies_nan_padded(self):
        """asp7 vs glu7: GLU has chi3, ASP doesn't -> NaN padding with
        union-of-generic-labels alignment."""
        trajs = load(
            [DATA / "asp7.xtc", DATA / "glu7.xtc"],
            [DATA / "asp7.pdb", DATA / "glu7.pdb"],
        )
        trajs.load_CVs("all", ensemble=True)
        sd = trajs.CVs["side_dihedrals"]
        assert sd.shape[0] == trajs.n_frames
        # asp7 frames must have NaN in the chi3 columns (GLU-only)
        asp_frames = trajs.trajs[0].n_frames
        labels = trajs.trajs[0]._CVs.entry("side_dihedrals").labels
        chi3_cols = [i for i, l in enumerate(labels) if "CHI3" in l]
        assert chi3_cols, "glu7 should contribute CHI3 labels"
        assert np.all(np.isnan(sd[:asp_frames, chi3_cols]))
        assert np.all(~np.isnan(sd[asp_frames:, chi3_cols]))

    def test_same_topology_no_nans(self):
        trajs = load(
            [DATA / "asp7.xtc", DATA / "asp7.xtc"],
            [DATA / "asp7.pdb"],
        )
        trajs.load_CVs("all", ensemble=True)
        assert not np.any(np.isnan(trajs.CVs["central_dihedrals"]))

    def test_featurizer_dispatch(self):
        traj = SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb")
        assert isinstance(Featurizer(traj), SingleTrajFeaturizer)
        trajs = load([DATA / "asp7.xtc"], [DATA / "asp7.pdb"])
        assert isinstance(Featurizer(trajs), EnsembleFeaturizer)

    def test_ensemble_full_add_surface(self):
        """EnsembleFeaturizer exposes every SingleTrajFeaturizer add_*
        method (the reference injects them via a metaclass,
        ``featurizer.py:1450-1493``): a custom add_distances over an
        asp7+glu7 ensemble NaN-aligns on the label union."""
        trajs = load(
            [DATA / "asp7.xtc", DATA / "glu7.xtc"],
            [DATA / "asp7.pdb", DATA / "glu7.pdb"],
        )
        feat = EnsembleFeaturizer(trajs)
        feat.add_distances([[0, 10], [5, 20]], periodic=False)
        feat.add_backbone_torsions()
        feat.apply(ensemble=True)

        d = trajs.CVs["DistanceFeature"]
        assert d.shape[0] == trajs.n_frames
        # asp7 and glu7 label the same atom indices differently -> the
        # union is wider than one topology and each traj's rows are NaN in
        # the other's columns, finite in its own
        n0 = trajs.trajs[0].n_frames
        labels = trajs.trajs[0]._CVs.entry("DistanceFeature").labels
        assert d.shape[1] == 4 and len(labels) == 4
        assert np.isnan(d[:n0]).sum() == 2 * n0
        assert np.isfinite(d[:n0]).sum() == 2 * n0
        bt = trajs.CVs["BackboneTorsionFeature"]
        assert bt.shape[0] == trajs.n_frames

    def test_ensemble_describe_features_transform_get_output(self):
        """The reference's container surface (featurizer.py:1543-1935):
        describe() keyed by Topology, the flat features list, per-traj
        transform(), and get_output() returning per-traj collections."""
        trajs = load(
            [DATA / "asp7.xtc", DATA / "glu7.xtc"],
            [DATA / "asp7.pdb", DATA / "glu7.pdb"],
        )
        feat = EnsembleFeaturizer(trajs)
        feat.add_backbone_torsions()
        desc = feat.describe()
        assert len(desc) == 2  # two topologies
        for top, labels in desc.items():
            assert top in {t.top for t in trajs.trajs}
            assert all(isinstance(s, str) for s in labels)
        assert len(feat.features) == 2  # one feature per topology container
        assert len(feat.feature_containers) == 2
        out = feat.transform(trajs.trajs[0])
        assert out.shape == (trajs.trajs[0].n_frames,
                             len(desc[trajs.trajs[0].top]))
        # adding more features invalidates the container cache
        feat.add_distances([[0, 5]], periodic=False)
        assert len(feat.features) == 4
        res = feat.get_output()
        assert set(res) == {0, 1}
        assert "BackboneTorsionFeature" in res[0]

    def test_ensemble_unknown_attr_raises(self):
        trajs = load([DATA / "asp7.xtc"], [DATA / "asp7.pdb"])
        feat = EnsembleFeaturizer(trajs)
        with pytest.raises(AttributeError):
            feat.add_nonexistent_feature()
        with pytest.raises(AttributeError):
            feat.get_outputs  # not an add_* method

    def test_cv_missing_from_first_traj(self):
        """Ala10 (alanine: no chi dihedrals) + asp7: side_dihedrals exist
        only for the *second* traj; the union must still carry them and
        fill Ala10's frames with NaN (regression for the first-traj
        name-union bug)."""
        from encodermap_tpu.data.trajectory import TrajEnsemble

        trajs = TrajEnsemble([
            SingleTraj(DATA / "Ala10_straight.pdb"),
            SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb"),
        ])
        trajs.load_CVs("all", ensemble=True)
        sd = trajs.CVs["side_dihedrals"]
        n0 = trajs.trajs[0].n_frames
        assert sd.shape[1] == 14  # 7 ASP residues x (chi1, chi2)
        assert np.all(np.isnan(sd[:n0]))
        assert np.all(np.isfinite(sd[n0:]))

    def test_cv_key_missing_entirely(self):
        """A CV key absent from one traj's collection (not just 0-width)
        is NaN-filled for that traj."""
        from encodermap_tpu.data.cvstore import CVCollection

        class FakeTraj:
            def __init__(self, n):
                self.n_frames = n
                self._CVs = CVCollection()

        t0, t1 = FakeTraj(3), FakeTraj(2)
        feat = EnsembleFeaturizer.__new__(EnsembleFeaturizer)
        feat.trajs = [t0, t1]
        cvs0 = CVCollection()  # lacks "foo" entirely
        cvs1 = CVCollection()
        cvs1.add("foo", np.ones((2, 2), np.float32), ["A 1", "A 2"])
        feat._align_2d("foo", [cvs0, cvs1])
        assert np.all(np.isnan(t0._CVs["foo"]))
        np.testing.assert_array_equal(t1._CVs["foo"], np.ones((2, 2)))

    def test_load_cvs_accepts_feature_object(self):
        """TrajEnsemble.load_CVs takes a Feature instance (reference
        ``trajinfo_utils.py:1638-2447``)."""
        from encodermap_tpu.loading import features as F

        trajs = load(
            [DATA / "asp7.xtc", DATA / "asp7.xtc"],
            [DATA / "asp7.pdb"],
        )
        feature = F.DistanceFeature(
            trajs.trajs[0].top, [[0, 10]], periodic=False
        )
        trajs.load_CVs(feature)
        d = trajs.CVs["DistanceFeature"]
        assert d.shape == (trajs.n_frames, 1)
        assert np.all(np.isfinite(d))

    def test_load_cvs_accepts_featurizer_object(self):
        """TrajEnsemble.load_CVs takes a pre-built EnsembleFeaturizer with
        recorded add_* calls."""
        trajs = load(
            [DATA / "asp7.xtc", DATA / "glu7.xtc"],
            [DATA / "asp7.pdb", DATA / "glu7.pdb"],
        )
        feat = EnsembleFeaturizer(trajs)
        feat.add_list_of_feats(["central_dihedrals"])
        trajs.load_CVs(feat, ensemble=True)
        cd = trajs.CVs["central_dihedrals"]
        assert cd.shape == (trajs.n_frames, 3 * 7 - 3)
        assert np.all(np.isfinite(cd))  # same chain length -> no padding

    def test_cartesian_alignment_interleaved_labels(self):
        """The 3-D alignment must not assume label triplets are contiguous
        or (X, Y, Z)-ordered in the union: atom-level grouping handles
        interleaved per-axis label orders."""
        from encodermap_tpu.data.cvstore import CVCollection
        from encodermap_tpu.loading.featurizer import _atom_labels

        # interleaved: all X labels, then all Y, then all Z
        inter = [f"POS {ax} {k}" for ax in "XYZ" for k in (1, 2)]
        atoms = _atom_labels(inter)
        assert [a for a, _ in atoms] == ["POS 1", "POS 2"]
        assert atoms[0][1] == ["POS X 1", "POS Y 1", "POS Z 1"]

        class FakeTraj:
            def __init__(self, n):
                self.n_frames = n
                self._CVs = CVCollection()

        t0, t1 = FakeTraj(2), FakeTraj(2)
        feat = EnsembleFeaturizer.__new__(EnsembleFeaturizer)
        feat.trajs = [t0, t1]
        cvs0 = CVCollection()
        lbl0 = [f"POS {ax} {k}" for k in (1, 2) for ax in "XYZ"]
        cvs0.add("pos", np.ones((2, 2, 3), np.float32), lbl0)
        cvs1 = CVCollection()
        # traj 1 contributes atoms (2, 3) with X/Y/Z triplets intact but a
        # different atom order
        lbl1 = [f"POS {ax} {k}" for k in (3, 2) for ax in "XYZ"]
        data1 = np.stack(
            [np.full((2, 3), 3.0), np.full((2, 3), 2.0)], axis=1
        ).astype(np.float32)
        cvs1.add("pos", data1, lbl1)
        feat._align_3d("pos", [cvs0, cvs1])

        a0 = t0._CVs["pos"]
        a1 = t1._CVs["pos"]
        assert a0.shape == a1.shape == (2, 3, 3)
        # union atom order: 1, 2, 3
        assert np.all(a0[:, :2] == 1.0) and np.all(np.isnan(a0[:, 2]))
        assert np.all(np.isnan(a1[:, 0]))
        assert np.all(a1[:, 1] == 2.0) and np.all(a1[:, 2] == 3.0)


class TestUnnaturalAminoAcids:
    """Ensemble featurization with CustomTopology-defined residues (the
    analog of reference ``tests/test_featurizer.py:2465``)."""

    def test_custom_chi_flows_into_ensemble_alignment(self):
        """asp7 with a user-defined ASP chi3 + stock glu7 (real chi3): the
        custom dihedral must appear in the featurized CVs and NaN-align
        into the same generic CHI3 columns as glu7's."""
        trajs = load(
            [DATA / "asp7.xtc", DATA / "glu7.xtc"],
            [DATA / "asp7.pdb", DATA / "glu7.pdb"],
        )
        # teach ASP a (geometrically fake but well-defined) chi3
        trajs.trajs[0].load_custom_topology(
            {"ASP": {"chi3": ["CB", "CG", "OD1", "OD2"]}}
        )
        trajs.load_CVs(["side_dihedrals"], ensemble=True)
        sd = trajs.CVs["side_dihedrals"]
        labels = trajs.trajs[0]._CVs.entry("side_dihedrals").labels
        chi3_cols = [i for i, l in enumerate(labels) if "CHI3" in l]
        assert len(chi3_cols) == 7  # one shared CHI3 column per residue
        # BOTH trajs now fill the chi3 columns (asp7 via the custom table)
        assert np.all(np.isfinite(sd[:, chi3_cols]))
        assert sd.shape[1] == 21  # 7 residues x (chi1, chi2, chi3)

    def test_custom_topology_object_roundtrip(self):
        from encodermap_tpu.data.custom_topology import CustomTopology

        traj = SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb")
        ct = CustomTopology(traj.top)
        ct.add_residue("ASP", chi3=["CB", "CG", "OD1", "OD2"])
        traj.load_custom_topology(ct)
        assert len(traj.top.indices_chi(3)) == 7
        info = traj.top.sidechain_info()
        assert all(v == 3 for v in info.values())


class TestClustalWAlignment:
    def test_alignment_relabels_and_aligns(self, tmp_path):
        """Two copies of asp7 with a shifted alignment: the shifted sequence's
        residues map onto later alignment columns, producing NaN columns for
        the unshifted one."""
        from encodermap_tpu.data import load

        aln = (
            "CLUSTAL W multiple sequence alignment\n"
            "\n"
            "asp7a   DDDDDDD--\n"
            "asp7b   --DDDDDDD\n"
        )
        trajs = load(
            [DATA / "asp7.xtc", DATA / "asp7.xtc"],
            [DATA / "asp7.pdb"],
            common_str=["asp7"],
        )
        trajs.trajs[0].common_str = "asp7a"
        trajs.trajs[1].common_str = "asp7b"
        trajs.parse_clustal_w_alignment(aln)
        assert trajs.trajs[0].clustal_w[1] == 1
        assert trajs.trajs[1].clustal_w[1] == 3

        trajs.load_CVs(["side_dihedrals"], ensemble=True)
        sd = trajs.CVs["side_dihedrals"]
        labels = trajs.trajs[0]._CVs.entry("side_dihedrals").labels
        # union spans columns 1..9 -> more label columns than one topology
        assert sd.shape[1] > 14
        n0 = trajs.trajs[0].n_frames
        # traj a occupies early columns; traj b's first columns are NaN there
        col9 = [i for i, l in enumerate(labels) if l.endswith(" 9")]
        assert col9 and np.all(np.isnan(sd[:n0, col9]))

    def test_parse_clustal(self):
        from encodermap_tpu.loading.alignment import (
            parse_clustal_w,
            residue_to_column_maps,
        )

        seqs = parse_clustal_w(
            "CLUSTAL O(1.2.4)\n\nseq1  MK-LV\nseq2  MKALV\n      ** **\n"
        )
        assert seqs == {"seq1": "MK-LV", "seq2": "MKALV"}
        maps = residue_to_column_maps(seqs)
        assert maps["seq1"] == {1: 1, 2: 2, 3: 4, 4: 5}
        assert maps["seq2"][3] == 3


class TestAtomUnionSlicing:
    """Featurization ships only the union of referenced atoms to the device
    (big transfer win for solvated systems); values must be identical to
    the full-xyz path."""

    def test_union_smaller_and_values_identical(self, asp7):
        feat = SingleTrajFeaturizer(asp7)
        feat.add_list_of_feats("all")
        run_feats, union = feat._remap_to_union(feat.features)
        assert union is not None
        assert 0 < len(union) < asp7.top.n_atoms
        out = feat.get_output()

        # force the full-xyz path by adding a non-remappable feature
        feat2 = SingleTrajFeaturizer(asp7)
        feat2.add_list_of_feats("all")
        feat2.add_minrmsd_to_ref(asp7.xyz[0])
        _, union2 = feat2._remap_to_union(feat2.features)
        assert union2 is None
        out2 = feat2.get_output()
        for name in ("central_angles", "central_dihedrals",
                     "central_cartesians", "central_distances",
                     "side_dihedrals"):
            np.testing.assert_array_equal(out[name], out2[name])

    def test_labels_and_indices_keep_original_atoms(self, asp7):
        feat = SingleTrajFeaturizer(asp7)
        feat.add_list_of_feats(["central_distances"])
        out = feat.get_output()
        e = out.entry("central_distances")
        chain = asp7.top.central_atom_indices()
        # stored indices reference the ORIGINAL topology numbering
        np.testing.assert_array_equal(e.indices[:, 0], chain[:-1])

    def test_periodic_distances_sliced(self, asp7):
        """MIC distances are unaffected by the atom slicing."""
        n = asp7.top.n_atoms
        feat = SingleTrajFeaturizer(asp7)
        feat.add_distances([[0, n - 1]], periodic=True)
        sliced = feat.get_output()["DistanceFeature"]
        feat2 = SingleTrajFeaturizer(asp7)
        feat2.add_distances([[0, n - 1]], periodic=True)
        feat2.add_minrmsd_to_ref(asp7.xyz[0])  # forces full path
        full = feat2.get_output()["DistanceFeature"]
        np.testing.assert_array_equal(sliced, full)


class TestFeatureEquality:
    """Feature value equality + featurizer dedup (reference
    ``features.py:489-536``, ``featurizer.py:639-646``; behaviors from
    ``tests/test_featurizer.py:1928``)."""

    def test_same_params_equal_different_top_not(self, asp7):
        from encodermap_tpu.loading import features as F

        glu7 = SingleTraj(DATA / "glu7.xtc", DATA / "glu7.pdb")
        pairs = np.array([[0, 1], [1, 2]])
        assert (F.DistanceFeature(asp7.top, pairs)
                == F.DistanceFeature(asp7.top, pairs))
        assert (F.DistanceFeature(asp7.top, pairs)
                != F.DistanceFeature(glu7.top, pairs))
        assert (F.DistanceFeature(asp7.top, pairs)
                != F.DistanceFeature(asp7.top, np.array([[0, 2], [1, 3]])))
        assert (F.DistanceFeature(asp7.top, pairs, periodic=True)
                != F.DistanceFeature(asp7.top, pairs, periodic=False))
        # different class, same labels-ish: never equal
        assert (F.DistanceFeature(asp7.top, pairs)
                != F.InverseDistanceFeature(asp7.top, pairs))
        assert (F.SelectionFeature(asp7.top, [0, 1, 2, 3])
                == F.SelectionFeature(asp7.top, [0, 1, 2, 3]))
        assert (F.CentralDihedrals(asp7.top)
                == F.CentralDihedrals(asp7.top))

    def test_minrmsd_ref_distinguishes(self, asp7):
        from encodermap_tpu.loading import features as F

        f1 = F.MinRmsdFeature(asp7.top, asp7.xyz[0])
        f2 = F.MinRmsdFeature(asp7.top, asp7.xyz[0])
        f3 = F.MinRmsdFeature(asp7.top, asp7.xyz[1])
        assert f1 == f2
        assert f1 != f3

    def test_featurizer_skips_duplicate_features(self, asp7):
        feat = SingleTrajFeaturizer(asp7)
        feat.add_distances([[0, 5]])
        with pytest.warns(UserWarning, match="re-add"):
            feat.add_distances([[0, 5]])
        assert len(feat.features) == 1
        feat.add_distances([[0, 6]])
        assert len(feat.features) == 2


class TestSlicedEnsembleFeaturization:
    def test_random_subset_featurization(self):
        """Composed-index (sliced + fancy-indexed) trajs featurize to
        frame-aligned, NaN-padded ensemble CVs (reference
        ``tests/test_featurizer.py:862-960``)."""
        t1 = SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb",
                        traj_num=4)[::10][[0, 2, 4, 6, 8]]
        assert t1.n_frames == 5
        t2 = SingleTraj(DATA / "glu7.xtc", DATA / "glu7.pdb",
                        traj_num=2)[::12][[0, 1, 3]]
        from encodermap_tpu.data import TrajEnsemble

        trajs = TrajEnsemble([t1, t2])
        trajs.load_CVs("all", ensemble=True)
        for traj in trajs:
            assert traj.side_dihedrals.shape[0] == traj.n_frames
        sd = trajs.CVs["side_dihedrals"]
        assert sd.shape == (trajs.n_frames, 21)
        # asp7 lacks chi3: its rows are NaN in the union columns
        assert np.isnan(sd[: t1.n_frames]).all(0).sum() == 7


@pytest.mark.skipif(not DATA.exists(), reason="reference test data not mounted")
class TestCustomFeature:
    """The two user-extension routes of the reference
    (``tests/test_featurizer.py:1752-1907``): a bare ``CustomFeature(fun,
    dim)`` and a subclass with ``call``/``describe``/``name``."""

    def _traj(self):
        return SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb")

    def test_fun_and_dim(self):
        traj = self._traj()
        dim = traj.n_atoms * 3
        import encodermap_tpu as em

        f = em.features.CustomFeature(
            fun=lambda t: (t.xyz**2).reshape(-1, dim), dim=dim
        )
        feat = SingleTrajFeaturizer(traj)
        feat.add_custom_feature(f)
        out = feat.get_output()
        assert "CustomFeature_0" in out
        np.testing.assert_allclose(
            (traj.xyz**2).reshape(-1, dim),
            out["CustomFeature_0"].reshape(-1, dim),
            atol=1e-5, rtol=1e-5,
        )

    def test_subclass_with_call_name_describe(self):
        import encodermap_tpu as em

        traj = self._traj()

        class RandomFloatForAtomFeature(em.features.CustomFeature):
            def __init__(self, traj, selstr="all"):
                self.traj = traj
                self.top = traj.top
                self.indexes = self.traj.top.select(selstr)
                self.dimension = len(self.indexes)

            def describe(self):
                return [f"Random float for atom {i}" for i in self.indexes]

            def call(self, t):
                values = t.xyz[..., 0].copy()
                for i in self.indexes:
                    values[:, i] = float(
                        str(hash(str(self.traj.top.atom(i))))[-5:]
                    )
                return values

            @property
            def name(self):
                return "MyAwesomeFeature"

        feat = SingleTrajFeaturizer(traj)
        feat.add_custom_feature(RandomFloatForAtomFeature(traj))
        # mixing with a jitted feature exercises the host-splice path
        feat.add_backbone_torsions()
        out = feat.get_output()
        assert set(out) == {"MyAwesomeFeature", "BackboneTorsionFeature"}
        assert out["MyAwesomeFeature"].dtype == np.dtype("float32")
        assert out["MyAwesomeFeature"].shape == (traj.n_frames, traj.n_atoms)

    def test_per_frame_scalar_ids_and_duplicates(self):
        import encodermap_tpu as em

        traj = self._traj()
        dim = traj.n_atoms * 3
        f1 = em.features.CustomFeature(
            fun=lambda t: np.arange(len(t.xyz), dtype="float32"), dim=1
        )
        f2 = em.features.CustomFeature(
            fun=lambda t: (t.xyz * 2).astype("float32").reshape(-1, dim),
            dim=dim,
        )
        feat = SingleTrajFeaturizer(traj)
        feat.add_custom_feature(f1)
        feat.add_custom_feature(f2)
        assert [f.id for f in feat.features] == [0, 1]
        out = feat.get_output()
        assert out["CustomFeature_0"].shape == (traj.n_frames, 1)
        assert out["CustomFeature_1"].shape[0] == traj.n_frames
        f3 = em.features.CustomFeature(fun=lambda t: t.xyz[:, 0, 0], dim=1)
        f3.id = 0
        with pytest.raises(ValueError, match="already"):
            feat.add_custom_feature(f3)

    def test_dim_must_be_positive(self):
        import encodermap_tpu as em

        with pytest.raises(AssertionError):
            em.features.CustomFeature(fun=lambda t: t.xyz, dim=0)

    def test_bad_return_type_raises(self):
        import encodermap_tpu as em

        traj = self._traj()
        f = em.features.CustomFeature(fun=lambda t: [1, 2, 3], dim=3)
        feat = SingleTrajFeaturizer(traj)
        feat.add_custom_feature(f)
        with pytest.raises(ValueError, match="NumPy array"):
            feat.get_output()

    def test_ensemble_replay_and_load_CVs(self):
        import encodermap_tpu as em
        from encodermap_tpu.data import TrajEnsemble

        t1 = SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb", traj_num=0)
        trajs = TrajEnsemble([t1])
        dim = t1.n_atoms * 3
        feat = em.Featurizer(trajs)
        feat.add_custom_feature(em.features.CustomFeature(
            fun=lambda t: (t.xyz**2).reshape(-1, dim), dim=dim,
        ))
        trajs.load_CVs(feat)
        assert "CustomFeature_0" in trajs.CVs
        np.testing.assert_allclose(
            (t1.xyz**2).reshape(-1, dim),
            trajs.CVs["CustomFeature_0"].reshape(-1, dim),
            atol=1e-5, rtol=1e-5,
        )

    def test_description_semantics(self):
        import encodermap_tpu as em

        f = em.features.CustomFeature(
            fun=lambda t: t.xyz[:, :3, 0], dim=3, description="my label"
        )
        assert f.describe() == ["my label"] * 3
        with pytest.raises(ValueError, match="lengths"):
            em.features.CustomFeature(
                fun=lambda t: t.xyz[:, :3, 0], dim=3,
                description=["a", "b"],
            ).describe()


@pytest.mark.skipif(not DATA.exists(), reason="reference test data not mounted")
class TestCustomFeatureReviewFixes:
    def test_subclass_without_name_gets_class_name(self):
        import encodermap_tpu as em

        traj = SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb")

        class MySubFeature(em.features.CustomFeature):
            def __init__(self, traj):
                self.traj = traj
                self.top = traj.top
                self.dimension = 1

            def describe(self):
                return ["first atom x"]

            def call(self, t):
                return t.xyz[:, 0, :1].copy()

        feat = SingleTrajFeaturizer(traj)
        feat.add_custom_feature(MySubFeature(traj))
        out = feat.get_output()
        assert list(out) == ["MySubFeature"]

    def test_re_adding_same_feature_warns_and_skips(self):
        import encodermap_tpu as em

        traj = SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb")
        f = em.features.CustomFeature(
            fun=lambda t: t.xyz[:, 0, :1], dim=1
        )
        feat = SingleTrajFeaturizer(traj)
        feat.add_custom_feature(f)
        with pytest.warns(UserWarning, match="re-add"):
            feat.add_custom_feature(f)
        assert len(feat.features) == 1
        # and the dedup didn't burn an id: the next feature is _1
        f2 = em.features.CustomFeature(
            fun=lambda t: t.xyz[:, 1, :1], dim=1
        )
        feat.add_custom_feature(f2)
        assert f2.id == 1

    def test_h5_cv_attribute_access_without_prior_touch(self):
        t = SingleTraj(DATA / "1am7_corrected_with_CVs.h5")
        # no .CVs / .n_frames touch first: attribute access still works
        assert t.x_and_y_coordinate.shape == (51, 2504, 2)


class TestLoadingReviewWave:
    """Regressions for the loading-package review wave (round 4): the
    reference's add_contacts signature, add_list_of_feats string forms,
    feature-equality blind spots, CustomFeature naming, n_features
    semantics, runner-cache invalidation, empty-feature skipping, and the
    'full' shortcut set (ground truth:
    ``/root/reference/encodermap/loading/featurizer.py``)."""

    def _traj(self):
        return SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb")

    def test_add_contacts_reference_signature(self):
        """indices2 is the SECOND positional (two-group form), threshold
        defaults to 0.3 nm, count_contacts is supported
        (reference ``featurizer.py:935``)."""
        traj = self._traj()
        feat = SingleTrajFeaturizer(traj)
        feat.add_contacts([0, 5], [40, 60])  # two groups, positionally
        f = feat.features[-1]
        assert f.threshold == 0.3
        assert f._indices.shape == (4, 2)  # 2x2 group product
        feat.add_contacts([[0, 40]], count_contacts=True)
        out = feat.get_output()
        counts = np.asarray(out["ContactFeature"])
        assert counts.shape[-1] == 4 or counts.ndim == 2

    def test_add_list_of_feats_single_string_and_camelcase(self):
        """A single feature name wraps into a list (reference
        ``featurizer.py:529``); CamelCase class names are accepted."""
        traj = self._traj()
        feat = SingleTrajFeaturizer(traj)
        feat.add_list_of_feats("central_dihedrals")
        assert len(feat.features) == 1
        feat2 = SingleTrajFeaturizer(traj)
        feat2.add_list_of_feats(["CentralDihedrals", "side_dihedrals"])
        assert [type(f).__name__ for f in feat2.features] == [
            "CentralDihedrals", "SideChainDihedrals"]
        with pytest.raises(ValueError, match="unknown feature"):
            feat2.add_list_of_feats("bogus_name")

    def test_full_shortcut_excludes_all_distances(self):
        """The reference's 'full' set is nine classes WITHOUT
        AllBondDistances (``featurizer.py:506-516``)."""
        traj = self._traj()
        feat = SingleTrajFeaturizer(traj)
        feat.add_list_of_feats("full")
        names = {type(f).__name__ for f in feat.features}
        assert "AllBondDistances" not in names
        assert len(feat.features) == 9

    def test_count_contacts_pair_tables_not_equal(self):
        """Two count_contacts residue-mindist features over DIFFERENT
        pair tables must not dedup-drop (their describe() is identical:
        one 'counted' label)."""
        import encodermap_tpu as em

        traj = self._traj()
        a = em.features.ResidueMinDistanceFeature(
            traj.top, contacts=np.array([[0, 3]]), threshold=0.4,
            count_contacts=True)
        b = em.features.ResidueMinDistanceFeature(
            traj.top, contacts=np.array([[0, 4]]), threshold=0.4,
            count_contacts=True)
        assert a != b
        feat = SingleTrajFeaturizer(traj)
        feat.features.append(a)
        feat.features.append(b)
        assert len(feat.features) == 2

    def test_align_feature_indices_not_equal(self):
        import encodermap_tpu as em

        traj = self._traj()
        ref_xyz = traj.xyz[0:1]
        a = em.features.AlignFeature(traj.top, [0, 1, 2], ref_xyz,
                                     atom_indices=[0, 1, 2])
        b = em.features.AlignFeature(traj.top, [0, 1, 2], ref_xyz,
                                     atom_indices=[3, 4, 5])
        assert a != b

    def test_custom_subclass_keeps_class_level_name(self):
        """A subclass's own class-level ``name`` is the CV key (the
        reference's hasattr guard, ``featurizer.py:603``)."""
        import encodermap_tpu as em

        traj = self._traj()

        class Named(em.features.CustomFeature):
            name = "my_cv"

            def __init__(self, traj):
                super().__init__(fun=None, dim=1)
                self._traj = traj

            def call(self, t):
                return t.xyz[:, 0, :1].copy()

            def describe(self):
                return ["my label"]

        feat = SingleTrajFeaturizer(traj)
        feat.add_custom_feature(Named(traj))
        assert feat.features[-1].name == "my_cv"
        out = feat.get_output()
        assert "my_cv" in list(out)

    def test_ensemble_n_features_counts_features_not_calls(self):
        from encodermap_tpu.data.trajectory import TrajEnsemble
        from encodermap_tpu.loading.featurizer import EnsembleFeaturizer

        trajs = TrajEnsemble([self._traj()])
        feat = EnsembleFeaturizer(trajs)
        feat.add_list_of_feats("all")
        assert feat.n_features() == 5  # one call, five features

    def test_indexes_setter_invalidates_runner(self):
        """Assigning a new index table through the public ``indexes``
        setter must recompile the runner (its tables are baked-in
        constants)."""
        traj = self._traj()
        feat = SingleTrajFeaturizer(traj)
        feat.add_distances(np.array([[0, 5]]))
        first = np.asarray(feat.get_output()["DistanceFeature"]).copy()
        feat.features[0].indexes = np.array([[0, 40]])
        second = np.asarray(feat.get_output()["DistanceFeature"])
        assert not np.allclose(first, second)
        from encodermap_tpu.ops.geometry import compute_distances
        import jax.numpy as jnp

        want = np.asarray(compute_distances(
            jnp.asarray(traj.xyz), np.array([[0, 40]])))
        np.testing.assert_allclose(second.squeeze(), want.squeeze(),
                                   atol=1e-6)

    def test_empty_feature_warn_skipped(self):
        traj = self._traj()
        feat = SingleTrajFeaturizer(traj)
        with pytest.warns(UserWarning, match="empty feature"):
            feat.add_angles(np.zeros((0, 3), np.int64))
        assert len(feat.features) == 0
