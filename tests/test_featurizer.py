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
