# tests/test_formats.py
"""GRO/DCD readers + streaming through SingleTraj."""

from pathlib import Path

import numpy as np
import pytest

from encodermap_tpu.data.formats import DCDReader, load_gro, write_dcd

DATA = Path("/root/reference/tests/data")


@pytest.mark.skipif(not DATA.exists(), reason="reference data not mounted")
class TestGRO:
    def test_parse_pffp(self):
        top, xyz, box = load_gro(DATA / "PFFP_MD_fin_protonly.gro")
        assert top.n_atoms == 6375
        assert top.n_residues == 500
        assert xyz.shape == (1, 6375, 3)
        assert np.isfinite(xyz).all()
        assert box.shape == (1, 3)
        assert np.all(box > 0)

    def test_gro_as_topology_for_xtc(self):
        from encodermap_tpu.data import SingleTraj

        traj = SingleTraj(
            DATA / "PFFP_MD_fin_protonly_dt_100.xtc",
            DATA / "PFFP_MD_fin_protonly.gro",
        )
        assert traj.n_atoms == 6375
        assert traj.xyz.shape[1] == 6375
        # featurization through a GRO topology
        phi = traj.top.indices_phi
        assert len(phi) > 0


class TestDCD:
    def test_roundtrip(self, tmp_path, rng):
        xyz = rng.uniform(0, 5, (7, 30, 3)).astype(np.float32)
        cells = rng.uniform(5, 6, (7, 3)).astype(np.float32)
        path = tmp_path / "t.dcd"
        write_dcd(path, xyz, cells)
        r = DCDReader(path)
        out, c = r.read()
        assert (r.n_frames, r.n_atoms) == (7, 30)
        np.testing.assert_allclose(out, xyz, atol=1e-6)
        np.testing.assert_allclose(c, cells, atol=1e-6)

    def test_subset_and_negative_index(self, tmp_path, rng):
        xyz = rng.uniform(0, 5, (5, 12, 3)).astype(np.float32)
        path = tmp_path / "t.dcd"
        write_dcd(path, xyz)
        r = DCDReader(path)
        out, _ = r.read([1, -1])
        np.testing.assert_allclose(out, xyz[[1, 4]], atol=1e-6)

    def test_singletraj_dcd(self, tmp_path, rng):
        """DCD coordinates through the SingleTraj facade with a PDB top."""
        if not DATA.exists():
            pytest.skip("reference data not mounted")
        from encodermap_tpu.data import SingleTraj, load_pdb

        top, base_xyz, _ = load_pdb(DATA / "asp7.pdb")
        xyz = np.repeat(base_xyz, 4, axis=0)
        path = tmp_path / "asp7.dcd"
        write_dcd(path, xyz)
        traj = SingleTraj(path, DATA / "asp7.pdb")
        assert traj.n_frames == 4
        np.testing.assert_allclose(traj.xyz, xyz, atol=1e-5)
        traj.load_CV("central_dihedrals")
        assert traj.CVs["central_dihedrals"].shape[0] == 4


class TestTRR:
    def test_roundtrip(self, tmp_path, rng):
        from encodermap_tpu.data.formats import TRRReader, write_trr

        xyz = rng.uniform(0, 5, (6, 25, 3)).astype(np.float32)
        box = np.tile(np.eye(3, dtype=np.float32)[None] * 4.2, (6, 1, 1))
        path = tmp_path / "t.trr"
        write_trr(path, xyz, box)
        r = TRRReader(path)
        out, b, steps = r.read()
        assert (r.n_frames, r.n_atoms) == (6, 25)
        np.testing.assert_array_equal(out, xyz)
        np.testing.assert_array_equal(b, box)
        sub = r.read([1, -1])[0]
        np.testing.assert_array_equal(sub, xyz[[1, 5]])

    def test_singletraj_trr(self, tmp_path):
        if not DATA.exists():
            pytest.skip("reference data not mounted")
        from encodermap_tpu.data import SingleTraj, load_pdb
        from encodermap_tpu.data.formats import write_trr

        top, xyz, _ = load_pdb(DATA / "asp7.pdb")
        frames = np.repeat(xyz, 3, axis=0)
        path = tmp_path / "asp7.trr"
        write_trr(path, frames)
        t = SingleTraj(path, DATA / "asp7.pdb")
        assert t.n_frames == 3
        np.testing.assert_allclose(t.xyz, frames, atol=1e-6)


class TestStack:
    def test_stack_atoms(self, tmp_path):
        if not DATA.exists():
            pytest.skip("reference data not mounted")
        from encodermap_tpu.data import SingleTraj, TrajEnsemble

        a = SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb")[0:5]
        b = SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb")[0:5]
        stacked = TrajEnsemble([a, b]).stack()
        assert stacked.n_atoms == 2 * a.n_atoms
        assert stacked.n_frames == 5
        assert stacked.top.n_chains >= 2


@pytest.mark.skipif(
    not Path("/root/reference/tests/data/PFFP_MD_fin_protonly.gro").exists(),
    reason="no reference data",
)
class TestPFFPScale:
    def test_gro_xtc_featurization_at_scale(self):
        """The 125-mer PFFP system (6375 atoms, GRO topology + XTC):
        full-scale smoke of the native readers and the featurizer."""
        from encodermap_tpu.data import SingleTraj
        from encodermap_tpu.loading.featurizer import SingleTrajFeaturizer

        t = SingleTraj(
            "/root/reference/tests/data/PFFP_MD_fin_protonly_dt_100.xtc",
            "/root/reference/tests/data/PFFP_MD_fin_protonly.gro",
        )
        assert t.xyz.shape == (11, 6375, 3)
        assert t.top.n_residues == 500
        f = SingleTrajFeaturizer(t)
        f.add_list_of_feats("all")
        out = f.get_output()
        assert out["central_cartesians"].shape == (11, 1500, 3)
        assert out["central_dihedrals"].shape == (11, 1497)
        assert np.isfinite(out["central_dihedrals"]).all()
