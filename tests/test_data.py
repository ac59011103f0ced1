# tests/test_data.py
"""Data layer: PDB parsing, native XTC decoding, lazy trajectories, HDF5.

The XTC decoder is validated bit-exactly against coordinates written by
mdtraj (the reference's IO backend) into the 1am7 HDF5 fixture."""

from pathlib import Path

import numpy as np
import pytest

from encodermap_tpu.data import SingleTraj, TrajEnsemble, load, load_pdb
from encodermap_tpu.data.xtc import XTCReader

DATA = Path("/root/reference/tests/data")


@pytest.mark.skipif(not DATA.exists(), reason="reference test data not mounted")
class TestXTC:
    def test_bit_exact_vs_mdtraj_h5(self):
        import h5py

        r = XTCReader(DATA / "1am7_corrected.xtc")
        assert (r.n_frames, r.n_atoms) == (51, 2504)
        xyz, box, time, step = r.read()
        with h5py.File(DATA / "1am7_corrected_with_CVs.h5") as f:
            coords = f["coordinates"][:]
            cl = f["cell_lengths"][:]
            t = f["time"][:]
        assert np.abs(coords - xyz).max() == 0.0
        assert np.allclose(t, time)
        assert np.abs(np.stack([np.diag(b) for b in box]) - cl).max() == 0.0

    def test_lazy_subset_read(self):
        r = XTCReader(DATA / "1am7_corrected.xtc")
        sub = r.read([5, 10, 50])[0]
        full = r.read()[0]
        np.testing.assert_array_equal(sub, full[[5, 10, 50]])

    def test_small_trajectories(self):
        for name in ("asp7.xtc", "alanine_dipeptide.xtc"):
            r = XTCReader(DATA / name)
            xyz = r.read()[0]
            assert xyz.shape == (r.n_frames, r.n_atoms, 3)
            assert np.isfinite(xyz).all()
            # coordinates of a protein in a box should be bounded
            assert np.abs(xyz).max() < 100


@pytest.mark.skipif(not DATA.exists(), reason="reference test data not mounted")
class TestPDB:
    def test_parse_alanine_dipeptide(self):
        top, xyz, cell = load_pdb(DATA / "alanine_dipeptide.pdb")
        assert top.n_atoms == xyz.shape[1]
        assert xyz.ndim == 3
        names = [a.name for a in top.atoms]
        assert "CA" in names

    def test_parse_1ubq(self):
        top, xyz, cell = load_pdb(DATA / "1UBQ.pdb")
        prot = [r for r in top.residues if r.is_protein]
        assert len(prot) >= 76  # ubiquitin has 76 residues
        bb = top.backbone_indices()
        assert bb.shape[1] == 3

    def test_dihedral_indices(self):
        top, _, _ = load_pdb(DATA / "asp7.pdb")
        n_res = len([r for r in top.residues if r.is_protein])
        assert len(top.indices_phi) == n_res - 1
        assert len(top.indices_psi) == n_res - 1
        assert len(top.indices_omega) == n_res - 1
        # asp7 is 7x ASP -> every residue has chi1 + chi2
        assert len(top.indices_chi1) == n_res
        assert len(top.indices_chi2) == n_res

    def test_roundtrip_write(self, tmp_path):
        from encodermap_tpu.data.pdb import write_pdb

        top, xyz, _ = load_pdb(DATA / "alanine_dipeptide.pdb")
        write_pdb(tmp_path / "out.pdb", top, xyz)
        top2, xyz2, _ = load_pdb(tmp_path / "out.pdb")
        assert top2.n_atoms == top.n_atoms
        np.testing.assert_allclose(xyz2, xyz, atol=1e-4)


@pytest.mark.skipif(not DATA.exists(), reason="reference test data not mounted")
class TestSingleTraj:
    def test_lazy_loading(self):
        traj = SingleTraj(DATA / "1am7_corrected.xtc", DATA / "1am7_protein.pdb")
        assert traj._xyz is None  # nothing loaded yet
        assert traj.n_frames == 51
        assert traj.xyz.shape == (51, 2504, 3)

    def test_frame_indexing_composes(self):
        traj = SingleTraj(DATA / "1am7_corrected.xtc", DATA / "1am7_protein.pdb")
        sub = traj[10:30]
        subsub = sub[::2]
        assert subsub.n_frames == 10
        np.testing.assert_array_equal(subsub.xyz, traj.xyz[10:30][::2])

    def test_lazy_index_composition_fuzz(self):
        """Random chains of frame-index operations (slices with negative
        bounds/steps, fancy int arrays incl. negatives and repeats, boolean
        masks, scalar ints) applied lazily must match the same chain applied
        eagerly to the materialized coordinates, and CVs must follow."""
        traj = SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb")
        cv = np.arange(traj.n_frames, dtype=np.float32)[:, None]
        traj.load_CV(cv, attr_name="frame_id")
        eager_xyz = np.array(traj.xyz)
        rng = np.random.default_rng(1234)

        def random_op(n, allow_empty):
            kind = rng.integers(0, 4 if n > 0 else 1)
            if n == 0 or kind == 0:  # slice
                lo = int(rng.integers(-n - 2, n + 2)) if n else 0
                hi = int(rng.integers(-n - 2, n + 2)) if n else 0
                step = int(rng.choice([-3, -2, -1, 1, 2, 3]))
                return slice(lo, hi, step)
            if kind == 1:  # fancy int array (repeats + negatives allowed)
                k = int(rng.integers(0 if allow_empty else 1, n + 1))
                return rng.integers(-n, n, size=k)
            if kind == 2:  # boolean mask
                return rng.random(n) < 0.5
            return int(rng.integers(-n, n))  # scalar

        for trial in range(25):
            lazy = traj
            ref_xyz = eager_xyz
            ref_cv = cv
            for depth in range(int(rng.integers(1, 5))):
                op = random_op(len(ref_xyz), allow_empty=False)
                if np.isscalar(op) and not isinstance(op, (slice, np.ndarray)):
                    # scalar keeps the frame axis in SingleTraj
                    ref_xyz = ref_xyz[np.asarray([op])]
                    ref_cv = ref_cv[np.asarray([op])]
                else:
                    ref_xyz = ref_xyz[op]
                    ref_cv = ref_cv[op]
                lazy = lazy[op]
                if len(ref_xyz) == 0:
                    break
            assert lazy.n_frames == len(ref_xyz), f"trial {trial}"
            if len(ref_xyz):
                np.testing.assert_array_equal(
                    np.asarray(lazy.xyz), ref_xyz, err_msg=f"trial {trial}"
                )
                np.testing.assert_array_equal(
                    np.asarray(lazy.CVs["frame_id"]), ref_cv,
                    err_msg=f"trial {trial}",
                )

    def test_load_cv_array(self):
        traj = SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb")
        data = np.random.default_rng(0).standard_normal(
            (traj.n_frames, 5)
        ).astype(np.float32)
        traj.load_CV(data, attr_name="my_cv")
        np.testing.assert_array_equal(traj.my_cv, data)
        np.testing.assert_array_equal(traj.CVs["my_cv"], data)

    def test_save_reference_signature(self, tmp_path):
        """save(CVs=..., overwrite=...) follows the reference contract
        (``info_single.py:1858``, ``info_all.py:2551``): existing files
        raise unless overwrite=True; a CV name list stores only those;
        ensemble CVs=False stores none; only_top skips coordinates."""
        import h5py

        traj = SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb")
        traj.load_CV(np.ones((traj.n_frames, 2), np.float32), attr_name="a")
        traj.load_CV(np.zeros((traj.n_frames, 3), np.float32), attr_name="b")
        f = tmp_path / "t.h5"
        traj.save(f, CVs=["a"])
        with h5py.File(f, "r") as h:
            assert set(h["CVs"]) == {"a"}
        with pytest.raises(IOError, match="overwrite"):
            traj.save(f)
        traj.save(f, overwrite=True)  # now all CVs
        with h5py.File(f, "r") as h:
            assert set(h["CVs"]) == {"a", "b"}
        with pytest.raises(KeyError, match="not loaded"):
            traj.save(tmp_path / "u.h5", CVs=["nope"])

        trajs = TrajEnsemble([SingleTraj(DATA / "asp7.xtc",
                                         DATA / "asp7.pdb")])
        trajs.load_CVs("all")
        e = tmp_path / "e.h5"
        trajs.save(e, CVs=False)
        with h5py.File(e, "r") as h:
            assert "CVs" not in h["traj_0"]
        with pytest.raises(IOError, match="overwrite"):
            trajs.save(e)
        trajs.save(e, overwrite=True, CVs=["central_dihedrals"])
        with h5py.File(e, "r") as h:
            assert set(h["traj_0/CVs"]) == {"central_dihedrals",
                                            "central_dihedrals__indices"}
        trajs.save(tmp_path / "top.h5", only_top=True)
        with h5py.File(tmp_path / "top.h5", "r") as h:
            assert "topology" in h["traj_0"]
            assert "coordinates" not in h["traj_0"]
        # only_top on an EXISTING file appends (reference info_all.py:2599
        # opens mode "a") — previously saved coordinates/CVs must survive.
        trajs.save(e, only_top=True)
        with h5py.File(e, "r") as h:
            assert "coordinates" in h["traj_0"]
            assert set(h["traj_0/CVs"]) == {"central_dihedrals",
                                            "central_dihedrals__indices"}
            assert h["traj_0/topology"].shape == (1,)  # rewritten, not dup

    def test_traj_property_and_dash_summary(self):
        """SingleTraj.traj returns the loaded container (reference returns
        an mdtraj.Trajectory, info_single.py:838); dash_summary gives the
        reference's field/value DataFrame on both container levels."""
        traj = SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb",
                          common_str="asp7")
        t = traj.traj
        assert t is traj and t._xyz is not None  # loaded
        df = traj.dash_summary()
        fields = dict(zip(df["field"], df["value"]))
        assert fields["n_frames"] == str(traj.n_frames)
        assert fields["common_str"] == "asp7"
        trajs = TrajEnsemble([
            SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb"),
            SingleTraj(DATA / "glu7.xtc", DATA / "glu7.pdb"),
        ])
        df2 = trajs.dash_summary()
        fields2 = dict(zip(df2["field"], df2["value"]))
        assert fields2["n_trajs"] == "2"
        assert fields2["multiple tops"] == "True"
        # single-frame members have no time deltas; the reference labels
        # that case "single frames" (info_all.py:2387) instead of crashing
        singles = TrajEnsemble([
            SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb")[0],
            SingleTraj(DATA / "glu7.xtc", DATA / "glu7.pdb")[0],
        ])
        df3 = singles.dash_summary()
        fields3 = dict(zip(df3["field"], df3["value"]))
        assert fields3["dt (ps)"] == "single frames"
        with pytest.raises(ImportError, match="nglview"):
            traj.show_traj()

    def test_save_persists_common_str(self, tmp_path):
        traj = SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb",
                          common_str="asp7")
        f = tmp_path / "cs.h5"
        traj.save(f)
        back = SingleTraj(f)
        back.load()
        assert back.common_str == "asp7"

    def test_hdf5_roundtrip(self, tmp_path):
        traj = SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb")
        traj.load_CV(
            np.ones((traj.n_frames, 2), np.float32), attr_name="dummy"
        )
        traj.save(tmp_path / "out.h5")
        back = SingleTraj(tmp_path / "out.h5")
        assert back.n_frames == traj.n_frames
        np.testing.assert_allclose(back.xyz, traj.xyz, atol=1e-6)
        assert back.top.n_atoms == traj.top.n_atoms


@pytest.mark.skipif(not DATA.exists(), reason="reference test data not mounted")
class TestTrajEnsemble:
    def test_load_api(self):
        trajs = load(
            [DATA / "asp7.xtc", DATA / "glu7.xtc"],
            [DATA / "asp7.pdb", DATA / "glu7.pdb"],
            common_str=["asp7", "glu7"],
        )
        assert isinstance(trajs, TrajEnsemble)
        assert trajs.n_trajs == 2
        assert trajs.common_str == ["asp7", "glu7"]

    def test_single_load(self):
        traj = load(DATA / "asp7.xtc", DATA / "asp7.pdb")
        assert isinstance(traj, SingleTraj)

    def test_fancy_indexing_pairs(self):
        trajs = load(
            [DATA / "asp7.xtc", DATA / "glu7.xtc"],
            [DATA / "asp7.pdb", DATA / "glu7.pdb"],
        )
        pairs = np.array([[0, 1], [0, 3], [1, 2]])
        sub = trajs[pairs]
        assert sub.n_trajs == 2
        assert sub.trajs[0].n_frames == 2
        assert sub.trajs[1].n_frames == 1


@pytest.mark.skipif(not DATA.exists(), reason="reference test data not mounted")
class TestAllReferencePDBs:
    @pytest.mark.parametrize(
        "name",
        [p.name for p in sorted(DATA.glob("*.pdb"))] if DATA.exists() else [],
    )
    def test_parses_cleanly(self, name):
        top, xyz, cell = load_pdb(DATA / name)
        assert top.n_atoms > 0
        assert xyz.shape[1] == top.n_atoms
        assert np.isfinite(xyz).all()


@pytest.mark.skipif(not DATA.exists(), reason="reference test data not mounted")
class TestXTCWriter:
    def test_roundtrip_through_own_decoder(self, tmp_path):
        """The native encoder's output decodes bit-consistently through the
        (mdtraj-validated) decoder, within the fixed-point precision."""
        from encodermap_tpu.data.xtc import write_xtc

        traj = SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb")
        out = tmp_path / "rt.xtc"
        write_xtc(out, traj.xyz, box=traj.unitcell_vectors, time=traj.time)
        back = XTCReader(out)
        xyz, box, time, steps = back.read()
        assert back.n_frames == traj.n_frames
        np.testing.assert_allclose(xyz, traj.xyz, atol=6e-4)
        np.testing.assert_allclose(box, traj.unitcell_vectors, atol=1e-5)
        np.testing.assert_allclose(time, traj.time)

    def test_save_xtc_method(self, tmp_path):
        traj = SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb")[0:10]
        traj.save_xtc(tmp_path / "sub.xtc")
        back = SingleTraj(tmp_path / "sub.xtc", DATA / "asp7.pdb")
        assert back.n_frames == 10
        np.testing.assert_allclose(back.xyz, traj.xyz, atol=6e-4)

    def test_roundtrip_property_fuzz(self, tmp_path, rng):
        """Write->read round-trips across system sizes (incl. the <=9-atom
        plain-float storage path), coordinate ranges (negative, large
        magnitude), and random triclinic boxes, each within the XTC
        fixed-point precision."""
        from encodermap_tpu.data.xtc import write_xtc

        for trial, n_atoms in enumerate((1, 2, 9, 10, 11, 64, 333)):
            n_frames = int(rng.integers(1, 5))
            lo, hi = sorted(rng.uniform(-40, 40, 2))
            hi = max(hi, lo + 1e-3)
            xyz = rng.uniform(lo, hi, (n_frames, n_atoms, 3)).astype(
                np.float32
            )
            box = rng.uniform(0.0, 12.0, (n_frames, 3, 3)).astype(np.float32)
            steps = rng.integers(0, 2**30, n_frames).astype(np.int64)
            f = tmp_path / f"fuzz_{trial}.xtc"
            write_xtc(f, xyz, box=box, steps=steps)
            r = XTCReader(f)
            out_xyz, out_box, _t, out_steps = r.read()
            assert r.n_frames == n_frames, (trial, n_atoms)
            # fixed-point grid is 1/1000 nm; decode error <= half a grid
            # step (plain floats below 10 atoms round-trip exactly)
            atol = 1e-6 if n_atoms <= 9 else 6e-4
            np.testing.assert_allclose(out_xyz, xyz, atol=atol,
                                       err_msg=f"{trial=} {n_atoms=}")
            np.testing.assert_allclose(out_box, box, atol=1e-5)
            np.testing.assert_array_equal(out_steps, steps)

    def test_higher_precision(self, tmp_path, rng):
        from encodermap_tpu.data.xtc import write_xtc

        xyz = rng.uniform(0, 3, (3, 50, 3)).astype(np.float32)
        write_xtc(tmp_path / "hp.xtc", xyz, precision=100000.0)
        out = XTCReader(tmp_path / "hp.xtc").read()[0]
        np.testing.assert_allclose(out, xyz, atol=6e-6)


@pytest.mark.skipif(not DATA.exists(), reason="reference test data not mounted")
class TestEnsembleHDF5:
    def test_save_and_from_dataset(self, tmp_path):
        trajs = load(
            [DATA / "asp7.xtc", DATA / "glu7.xtc"],
            [DATA / "asp7.pdb", DATA / "glu7.pdb"],
        )
        trajs.load_CVs(["central_dihedrals"])
        trajs.save(tmp_path / "ens.h5")

        back = TrajEnsemble.from_dataset(tmp_path / "ens.h5")
        assert back.n_trajs == 2
        assert back.n_frames == trajs.n_frames
        np.testing.assert_allclose(
            back.trajs[0].xyz, trajs.trajs[0].xyz, atol=1e-6
        )
        np.testing.assert_allclose(
            back.CVs["central_dihedrals"], trajs.CVs["central_dihedrals"],
            atol=1e-6,
        )
        assert back.trajs[1].top.n_atoms == trajs.trajs[1].top.n_atoms


class TestLoadCVDispatch:
    """load_CV/load_CVs accept .npy/.txt paths, raw arrays, and per-traj
    lists with attr_name (reference test_trajinfo.py:770-800), using the
    1YUG/1YUF NMR multi-model PDBs."""

    def test_multi_model_pdb(self):
        from encodermap_tpu.data import SingleTraj

        t = SingleTraj("/root/reference/tests/data/1YUG.pdb")
        assert t.xyz.shape == (15, 720, 3)
        assert t.top.n_residues == 50

    def test_file_and_array_dispatch(self):
        from encodermap_tpu.data import SingleTraj, TrajEnsemble

        D = "/root/reference/tests/data/"
        t1 = SingleTraj(D + "1YUG.pdb")
        t2 = SingleTraj(D + "1YUF.pdb")[:15]
        trajs = TrajEnsemble([t1, t2])

        trajs.load_CVs(np.ones((2, 15, 300)), attr_name="ones")
        assert np.all(trajs.CVs["ones"] == 1)
        assert trajs.CVs["ones"].shape == (30, 300)

        ref = np.load(D + "1YUG_numpy.npy")
        trajs.load_CVs([ref, ref.tolist()], attr_name="numpy2")
        assert trajs.CVs["numpy2"].shape == (30, 720)

        t1.load_CV(D + "1YUG_numpy.npy")
        assert t1.CVs["1YUG_numpy"].shape == (15, 720)
        t1.load_CV(D + "1YUG_text.txt", attr_name="text")
        np.testing.assert_allclose(t1.CVs["text"], ref, atol=1e-6)

    def test_netcdf_dataset(self):
        """load_CVs from the reference's xarray-written .nc file (NetCDF4 is
        HDF5; reference test_trajinfo.py:773)."""
        from encodermap_tpu.data import SingleTraj, TrajEnsemble

        D = "/root/reference/tests/data/"
        trajs = TrajEnsemble([SingleTraj(D + "1YUG.pdb"),
                              SingleTraj(D + "1YUF.pdb")[:15]])
        trajs.load_CVs(D + "1YUG_and_1YUF_dataset.nc")
        assert "numpy" in trajs.CVs and "text" in trajs.CVs
        ref = np.load(D + "1YUG_numpy.npy")
        np.testing.assert_allclose(trajs.trajs[0].CVs["numpy"], ref)

    def test_wrong_leading_dim_raises(self):
        from encodermap_tpu.data import SingleTraj, TrajEnsemble

        D = "/root/reference/tests/data/"
        trajs = TrajEnsemble([SingleTraj(D + "1YUG.pdb")])
        with pytest.raises(ValueError, match="n_trajs"):
            trajs.load_CVs(np.ones((3, 15, 4)), attr_name="x")


@pytest.mark.skipif(
    not Path("/root/reference/tests/data").exists(), reason="no data"
)
class TestEmbeddedH5CVs:
    def test_reference_written_trajs_h5(self):
        """CVs embedded under /CVs in a reference-written trajs.h5 are
        auto-attached (frame-aligned variables only)."""
        from encodermap_tpu.data import SingleTraj

        t = SingleTraj(
            "/root/reference/tests/data/1am7_corrected_with_CVs.h5"
        )
        assert t.n_frames == 51
        assert "x_and_y_coordinate" in t.CVs
        assert t.CVs["x_and_y_coordinate"].shape == (51, 2504, 2)
        # the (15, 720) variable belongs to another traj -> skipped
        assert "y_coordinate" not in t.CVs


@pytest.mark.skipif(
    not Path("/root/reference/tests/data").exists(), reason="no data"
)
class TestAtomSlice:
    def test_atom_slice_backbone(self):
        """atom_slice keeps the selected atoms + a consistent subset
        topology (reference SingleTraj.atom_slice)."""
        from encodermap_tpu.data import SingleTraj

        D = "/root/reference/tests/data/"
        t = SingleTraj(D + "asp7.xtc", D + "asp7.pdb")
        bb = [a.index for a in t.top.atoms if a.name in ("N", "CA", "C")]
        sub = t.atom_slice(bb)
        assert sub.top.n_atoms == len(bb)
        assert sub.n_frames == t.n_frames
        np.testing.assert_allclose(sub.xyz, t.xyz[:, bb])
        # residue structure preserved
        assert sub.top.n_residues == t.top.n_residues
        assert all(len(r.atoms) == 3 for r in sub.top.residues)
        # dihedral tables of the subset topology are consistent
        assert len(sub.top.indices_phi) == 6  # 7 residues -> 6 phi


@pytest.mark.skipif(
    not Path("/root/reference/tests/data").exists(), reason="no data"
)
class TestCustomTopologyPersistence:
    """Custom amino-acid definitions survive HDF5 save/load round trips
    (the analog of reference test_trajinfo.py::
    test_save_and_load_custom_amino_acids)."""

    def test_single_traj_h5_roundtrip(self, tmp_path):
        from encodermap_tpu.data import SingleTraj

        D = "/root/reference/tests/data/"
        t = SingleTraj(D + "asp7.xtc", D + "asp7.pdb")
        t.load_custom_topology({"ASP": {"chi3": ["CB", "CG", "OD1", "OD2"]}})
        assert len(t.top.indices_chi(3)) == 7
        t.save(tmp_path / "custom.h5")

        t2 = SingleTraj(str(tmp_path / "custom.h5"))
        assert len(t2.top.indices_chi(3)) == 7
        assert t2.top.chi_table(3)["ASP"] == ["CB", "CG", "OD1", "OD2"]

    def test_ensemble_h5_roundtrip(self, tmp_path):
        from encodermap_tpu.data import SingleTraj, TrajEnsemble

        D = "/root/reference/tests/data/"
        trajs = TrajEnsemble([
            SingleTraj(D + "asp7.xtc", D + "asp7.pdb", traj_num=0),
            SingleTraj(D + "glu7.xtc", D + "glu7.pdb", traj_num=1),
        ])
        trajs.trajs[0].load_custom_topology(
            {"ASP": {"chi3": ["CB", "CG", "OD1", "OD2"]}}
        )
        trajs.save(tmp_path / "ens_custom.h5")

        back = TrajEnsemble.from_dataset(tmp_path / "ens_custom.h5")
        assert len(back.trajs[0].top.indices_chi(3)) == 7  # custom
        assert len(back.trajs[1].top.indices_chi(3)) == 7  # genuine GLU chi3
        # featurization of the reloaded ensemble honors the custom chi
        back.load_CVs(["side_dihedrals"], ensemble=True)
        sd = back.CVs["side_dihedrals"]
        assert sd.shape[1] == 21 and np.isfinite(sd).all()


@pytest.mark.skipif(
    not Path("/root/reference/tests/data").exists(), reason="no data"
)
class TestEnsembleConveniences:
    """subsample / get_single_frame / addition (reference info_all.py:2701,
    2753, 3315; info_single.py:1365, 2152)."""

    def _trajs(self):
        from encodermap_tpu.data import load

        D = "/root/reference/tests/data/"
        return load([D + "asp7.xtc", D + "glu7.xtc"],
                    [D + "asp7.pdb", D + "glu7.pdb"])

    def test_subsample_stride(self):
        trajs = self._trajs()
        sub = trajs.subsample(stride=10)
        # each member is strided independently
        assert sub.n_trajs == 2
        assert sub.n_frames == sum(
            len(range(0, t.n_frames, 10)) for t in trajs.trajs
        )
        np.testing.assert_allclose(sub.trajs[0].xyz[1], trajs.trajs[0].xyz[10])

    def test_subsample_total(self):
        trajs = self._trajs()
        sub = trajs.subsample(total=20)
        assert abs(sub.n_frames - 20) <= 1
        with pytest.raises(ValueError):
            trajs.subsample()
        with pytest.raises(ValueError):
            trajs.subsample(stride=2, total=5)

    def test_get_single_frame(self):
        trajs = self._trajs()
        n0 = trajs.trajs[0].n_frames
        f = trajs.get_single_frame(n0 + 2)  # frame 2 of the SECOND traj
        assert f.n_frames == 1
        np.testing.assert_allclose(f.xyz[0], trajs.trajs[1].xyz[2])
        with pytest.raises(IndexError):
            trajs.get_single_frame(trajs.n_frames)

    def test_addition(self, tmp_path):
        from encodermap_tpu.data import SingleTraj, TrajEnsemble

        D = "/root/reference/tests/data/"
        a = SingleTraj(D + "asp7.xtc", D + "asp7.pdb")
        b = SingleTraj(D + "glu7.xtc", D + "glu7.pdb")
        both = a + b
        assert isinstance(both, TrajEnsemble)
        assert both.n_trajs == 2
        trajs = self._trajs()
        doubled = trajs + trajs
        assert doubled.n_trajs == 4
        assert doubled.n_frames == 2 * trajs.n_frames
        # the sum renumbers COPIES: operands stay intact, traj_nums unique
        assert [t.traj_num for t in trajs.trajs] == [0, 1]
        assert [t.traj_num for t in doubled.trajs] == [0, 1, 2, 3]
        # and the sum is saveable (traj_N group names must not collide)
        doubled.save(tmp_path / "doubled.h5")
        back = TrajEnsemble.from_dataset(tmp_path / "doubled.h5")
        assert back.n_trajs == 4 and back.n_frames == doubled.n_frames

    def test_addition_does_not_leak_cvs(self):
        """CVs loaded on the sum must not appear on the operands'
        members — EVERY member of the sum is a copy, including those
        whose traj_num did not change (regression: indices 0-1 aliased)."""
        trajs = self._trajs()
        doubled = trajs + trajs
        assert doubled.trajs[0] is not trajs.trajs[0]
        for k in (0, 2):
            doubled.trajs[k].load_CV(
                np.zeros((doubled.trajs[k].n_frames, 1), np.float32),
                attr_name="marker",
            )
            assert "marker" in doubled.trajs[k]._CVs
        assert "marker" not in trajs.trajs[0]._CVs


@pytest.mark.skipif(
    not Path("/root/reference/tests/data").exists(), reason="no data"
)
class TestCVsSurviveIndexing:
    """CVs stay frame-aligned through slicing and subsampling (reference
    test_trajinfo.py::test_CVs_stay_after_subsample /
    test_traj_ensemble_subsample_CVs_stay_consistent)."""

    def test_single_traj_slice_keeps_cvs(self):
        from encodermap_tpu.data import SingleTraj

        D = "/root/reference/tests/data/"
        t = SingleTraj(D + "asp7.xtc", D + "asp7.pdb")
        t.load_CV("central_dihedrals")
        full = t.CVs["central_dihedrals"].copy()
        sub = t[::7]
        np.testing.assert_allclose(sub.CVs["central_dihedrals"], full[::7])
        np.testing.assert_allclose(sub.xyz, t.xyz[::7])
        # chained indexing composes on both coordinates and CVs
        sub2 = sub[[0, 2]]
        np.testing.assert_allclose(
            sub2.CVs["central_dihedrals"], full[::7][[0, 2]]
        )

    def test_ensemble_subsample_keeps_cvs(self):
        from encodermap_tpu.data import load

        D = "/root/reference/tests/data/"
        trajs = load([D + "asp7.xtc", D + "glu7.xtc"],
                     [D + "asp7.pdb", D + "glu7.pdb"])
        trajs.load_CVs(["central_dihedrals"], ensemble=True)
        full = trajs.CVs["central_dihedrals"].copy()
        sub = trajs.subsample(stride=10)
        got = sub.CVs["central_dihedrals"]
        n0 = trajs.trajs[0].n_frames
        expected = np.concatenate([full[:n0][::10], full[n0:][::10]])
        np.testing.assert_allclose(got, expected)

    def test_id_and_split_into_frames(self):
        from encodermap_tpu.data import load

        D = "/root/reference/tests/data/"
        trajs = load([D + "asp7.xtc", D + "glu7.xtc"],
                     [D + "asp7.pdb", D + "glu7.pdb"])
        ids = trajs.id
        assert ids.shape == (trajs.n_frames, 2)
        n0 = trajs.trajs[0].n_frames
        np.testing.assert_array_equal(ids[:n0, 0], 0)
        np.testing.assert_array_equal(ids[n0:, 0], 1)
        np.testing.assert_array_equal(ids[:n0, 1], np.arange(n0))

        # id reports ORIGINAL file frame numbers after subsampling
        sub = trajs.subsample(stride=10)
        np.testing.assert_array_equal(sub.id[:3, 1], [0, 10, 20])

        small = trajs.subsample(total=6)
        frames = small.split_into_frames()
        assert frames.n_trajs == small.n_frames
        assert all(t.n_frames == 1 for t in frames.trajs)
        # per-frame CVs keep their frame axis through int indexing
        trajs.load_CVs(["central_dihedrals"], ensemble=True)
        split = trajs.split_into_frames()
        cd = split.CVs["central_dihedrals"]
        assert cd.shape == (trajs.n_frames, 18)
        # empty-ensemble id is a well-formed (0, 2) array
        assert TrajEnsemble([]).id.shape == (0, 2)

    def test_from_dataset_frames_accessible(self, tmp_path):
        """Frame-indexing materialized (ensemble-HDF5-loaded) trajs must
        slice in memory, not re-read the grouped file lazily (regression:
        KeyError 'coordinates')."""
        from encodermap_tpu.data import load

        D = "/root/reference/tests/data/"
        trajs = load([D + "asp7.xtc", D + "glu7.xtc"],
                     [D + "asp7.pdb", D + "glu7.pdb"])
        trajs.save(tmp_path / "ens.h5")
        back = TrajEnsemble.from_dataset(tmp_path / "ens.h5")
        f = back.get_single_frame(3)
        assert f.n_frames == 1
        np.testing.assert_allclose(f.xyz[0], back.trajs[0].xyz[3])
        frames = back.split_into_frames()
        assert frames.n_trajs == back.n_frames
        np.testing.assert_allclose(
            frames.trajs[-1].xyz[0], back.trajs[-1].xyz[-1]
        )


@pytest.mark.skipif(not DATA.exists(), reason="reference test data not mounted")
class TestLoadCVSignatureParity:
    """The full reference load_CV/load_CVs signatures: positional
    attr_name, cols, deg (with unit homogeneity), override, per-frame
    splitting, per-traj file lists (reference ``info_single.py:1475``,
    ``info_all.py:2414``, ``trajinfo_utils.py:1950-2355``; behaviors from
    ``tests/test_trajinfo.py:1650-1680,2151-2276``)."""

    def _two_trajs(self):
        t1 = SingleTraj(DATA / "1am7_corrected_part1.xtc",
                        DATA / "1am7_protein.pdb", traj_num=0)
        t2 = SingleTraj(DATA / "1am7_corrected_part2.xtc",
                        DATA / "1am7_protein.pdb", traj_num=1)
        return t1, t2, TrajEnsemble([t1, t2])

    def test_too_large_key_raises_index_error(self):
        t1, _, _ = self._two_trajs()
        with pytest.raises(IndexError):
            t1[100]
        with pytest.raises(IndexError):
            t1[np.arange(100)]

    def test_deg_featurization_and_unit_homogeneity(self):
        t1, t2, trajs = self._two_trajs()
        trajs.load_CVs("all", deg=True)
        cd = trajs.CVs["central_dihedrals"]
        assert np.any(cd > 10)  # degrees, not radians
        assert (t1._CVs.entry("central_dihedrals").attrs["angle_units"]
                == "deg")
        t1.load_CV(np.ones((t1.n_frames, 3)), attr_name="ones", deg=True)
        with pytest.raises(AssertionError, match="inhomogeneous angle"):
            t2.load_CV(np.ones((t2.n_frames, 3)), attr_name="ones",
                       deg=False)

    def test_flat_per_frame_array_with_positional_attr_name(self):
        _, _, trajs = self._two_trajs()
        membership = np.random.default_rng(0).integers(0, 10, trajs.n_frames)
        trajs.load_CVs(membership, "cluster_membership")
        out = trajs.CVs["cluster_membership"]
        assert out.shape == (trajs.n_frames,)
        np.testing.assert_array_equal(out, membership)

    def test_override_semantics(self):
        t1, _, _ = self._two_trajs()
        t1.load_CV(np.ones((t1.n_frames, 3)), attr_name="x")
        # identical re-load is fine
        t1.load_CV(np.ones((t1.n_frames, 3)), attr_name="x")
        with pytest.raises(Exception, match="override"):
            t1.load_CV(np.zeros((t1.n_frames, 3)), attr_name="x")
        with pytest.warns(UserWarning, match="Overwriting"):
            t1.load_CV(np.zeros((t1.n_frames, 3)), attr_name="x",
                       override=True)
        assert np.all(t1.CVs["x"] == 0)

    def test_cols_selects_columns(self):
        t1, _, _ = self._two_trajs()
        arr = np.arange(t1.n_frames * 4, dtype=np.float32).reshape(-1, 4)
        t1.load_CV(arr, attr_name="colsel", cols=[1, 2])
        assert t1.CVs["colsel"].shape == (t1.n_frames, 2)
        np.testing.assert_array_equal(t1.CVs["colsel"][:, 0], arr[:, 1])

    def test_per_traj_file_list(self, tmp_path):
        t1, t2, trajs = self._two_trajs()
        f1, f2 = tmp_path / "a.npy", tmp_path / "b.npy"
        np.save(f1, np.ones((t1.n_frames, 2)))
        np.save(f2, np.full((t2.n_frames, 2), 2.0))
        trajs.load_CVs([str(f1), str(f2)], "fromfiles")
        assert trajs.CVs["fromfiles"].shape == (trajs.n_frames, 2)
        f3 = tmp_path / "c.txt"
        np.savetxt(f3, np.ones((t2.n_frames, 2)))
        with pytest.raises(Exception, match="mish-mash"):
            trajs.load_CVs([str(f1), str(f3)], "mixed")

    def test_angle_units_survive_h5_roundtrip(self, tmp_path):
        _, _, trajs = self._two_trajs()
        trajs.load_CVs("central_dihedrals", deg=True)
        trajs.save(tmp_path / "ens.h5")
        back = TrajEnsemble.from_dataset(tmp_path / "ens.h5")
        e = back.trajs[0]._CVs.entry("central_dihedrals")
        assert e.attrs.get("angle_units") == "deg"

    def test_data_none_with_directory(self, tmp_path):
        t1, t2, trajs = self._two_trajs()
        np.save(tmp_path / f"{t1.basename}.npy", np.ones((t1.n_frames, 2)))
        np.save(tmp_path / f"{t2.basename}.npy", np.ones((t2.n_frames, 2)))
        trajs.load_CVs(directory=tmp_path, attr_name="fromdir")
        assert trajs.CVs["fromdir"].shape == (trajs.n_frames, 2)


@pytest.mark.skipif(not DATA.exists(), reason="reference test data not mounted")
class TestBatchIteratorParity:
    """Reference batch_iterator semantics (``info_all.py:2815-3078``;
    behaviors from ``tests/test_trajinfo.py:2157-2276``): default CV set,
    yield_index frame identity, unique samples, deterministic streams,
    single-name bare arrays."""

    def _ensemble(self):
        t1 = SingleTraj(DATA / "1am7_corrected_part1.xtc",
                        DATA / "1am7_protein.pdb", traj_num=0)
        t2 = SingleTraj(DATA / "1am7_corrected_part2.xtc",
                        DATA / "1am7_protein.pdb", traj_num=1)
        trajs = TrajEnsemble([t1, t2])
        trajs.load_CVs("all")
        return trajs

    def test_yield_index_rows_match_cvs(self):
        trajs = self._ensemble()
        it = trajs.batch_iterator(10, yield_index=True, seed=0)
        index, batch = next(it)
        assert isinstance(index, np.ndarray) and index.shape == (10, 2)
        assert isinstance(batch, tuple) and len(batch) == 5
        names = ["central_angles", "central_dihedrals",
                 "central_cartesians", "central_distances",
                 "side_dihedrals"]
        ids = trajs.id
        for k, name in enumerate(names):
            full = trajs.CVs[name]
            for b in range(2):
                row = np.where(
                    (ids[:, 0] == index[b, 0]) & (ids[:, 1] == index[b, 1])
                )[0][0]
                np.testing.assert_array_equal(batch[k][b], full[row])

    def test_unique_within_batch_and_replace(self):
        trajs = self._ensemble()
        it = trajs.batch_iterator(trajs.n_frames, yield_index=True, seed=0)
        index, _ = next(it)
        assert len({tuple(r) for r in index}) == trajs.n_frames
        with pytest.raises(Exception, match="unique"):
            trajs.batch_iterator(trajs.n_frames + 1, seed=0)
        it2 = trajs.batch_iterator(trajs.n_frames + 1, replace=True, seed=0)
        assert next(it2)[0].shape[0] == trajs.n_frames + 1

    def test_deterministic_and_start(self):
        trajs = self._ensemble()
        a = next(trajs.batch_iterator(4, deterministic=True,
                                      yield_index=True))[0]
        b = next(trajs.batch_iterator(4, deterministic=True,
                                      yield_index=True))[0]
        c = next(trajs.batch_iterator(4, deterministic=True, start=2,
                                      yield_index=True))[0]
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(a, c)

    def test_all_nan_frames_are_skipped(self):
        trajs = self._ensemble()
        # poison: one member contributes an all-NaN column block
        bad = np.full((trajs.trajs[0].n_frames, 3), np.nan, np.float32)
        good = np.ones((trajs.trajs[1].n_frames, 3), np.float32)
        trajs.trajs[0].load_CV(bad, attr_name="ragged")
        trajs.trajs[1].load_CV(good, attr_name="ragged")
        it = trajs.batch_iterator(
            8, CV_names=["ragged"], yield_index=True, seed=0
        )
        index, batch = next(it)
        assert np.all(index[:, 0] == 1)  # only traj 1 frames qualify
        assert not np.any(np.isnan(batch))


@pytest.mark.skipif(not DATA.exists(), reason="reference test data not mounted")
class TestTfDataset:
    """``TrajEnsemble.tf_dataset`` interop shim (reference
    ``info_all.py:3080-3154``): spec shapes per CV preset, determinism,
    missing-CV validation, and lazy-source cleanup."""

    @pytest.fixture(scope="class")
    def trajs(self):
        pytest.importorskip("tensorflow")
        t1 = SingleTraj(DATA / "1am7_corrected_part1.xtc",
                        DATA / "1am7_protein.pdb", traj_num=0)
        t2 = SingleTraj(DATA / "1am7_corrected_part2.xtc",
                        DATA / "1am7_protein.pdb", traj_num=1)
        trajs = TrajEnsemble([t1, t2])
        trajs.load_CVs("all")
        return trajs

    def test_default_specs_and_batches(self, trajs):
        ds = trajs.tf_dataset(8, deterministic=True)
        spec = ds.element_spec
        assert isinstance(spec, tuple) and len(spec) == 4
        names = ["central_angles", "central_dihedrals",
                 "central_cartesians", "central_distances"]
        for s, name in zip(spec, names):
            want = trajs.CVs[name].shape[1:]
            assert tuple(s.shape) == (8, *want), name
            assert s.dtype.name == "float32"
        batch = next(iter(ds))
        assert batch[0].shape == (8, trajs.CVs["central_angles"].shape[1])

    def test_sidechains_preset_and_single_cv(self, trajs):
        ds = trajs.tf_dataset(4, sidechains=True, deterministic=True)
        assert len(ds.element_spec) == 5
        ds1 = trajs.tf_dataset(4, CV_names=["central_dihedrals"],
                               deterministic=True)
        # single CV -> bare tensors, not 1-tuples (batch_iterator parity)
        assert not isinstance(ds1.element_spec, tuple)
        arr = next(iter(ds1)).numpy()
        assert arr.shape == (4, trajs.CVs["central_dihedrals"].shape[1])

    def test_missing_cv_raises(self, trajs):
        with pytest.raises(AssertionError, match="not loaded"):
            trajs.tf_dataset(4, CV_names=["no_such_cv"])

    def test_deterministic_streams_match(self, trajs):
        a = next(iter(trajs.tf_dataset(4, deterministic=True)))
        b = next(iter(trajs.tf_dataset(4, deterministic=True)))
        np.testing.assert_array_equal(a[1].numpy(), b[1].numpy())

    def test_shuffled_batches_keep_frame_correspondence(self, trajs):
        """Shuffling must permute FRAMES, not each CV independently: every
        batch row's angle/dihedral pair must come from the same source
        frame (the reference's
        ``test_shuffled_multi_tensor_dataset_returns_correct_order``,
        ``tests/test_autoencoder.py:1504``)."""
        ang_src = trajs.CVs["central_angles"]
        dih_src = trajs.CVs["central_dihedrals"]
        ds = trajs.tf_dataset(8, CV_names=["central_angles",
                                           "central_dihedrals"])
        ang, dih = (t.numpy() for t in next(iter(ds)))
        for row_a, row_d in zip(ang, dih):
            matches = np.where((ang_src == row_a).all(axis=1))[0]
            assert len(matches), "batch row not found in source CVs"
            assert any(
                np.array_equal(dih_src[m], row_d) for m in matches
            ), "angle and dihedral rows come from different frames"

    def test_lazy_source_closed_after_spec_sampling(self, trajs, tmp_path,
                                                    monkeypatch):
        """Constructing the dataset on a disk-backed ensemble must not
        leak the spec-sampling HDF5BatchSource (ADVICE r3)."""
        from encodermap_tpu.train import core as train_core

        path = tmp_path / "ens.h5"
        trajs.save(path)
        lazy = TrajEnsemble(trajs.trajs)
        lazy._source_h5 = str(path)

        opened = []

        class Tracked(train_core.HDF5BatchSource):
            def __init__(self, *a, **kw):
                super().__init__(*a, **kw)
                opened.append(self)
                self._test_closed = False

            def close(self):
                self._test_closed = True
                super().close()

        monkeypatch.setattr(train_core, "HDF5BatchSource", Tracked)
        ds = lazy.tf_dataset(4, CV_names=["central_dihedrals"],
                             deterministic=True)
        # spec sampling used the lazy path and released its source
        assert opened and all(s._test_closed for s in opened)
        arr = next(iter(ds)).numpy()
        assert arr.shape == (4, trajs.CVs["central_dihedrals"].shape[1])
        lazy._source_h5 = None


@pytest.mark.skipif(not DATA.exists(), reason="reference test data not mounted")
class TestContainerAdditionParity:
    """Behaviors from reference ``tests/test_trajinfo.py:2018-2056,498-513``:
    traj addition exposes intersection CVs as ensemble attributes, tops
    broadcasts from a single path, _gen_ensemble/load_trajs exist."""

    def test_addition_cv_intersection_and_attr_access(self):
        t1 = SingleTraj(DATA / "1am7_corrected_part1.xtc",
                        DATA / "1am7_protein.pdb", traj_num=1)
        t2 = SingleTraj(DATA / "1am7_corrected_part2.xtc",
                        DATA / "1am7_protein.pdb", traj_num=2)
        t1.load_CV(t1.xyz[:, :, 1], "y_coordinate")
        t2.load_CV(t2.xyz[:, :, 1], "y_coordinate")
        t2.load_CV(t2.xyz[:, :, 2], "z_coordinate")
        trajs = t1 + t2
        assert isinstance(trajs, TrajEnsemble)
        assert trajs.n_frames == 51
        # only the COMMON CV survives the stacked view
        assert list(trajs.CVs.keys()) == ["y_coordinate"]
        assert trajs.y_coordinate.shape == (51, 2504)
        with pytest.raises(AttributeError):
            trajs.z_coordinate

    def test_tops_broadcasts_from_single_path(self):
        trajs = TrajEnsemble(
            [DATA / "1am7_corrected_part1.xtc",
             DATA / "1am7_corrected_part2.xtc"],
            tops=DATA / "1am7_protein.pdb",
        )
        assert trajs.n_trajs == 2
        trajs.load_trajs()
        assert trajs.n_frames == 51

    def test_gen_ensemble(self):
        t = SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb")
        trajs = t._gen_ensemble()
        assert trajs.n_trajs == 1 and trajs.n_frames == t.n_frames


@pytest.mark.skipif(not DATA.exists(), reason="reference test data not mounted")
class TestCustomAAsDictFormat:
    """The reference's CustomAAsDict format (``trajinfo_utils.py:600-770``,
    used in ``tests/test_backmapping_em1_em2.py:1034`` for acetylated
    lysine): {resname: (one_letter_code, {tables})} with optional_bonds,
    CHIn (uppercase), PHI overrides and not_* deletions — plus the
    custom_top= and basename_fn= arguments of em.load."""

    def test_tuple_format_with_uppercase_tables(self):
        t = SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb")
        base_chi2 = len(t.top.indices_chi2)
        t.load_custom_topology({
            "ASP": ("D", {
                "optional_bonds": [("-C", "N"), ("N", "CA"), ("CA", "CB"),
                                   ("CB", "CG"), ("C", "+N")],
                "CHI3": ["CB", "CG", "OD1", "OD2"],
            }),
        })
        # ASP normally has no chi3; the patch adds one per residue
        assert len(t.top.indices_chi3) == 7
        assert len(t.top.indices_chi2) == base_chi2

    def test_not_deletion_and_override(self):
        t = SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb")
        n_psi = len(t.top.indices_psi)
        t.load_custom_topology({"ASP": ("D", {"not_PSI": []})})
        assert len(t.top.indices_psi) < n_psi

    def test_unknown_table_raises(self):
        t = SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb")
        with pytest.raises(ValueError, match="unknown custom-residue"):
            t.load_custom_topology({"ASP": ("D", {"bogus_key": []})})

    def test_load_with_custom_top_and_basename_fn(self):
        trajs = load(
            [DATA / "asp7.xtc", DATA / "glu7.xtc"],
            [DATA / "asp7.pdb", DATA / "glu7.pdb"],
            basename_fn=lambda p: Path(p).stem.upper(),
            custom_top={"ASP": ("D", {"CHI3": ["CB", "CG", "OD1", "OD2"]})},
        )
        assert trajs.trajs[0].basename == "ASP7"
        assert len(trajs.trajs[0].top.indices_chi3) == 7
        single = load(DATA / "asp7.xtc", DATA / "asp7.pdb",
                      custom_top={"ASP": ("D",
                                          {"CHI3": ["CB", "CG", "OD1",
                                                    "OD2"]})})
        assert len(single.top.indices_chi3) == 7
        with pytest.raises(ValueError, match="backend"):
            load(DATA / "asp7.xtc", DATA / "asp7.pdb", backend="bogus")


@pytest.mark.skipif(not DATA.exists(), reason="reference test data not mounted")
class TestSwappedArgsRaise:
    def test_wrong_way_round(self):
        """SingleTraj(pdb, xtc) — a coordinates-only top raises, like the
        reference (``tests/test_trajinfo.py:1293``)."""
        with pytest.raises(ValueError, match="swap"):
            SingleTraj(DATA / "asp7.pdb", DATA / "asp7.xtc")


@pytest.mark.skipif(not DATA.exists(), reason="reference test data not mounted")
class TestReferenceInitContract:
    """SingleTraj construction semantics lifted from the reference's own
    trajinfo suite (``tests/test_trajinfo.py:421-523``)."""

    def test_keyword_names_match_reference(self):
        t = SingleTraj(
            traj=DATA / "1am7_corrected.xtc",
            top=DATA / "1am7_protein.pdb",
            common_str="1am7",
            backend="no_load",
            traj_num=3,
        )
        assert t.n_frames == 51
        assert t.traj_num == 3
        assert t.common_str == "1am7"

    def test_wrong_dtype_for_traj_raises_value_error(self):
        with pytest.raises(ValueError, match="str or Path"):
            SingleTraj(traj=1)

    def test_bad_backend_raises(self):
        with pytest.raises(ValueError, match="backend"):
            SingleTraj(DATA / "asp7.pdb", backend="tensorflow")

    def test_mdtraj_backend_loads_eagerly(self):
        t = SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb",
                       backend="mdtraj")
        assert t._xyz is not None

    def test_load_traj_raises_file_not_found(self):
        t = SingleTraj("/tmp/imaginary_xtc_file.xtc",
                       "/tmp/imaginary_pdb_file.pdb")
        with pytest.raises(FileNotFoundError):
            t.load_traj()
        t = SingleTraj(DATA / "1am7_corrected.xtc",
                       "/tmp/imaginary_pdb_file.pdb")
        with pytest.raises(FileNotFoundError):
            t.load_traj()

    def test_custom_top_kwarg_applies_at_init(self):
        # the asp7 fixture plus a fake chi definition: custom_top= at
        # construction equals load_custom_topology() after
        custom = {"ASP": {"chi2": ["CA", "CB", "CG", "OD1"]}}
        t = SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb",
                       custom_top=custom)
        ref = SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb")
        ref.load_custom_topology(custom)
        assert np.array_equal(t.top.indices_chi2, ref.top.indices_chi2)
        assert len(t.top.indices_chi2) > 0

    def test_too_large_key_raises_index_error(self):
        t = SingleTraj(DATA / "1am7_corrected.xtc",
                       DATA / "1am7_protein.pdb")
        with pytest.raises(IndexError):
            t[100]
        with pytest.raises(IndexError):
            t[np.arange(100)]

    def test_double_index_with_int_raises(self):
        t = SingleTraj(DATA / "1am7_corrected.xtc",
                       DATA / "1am7_protein.pdb")
        with pytest.raises(IndexError):
            t[5][10]

    def test_load_h5_with_integer_index(self):
        t = SingleTraj(DATA / "1am7_corrected_with_CVs.h5", index=2)
        assert t.n_frames == 1
        assert t.id.shape == (1,) or t.id.shape == (1, 2)

    def test_save_CV_as_numpy_overwrite_contract(self, tmp_path):
        t = SingleTraj(DATA / "1am7_corrected_with_CVs.h5")
        name = next(iter(t.CVs))
        target = tmp_path / "cv.npy"
        target.touch()
        with pytest.raises(OSError):
            t.save_CV_as_numpy(name, target)
        t.save_CV_as_numpy(name, target, overwrite=True)
        assert np.array_equal(np.load(target, allow_pickle=False),
                              t.CVs[name])


class TestSingleTrajJoinStack:
    """SingleTraj.join/stack (reference ``info_single.py:1778-1798``):
    frame-axis and atom-axis composition, CVs dropped like the reference's
    mdtraj return value."""

    def test_join_frames(self):
        a = SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb")
        b = SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb")
        a.load_CV(np.zeros((a.n_frames, 2)), "lowd")
        j = a.join(b)
        assert j.n_frames == a.n_frames + b.n_frames
        assert j.top.n_atoms == a.top.n_atoms
        np.testing.assert_array_equal(np.asarray(j.xyz)[: a.n_frames],
                                      np.asarray(a.xyz))
        assert not j.CVs  # provenance lost, like the reference
        # operands untouched
        assert a.n_frames == b.n_frames == 100 and "lowd" in a.CVs

    def test_stack_atoms(self):
        a = SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb")
        b = SingleTraj(DATA / "glu7.xtc", DATA / "glu7.pdb")
        s = a.stack(b)
        assert s.top.n_atoms == a.top.n_atoms + b.top.n_atoms
        assert np.asarray(s.xyz).shape == (
            a.n_frames, a.top.n_atoms + b.top.n_atoms, 3
        )
        np.testing.assert_array_equal(
            np.asarray(s.xyz)[:, : a.top.n_atoms], np.asarray(a.xyz)
        )
