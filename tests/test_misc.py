# tests/test_misc.py
"""Offline topology backmapping, clustering, plotting, function decorator,
sparse ADC training, sharded featurization."""

from pathlib import Path

import numpy as np
import pytest

DATA = Path("/root/reference/tests/data")
needs_data = pytest.mark.skipif(
    not DATA.exists(), reason="reference test data not mounted"
)


@needs_data
class TestOfflineBackmapping:
    @pytest.fixture(scope="class")
    def asp7(self):
        from encodermap_tpu.data import SingleTraj

        return SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb")

    def test_guess_bonds_connects_backbone(self, asp7):
        from encodermap_tpu.misc.backmapping_offline import guess_bonds

        bonds = guess_bonds(asp7.top, asp7.xyz[0])
        import networkx as nx

        G = nx.Graph(bonds)
        G.add_nodes_from(range(asp7.top.n_atoms))
        # the protein should be a single connected component
        protein_atoms = [a.index for a in asp7.top.atoms if a.residue.is_protein]
        sub = G.subgraph(protein_atoms)
        assert nx.is_connected(sub)

    def test_rotation_hits_targets(self, asp7):
        """Rotating to target phi/psi values must produce geometry whose
        measured dihedrals equal the targets."""
        from encodermap_tpu.misc.backmapping_offline import backmap_topology
        from tests.reference_impl import dihedral_from_xyz_np

        rng = np.random.default_rng(0)
        phi = asp7.top.indices_phi
        psi = asp7.top.indices_psi
        quads = np.vstack([phi, psi])
        targets = rng.uniform(-np.pi + 0.2, np.pi - 0.2, (3, len(quads))).astype(
            np.float32
        )
        xyz = backmap_topology(asp7.top, asp7.xyz[0], targets)
        assert xyz.shape == (3, asp7.top.n_atoms, 3)
        measured = np.stack(
            [
                dihedral_from_xyz_np(
                    xyz[:, q[0]], xyz[:, q[1]], xyz[:, q[2]], xyz[:, q[3]]
                )
                for q in quads
            ],
            axis=1,
        )
        # periodic distance to targets
        d = np.abs(measured - targets)
        d = np.minimum(d, 2 * np.pi - d)
        assert d.max() < 5e-3, d.max()

    def test_bond_lengths_preserved(self, asp7):
        from encodermap_tpu.misc.backmapping_offline import (
            backmap_topology,
            guess_bonds,
        )

        rng = np.random.default_rng(1)
        n_di = len(asp7.top.indices_phi) + len(asp7.top.indices_psi)
        targets = rng.uniform(-3, 3, (2, n_di)).astype(np.float32)
        xyz = backmap_topology(asp7.top, asp7.xyz[0], targets)
        bonds = np.asarray(guess_bonds(asp7.top, asp7.xyz[0]))
        orig = np.linalg.norm(
            asp7.xyz[0][bonds[:, 0]] - asp7.xyz[0][bonds[:, 1]], axis=-1
        )
        new = np.linalg.norm(
            xyz[:, bonds[:, 0]] - xyz[:, bonds[:, 1]], axis=-1
        )
        np.testing.assert_allclose(
            new, np.broadcast_to(orig, new.shape), atol=1e-4
        )

    def test_dihedral_encodermap_generate(self, asp7, tmp_path):
        """DihedralEncoderMap end-to-end: train on phi/psi, generate onto the
        real topology."""
        from encodermap_tpu import Parameters
        from encodermap_tpu.train.autoencoder import DihedralEncoderMap
        from encodermap_tpu.loading.featurizer import SingleTrajFeaturizer

        feat = SingleTrajFeaturizer(asp7)
        feat.add_backbone_torsions()
        tors = feat.get_output()["BackboneTorsionFeature"].astype(np.float32)
        p = Parameters(
            main_path=str(tmp_path), n_neurons=[16, 16, 2], n_steps=10,
            steps_per_scan=10, batch_size=32, seed=1,
        )
        emap = DihedralEncoderMap(p, tors)
        emap.train()
        out = emap.generate(np.zeros((2, 2), np.float32), top=asp7)
        assert out.xyz.shape == (2, asp7.top.n_atoms, 3)
        assert np.isfinite(out.xyz).all()


class TestClustering:
    def test_centroid(self, rng):
        from encodermap_tpu.misc.clustering import rmsd_centroid_of_cluster

        base = rng.standard_normal((12, 3)).astype(np.float32)
        frames = [base + rng.normal(0, 0.01, base.shape) for _ in range(10)]
        frames.append(base + rng.normal(0, 1.0, base.shape))  # outlier
        idx, dists = rmsd_centroid_of_cluster(np.stack(frames))
        assert idx != 10  # the outlier can't be the centroid
        assert dists.shape == (11, 11)

    def test_cluster_to_dict(self):
        from encodermap_tpu.misc.clustering import cluster_to_dict

        out = cluster_to_dict(np.array([0, 0, 1, -1, 1, 2]))
        assert set(out) == {0, 1, 2}
        np.testing.assert_array_equal(out[1], [2, 4])


class TestFunctionDecorator:
    def test_jit_and_debug(self):
        import jax.numpy as jnp

        from encodermap_tpu.misc.function_def import function

        @function
        def f(x):
            return x * 2

        @function(debug=True)
        def g(x):
            return x * 3

        assert float(f(jnp.asarray(2.0))) == 4.0
        assert float(g(jnp.asarray(2.0))) == 6.0


class TestPlotting:
    def test_free_energy_and_ramachandran(self, rng, tmp_path):
        from encodermap_tpu.plot import plot_free_energy, plot_ramachandran

        latent = rng.standard_normal((500, 2))
        out = plot_free_energy(latent, save_path=tmp_path / "fes.png")
        assert Path(out).exists()
        phi = rng.uniform(-np.pi, np.pi, 300)
        psi = rng.uniform(-np.pi, np.pi, 300)
        out = plot_ramachandran(phi, psi, save_path=tmp_path / "rama.png")
        assert Path(out).exists()

    def test_distance_histogram(self, rng, tmp_path):
        from encodermap_tpu.plot import distance_histogram

        data = rng.uniform(-np.pi, np.pi, (200, 6))
        out = distance_histogram(
            data, 2 * np.pi, (4.5, 12, 6, 1, 2, 6),
            save_path=tmp_path / "hist.png",
        )
        assert Path(out).exists()

    def test_ball_and_stick(self, tmp_path):
        from encodermap_tpu.data import SingleTraj
        from encodermap_tpu.plot import plot_ball_and_stick

        traj = SingleTraj("/root/reference/tests/data/asp7.pdb")
        out = plot_ball_and_stick(traj, save_path=tmp_path / "bs.png")
        assert Path(out).exists() and Path(out).stat().st_size > 0

    def test_ramachandran_input_forms(self, tmp_path):
        """The reference's flexible angles input (``plotting.py:2258``):
        SingleTraj, (psi, phi) tuple, stacked (2, n, k) array, subsample."""
        import numpy as np

        from encodermap_tpu.data import SingleTraj
        from encodermap_tpu.plot import plot_ramachandran

        traj = SingleTraj(
            "/root/reference/tests/data/asp7.xtc",
            "/root/reference/tests/data/asp7.pdb",
        )
        out = plot_ramachandran(traj, save_path=tmp_path / "rama_traj.png")
        assert Path(out).stat().st_size > 0
        rng = np.random.default_rng(0)
        psi = rng.uniform(-np.pi, np.pi, (50, 6))
        phi = rng.uniform(-np.pi, np.pi, (50, 6))
        for form in ((psi, phi), np.stack([psi, phi])):
            out = plot_ramachandran(
                form, save_path=tmp_path / "rama_form.png"
            )
            assert Path(out).stat().st_size > 0
        out = plot_ramachandran(
            (psi, phi), subsample=slice(0, 10),
            save_path=tmp_path / "rama_sub.png",
        )
        assert Path(out).stat().st_size > 0
        # 2-D arrays unpack as interleaved psi/phi rows (reference
        # ``angles[::2]``/``angles[1::2]``, plotting.py:2282)
        interleaved = np.empty((2 * 50, 6))
        interleaved[::2], interleaved[1::2] = psi, phi
        out = plot_ramachandran(
            interleaved, save_path=tmp_path / "rama_2d.png")
        assert Path(out).stat().st_size > 0
        with pytest.raises(ValueError, match="psi"):
            plot_ramachandran(np.zeros(50))

    def test_ramachandran_int_subsample_decimates(self, tmp_path):
        """An int subsample means every-Nth-frame (reference
        ``psi[::subsample]``), not a single frame (ADVICE r3)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from encodermap_tpu.plot import plot_ramachandran

        rng = np.random.default_rng(3)
        psi = rng.uniform(-3, 3, (50, 6))
        phi = rng.uniform(-3, 3, (50, 6))
        fig, ax = plt.subplots()
        try:
            plot_ramachandran((psi, phi), subsample=10, ax=ax)
            counts = ax.collections[-1].get_array()
            assert float(np.sum(counts)) == 5 * 6  # frames 0,10,20,30,40
        finally:
            plt.close(fig)

    def test_ramachandran_degree_autodetect(self, tmp_path):
        """Degree-valued dihedrals must land inside the hist range like the
        reference (deg-vs-rad auto-detect at ``plotting.py:2298``) instead
        of producing an empty [-pi, pi] plot."""
        import matplotlib.pyplot as plt

        from encodermap_tpu.plot import plot_ramachandran

        rng = np.random.default_rng(4)
        psi = np.degrees(rng.uniform(-3, 3, (20, 6)))
        phi = np.degrees(rng.uniform(-3, 3, (20, 6)))
        fig, ax = plt.subplots()
        try:
            plot_ramachandran((psi, phi), ax=ax)
            counts = ax.collections[-1].get_array()
            assert float(np.sum(counts)) == 20 * 6  # nothing clipped
            assert ax.get_xlim() == (-180.0, 180.0)
            assert "deg" in ax.get_xlabel()
        finally:
            plt.close(fig)

    def test_dssp_color_tables_agree(self, tmp_path):
        """plot_dssp's full-mode colors and dssp_to_rgb must be THE same
        table (reference scheme: bend green, turn yellow), and
        residue_subsample=0 must not divide by zero."""
        from encodermap_tpu.data import SingleTraj
        from encodermap_tpu.plot import dssp_to_rgb, plot_dssp
        from encodermap_tpu.plot.plotting import _DSSP_COLORS_FULL

        for code in " BEGHIST":
            assert _DSSP_COLORS_FULL[code] == dssp_to_rgb(code), code
        assert dssp_to_rgb("S") == (0.0, 1.0, 0.0)  # bend green
        assert dssp_to_rgb("T") == (1.0, 1.0, 0.0)  # turn yellow
        traj = SingleTraj("/root/reference/tests/data/asp7.xtc",
                          "/root/reference/tests/data/asp7.pdb")
        out = plot_dssp(traj, simplified=False, residue_subsample=0,
                        save_path=tmp_path / "dssp0.png")
        assert Path(out).stat().st_size > 0

    def test_ball_and_stick_highlight_modes(self, tmp_path):
        """The reference's string highlight modes (``plotting.py:2236``)
        plus the legacy index-sequence form."""
        import pytest

        from encodermap_tpu.data import SingleTraj
        from encodermap_tpu.plot import plot_ball_and_stick

        traj = SingleTraj("/root/reference/tests/data/asp7.pdb")
        for h in ("atoms", "bonds", "angles", "dihedrals", [0, 1, 2]):
            out = plot_ball_and_stick(
                traj, highlight=h, save_path=tmp_path / "bs_mode.png"
            )
            assert Path(out).stat().st_size > 0
        with pytest.raises(ValueError, match="highlight"):
            plot_ball_and_stick(traj, highlight="nope")

    def test_render_vmd_script(self, tmp_path):
        """Without vmd on PATH the tcl script is still generated (same
        structure as reference ``plotting.py:2604``)."""
        from encodermap_tpu.plot import render_vmd

        out = render_vmd(
            "/root/reference/tests/data/asp7.pdb",
            rotation=(90, 0, 45), drawframes=True,
            script_location=tmp_path / "render.tcl", script_only=True,
        )
        txt = Path(out).read_text()
        assert "mol new" in txt and "render Tachyon" in txt
        assert "rotate x by 90" in txt and "mol ssrecalc" in txt

        # snapshot must render via TachyonInternal — a literal 'render
        # snapshot' grabs the (absent) OpenGL window under -dispdev text
        # (reference plotting.py:2783); unknown renderers raise
        out = render_vmd(
            "/root/reference/tests/data/asp7.pdb", renderer="snapshot",
            script_location=tmp_path / "snap.tcl", script_only=True,
        )
        snap = Path(out).read_text()
        assert "render TachyonInternal" in snap
        assert "render snapshot" not in snap
        out = render_vmd(
            "/root/reference/tests/data/asp7.pdb", renderer="STL",
            script_location=tmp_path / "stl.tcl", script_only=True,
        )
        assert "render STL" in Path(out).read_text()
        with pytest.raises(NotImplementedError, match="renderer"):
            render_vmd("/root/reference/tests/data/asp7.pdb",
                       renderer="povray",
                       script_location=tmp_path / "bad.tcl",
                       script_only=True)

    def test_interactive_bezier_path(self):
        """Bezier path mode: quadratic curve through control polygon
        (reference plot/utils.py:582-663)."""
        from encodermap_tpu.plot import InteractivePlotting

        class FakeAE:
            train_data = np.zeros((2, 2), np.float32)

            class p:
                main_path = "/tmp"

            def encode(self, d):
                return np.zeros((len(d), 2), np.float32)

            def generate(self, path):
                return path

        sess = InteractivePlotting(FakeAE())
        out = sess.path([(0, 0), (1, 2), (2, 0)], n=5, mode="bezier")
        np.testing.assert_allclose(out[0], [0, 0], atol=1e-6)
        np.testing.assert_allclose(out[-1], [2, 0], atol=1e-6)
        np.testing.assert_allclose(out[2], [1, 1], atol=1e-6)

    def test_interactive_selection(self, rng, tmp_path):
        from encodermap_tpu import EncoderMap, Parameters
        from encodermap_tpu.plot import InteractivePlotting

        data = rng.standard_normal((200, 4)).astype(np.float32)
        p = Parameters(
            main_path=str(tmp_path), periodicity=float("inf"),
            n_neurons=[8, 8, 2], n_steps=5, steps_per_scan=5, batch_size=32,
            seed=0,
        )
        emap = EncoderMap(p, data)
        emap.train()
        sess = InteractivePlotting(emap, data=data)
        lo, hi = sess.latent.min(0) - 1, sess.latent.max(0) + 1
        idx = sess.select_rectangle(lo[0], lo[1], hi[0], hi[1])
        assert len(idx) == 200  # rectangle covers everything
        path_structures = sess.path([(lo[0], lo[1]), (hi[0], hi[1])], n=7)
        assert path_structures.shape == (7, 4)


class TestSparseADC:
    def test_nan_training(self, tmp_path):
        """Mixed-topology NaN-padded CVs train through the densifier path."""
        from encodermap_tpu import ADCParameters
        from encodermap_tpu.train.adc_autoencoder import (
            AngleDihedralCartesianEncoderMap,
        )
        from tests.test_adc import synthetic_cvs

        rng = np.random.default_rng(3)
        cvs = synthetic_cvs(rng, n_frames=100, n_res=6)
        # knock out some side dihedrals for half the frames (ragged ensemble)
        cvs["side_dihedrals"][:50, -3:] = np.nan
        p = ADCParameters(
            main_path=str(tmp_path), n_neurons=[16, 16, 2], n_steps=10,
            steps_per_scan=5, batch_size=16, use_backbone_angles=True,
            use_sidechains=True, seed=0, checkpoint_step=10**6,
            summary_step=10**6,
        )
        emap = AngleDihedralCartesianEncoderMap(cvs, p)
        assert emap.sparse
        assert "densifiers" in emap.state.params
        history = emap.train()
        assert np.isfinite(history["loss"]).all()

    def test_densifier_frozen_by_default(self, tmp_path):
        from encodermap_tpu import ADCParameters
        from encodermap_tpu.train.adc_autoencoder import (
            AngleDihedralCartesianEncoderMap,
        )
        from tests.test_adc import synthetic_cvs

        rng = np.random.default_rng(4)
        cvs = synthetic_cvs(rng, n_frames=60, n_res=5)
        cvs["central_angles"][:10, 0] = np.nan
        p = ADCParameters(
            main_path=str(tmp_path), n_neurons=[8, 8, 2], n_steps=4,
            steps_per_scan=4, batch_size=8, seed=0,
            checkpoint_step=10**6, summary_step=10**6,
        )
        emap = AngleDihedralCartesianEncoderMap(cvs, p)
        before = np.asarray(emap.state.params["densifiers"]["angles"]["kernel"])
        emap.train()
        after = np.asarray(emap.state.params["densifiers"]["angles"]["kernel"])
        np.testing.assert_array_equal(before, after)


# Every feature-registration call the featurizer surface offers, run through
# BOTH the plain SingleTrajFeaturizer and the mesh-sharded ShardedFeaturizer —
# the analog of the reference's ``TestDaskFeatures(TestFeatures)`` subclass
# that re-runs its whole feature suite through the dask path
# (``/root/reference/tests/test_featurizer.py:3115``).
_SHARDED_FEATURE_CASES = [
    ("selection", lambda f, t: f.add_selection([0, 1, 2])),
    ("all_cartesians", lambda f, t: f.add_all()),
    ("distances_periodic", lambda f, t: f.add_distances(
        [[0, 5], [1, 9], [3, 30]], periodic=True)),
    ("distances_ca", lambda f, t: f.add_distances_ca()),
    ("inverse_distances", lambda f, t: f.add_inverse_distances(
        [[0, 5], [2, 7]])),
    ("contacts", lambda f, t: f.add_contacts([[0, 5], [2, 40]],
                                             threshold=0.45)),
    ("angles_deg", lambda f, t: f.add_angles([[0, 1, 2], [1, 2, 3]],
                                             deg=True)),
    ("dihedrals_cossin", lambda f, t: f.add_dihedrals(
        [[0, 1, 2, 3], [4, 5, 6, 7]], cossin=True)),
    ("backbone_torsions", lambda f, t: f.add_backbone_torsions()),
    ("sidechain_torsions", lambda f, t: f.add_sidechain_torsions()),
    ("residue_mindist", lambda f, t: f.add_residue_mindist()),
    ("group_COM", lambda f, t: f.add_group_COM([[0, 1, 2], [3, 4]])),
    ("residue_COM", lambda f, t: f.add_residue_COM([0, 1])),
    ("minrmsd", lambda f, t: f.add_minrmsd_to_ref(t.xyz[0])),
    ("adc_list_of_feats", lambda f, t: f.add_list_of_feats(
        ["central_cartesians", "central_angles", "side_dihedrals"])),
]


class TestShardedFeaturize:
    @needs_data
    @pytest.mark.parametrize(
        "name,register", _SHARDED_FEATURE_CASES,
        ids=[c[0] for c in _SHARDED_FEATURE_CASES],
    )
    def test_every_feature_matches_single_device(self, name, register):
        """Each feature class produces identical CVs (names, values, order)
        whether run single-device or sharded over the 8-device mesh with
        multiple blocks and a padded final block."""
        from encodermap_tpu.data import SingleTraj
        from encodermap_tpu.loading.featurizer import SingleTrajFeaturizer
        from encodermap_tpu.parallel.sharded_featurize import ShardedFeaturizer

        traj = SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb")
        single = SingleTrajFeaturizer(traj)
        register(single, traj)
        ref_out = single.get_output()

        sharded = ShardedFeaturizer(traj, block_size=64)
        register(sharded, traj)
        out = sharded.get_output()

        assert set(out.keys()) == set(ref_out.keys())
        for k in ref_out.keys():
            np.testing.assert_allclose(
                np.asarray(out[k]), np.asarray(ref_out[k]),
                atol=1e-6, err_msg=f"CV {k!r} diverges on the sharded path",
            )
            assert out.entry(k).labels == ref_out.entry(k).labels

    @needs_data
    def test_custom_host_feature_matches_single_device(self):
        """A host-executed CustomFeature spliced into a device-feature run
        survives the sharded block pipeline (host blocks reused, padding
        trimmed)."""
        import encodermap_tpu as em
        from encodermap_tpu.data import SingleTraj
        from encodermap_tpu.loading.featurizer import SingleTrajFeaturizer
        from encodermap_tpu.parallel.sharded_featurize import ShardedFeaturizer

        traj = SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb")

        def register(f):
            f.add_distances_ca()
            f.add_custom_feature(em.features.CustomFeature(
                fun=lambda t: (t.xyz ** 2).reshape(len(t.xyz), -1),
                dim=traj.n_atoms * 3,
            ))

        single = SingleTrajFeaturizer(traj)
        register(single)
        ref_out = single.get_output()

        sharded = ShardedFeaturizer(traj, block_size=64)
        register(sharded._inner)
        out = sharded.get_output()

        assert set(out.keys()) == set(ref_out.keys())
        for k in ref_out.keys():
            np.testing.assert_allclose(
                np.asarray(out[k]), np.asarray(ref_out[k]), atol=1e-6,
                err_msg=f"CV {k!r} diverges on the sharded path",
            )

    @needs_data
    def test_matches_single_device(self):
        from encodermap_tpu.data import SingleTraj
        from encodermap_tpu.loading.featurizer import SingleTrajFeaturizer
        from encodermap_tpu.parallel.sharded_featurize import ShardedFeaturizer

        traj = SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb")
        single = SingleTrajFeaturizer(traj)
        single.add_list_of_feats(["central_dihedrals"])
        ref_out = single.get_output()["central_dihedrals"]

        sharded = ShardedFeaturizer(traj, block_size=64)
        sharded._inner.add_list_of_feats(["central_dihedrals"])
        out = sharded.get_output()["central_dihedrals"]
        np.testing.assert_allclose(out, ref_out, atol=1e-6)

    @needs_data
    def test_to_hdf5(self, tmp_path):
        import h5py

        from encodermap_tpu.data import SingleTraj
        from encodermap_tpu.parallel.sharded_featurize import ShardedFeaturizer

        traj = SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb")
        sharded = ShardedFeaturizer(traj, block_size=64)
        sharded._inner.add_list_of_feats(["central_angles"])
        sharded.to_hdf5(tmp_path / "cvs.h5")
        with h5py.File(tmp_path / "cvs.h5") as f:
            assert f["CVs/central_angles"].shape == (traj.n_frames, 19)


class TestDashboard:
    def test_gated_on_dash(self):
        """Without dash installed the Dashboard raises a helpful error."""
        from encodermap_tpu.plot import Dashboard

        try:
            import dash  # noqa: F401

            pytest.skip("dash installed; gate not exercised")
        except ImportError:
            pass
        with pytest.raises(ImportError, match="InteractivePlotting"):
            Dashboard(autoencoder=None)

    @pytest.fixture(scope="class")
    def session(self, tmp_path_factory):
        """A DashboardSession over a small trained EncoderMap (headless —
        the page callback logic needs no dash)."""
        import encodermap_tpu as em
        from encodermap_tpu.plot.dashboard import DashboardSession

        tmp = tmp_path_factory.mktemp("dash")
        data, _ = em.create_n_cube(3, points_along_edge=20, seed=0)
        p = em.Parameters(
            main_path=str(tmp), periodicity=float("inf"),
            n_neurons=[8, 8, 2], n_steps=10, steps_per_scan=5,
            batch_size=32, seed=0,
        )
        emap = em.EncoderMap(p, data.astype(np.float32))
        emap.train()
        return DashboardSession(emap, main_path=str(tmp))

    def test_home_page_status(self, session):
        from encodermap_tpu.plot.dashboard import HomePage

        s = HomePage(session).status()
        assert s["model"] == "EncoderMap"
        assert s["trained_steps"] == 10
        assert s["n_trajs"] == 0

    def test_projection_page_lasso_cluster_path(self, session, tmp_path):
        from encodermap_tpu.plot.dashboard import ProjectionPage

        page = ProjectionPage(session)
        d = page.figure_data()
        assert len(d["x"]) == len(session.autoencoder.train_data)

        # lasso covering everything selects everything
        lo_x, hi_x = min(d["x"]) - 1, max(d["x"]) + 1
        lo_y, hi_y = min(d["y"]) - 1, max(d["y"]) + 1
        n = page.select_lasso(
            {"x": [lo_x, hi_x, hi_x, lo_x], "y": [lo_y, lo_y, hi_y, hi_y]}
        )
        assert n == len(d["x"])
        msg = page.write_cluster("headless")
        assert "wrote cluster" in msg

        msg = page.generate_path([(0.0, 0.0), (1.0, 1.0)], n=7)
        assert "7 conformations" in msg
        out = np.load(session.main_path / "generated" / "path_linear_7.npy")
        assert out.shape == (7, 3)

    @needs_data
    def test_upload_traj_top_pages(self, session):
        from encodermap_tpu.plot.dashboard import (
            TopPage,
            TrajPage,
            UploadPage,
        )

        assert TrajPage(session).table_rows() == []
        msg = UploadPage(session).load_trajs(
            [str(DATA / "asp7.xtc")], [str(DATA / "asp7.pdb")]
        )
        assert "Loaded 1" in msg
        rows = TrajPage(session).table_rows()
        assert len(rows) == 1 and rows[0]["n_frames"] == 100

        top = TopPage(session)
        assert len(top.options()) == 1
        desc = top.describe_top(0)
        assert desc and desc[0].startswith("ASP1")


class TestConfig2AlaDipeptide:
    def test_backbone_dihedrals_to_2d(self, tmp_path):
        """BASELINE config 2: Ala-dipeptide backbone dihedrals -> 2D with the
        periodicity-aware sigmoid distance loss."""
        if not DATA.exists():
            pytest.skip("reference test data not mounted")
        from encodermap_tpu import EncoderMap, Parameters
        from encodermap_tpu.data import SingleTraj
        from encodermap_tpu.loading.featurizer import SingleTrajFeaturizer

        traj = SingleTraj(
            DATA / "alanine_dipeptide.xtc", DATA / "alanine_dipeptide.pdb"
        )
        feat = SingleTrajFeaturizer(traj)
        feat.add_backbone_torsions()
        tors = feat.get_output()["BackboneTorsionFeature"].astype(np.float32)
        assert tors.shape[1] == 2  # ala2 has exactly phi+psi

        p = Parameters(
            main_path=str(tmp_path), periodicity=2 * np.pi,
            n_neurons=[16, 16, 2], n_steps=30, steps_per_scan=15,
            batch_size=16, seed=0,
        )
        emap = EncoderMap(p, tors)
        history = emap.train()
        assert np.isfinite(history["loss"]).all()
        latent = emap.encode(tors)
        assert latent.shape == (len(tors), 2)
        back = emap.generate(latent[:5])
        assert np.all(np.abs(back) <= np.pi + 1e-5)


@needs_data
class TestProlineHandling:
    def test_1am7_prolines_skipped(self, capsys):
        """The 158-residue lysozyme has 5 prolines whose phi bonds are ring
        bonds; backmapping skips them and rotates everything else."""
        from encodermap_tpu.data import SingleTraj
        from encodermap_tpu.misc.backmapping_offline import backmap_topology

        t = SingleTraj(DATA / "1am7_corrected.xtc", DATA / "1am7_protein.pdb")
        n_pro = sum(1 for r in t.top.residues if r.name == "PRO")
        assert n_pro == 5
        n_di = len(t.top.indices_phi) + len(t.top.indices_psi)
        rng = np.random.default_rng(0)
        targets = rng.uniform(-3, 3, (2, n_di)).astype(np.float32)
        xyz = backmap_topology(t.top, t.xyz[0], targets)
        assert xyz.shape == (2, t.top.n_atoms, 3)
        assert np.isfinite(xyz).all()
        assert "skipping 5 unrotatable" in capsys.readouterr().out


@needs_data
class TestDisulfideBridges:
    """Cross-residue S-S bonds enter the rotation graph; dihedrals inside a
    disulfide-closed loop are unrotatable and the bridge geometry survives
    backmapping (reference ``misc/backmapping.py:1027-1790``)."""

    @pytest.fixture(scope="class")
    def yuf(self):
        from encodermap_tpu.data import SingleTraj

        # 1YUF: 46-residue domain with 3 disulfide bridges
        # (CYS8-CYS21, CYS16-CYS32, CYS34-CYS43)
        return SingleTraj(DATA / "1YUF.pdb")

    def test_guess_bonds_finds_ss_bridges(self, yuf):
        from encodermap_tpu.misc.backmapping_offline import guess_bonds

        bonds = guess_bonds(yuf.top, yuf.xyz[0])
        ss = [
            (a, b) for a, b in bonds
            if yuf.top.atom(a).element.upper() == "S"
            and yuf.top.atom(b).element.upper() == "S"
        ]
        assert len(ss) == 3
        # bridges span non-adjacent residues — the same/adjacent-residue
        # pass alone can never find them
        spans = [
            abs(yuf.top.atom(a).residue.index - yuf.top.atom(b).residue.index)
            for a, b in ss
        ]
        assert min(spans) >= 9

    def test_bridges_preserved_after_backmap(self, yuf, capsys):
        from encodermap_tpu.misc.backmapping_offline import (
            backmap_topology,
            guess_bonds,
            near_and_far_masks,
        )

        top, base = yuf.top, yuf.xyz[0]
        bonds = guess_bonds(top, base)
        ss = [
            (a, b) for a, b in bonds
            if top.atom(a).element.upper() == "S"
            and top.atom(b).element.upper() == "S"
        ]
        quads = np.vstack([top.indices_phi, top.indices_psi])
        masks, rotatable = near_and_far_masks(top, quads, bonds=bonds)
        # backbone bonds inside any S-S-closed loop are ring bonds
        assert (~rotatable).sum() > 10
        assert rotatable.sum() > 10  # termini outside the loops still rotate

        rng = np.random.default_rng(1)
        targets = rng.uniform(-3, 3, (2, len(quads))).astype(np.float32)
        out = backmap_topology(top, base, targets)
        assert "unrotatable" in capsys.readouterr().out
        before = np.array([np.linalg.norm(base[a] - base[b]) for a, b in ss])
        for frame in out:
            after = np.array(
                [np.linalg.norm(frame[a] - frame[b]) for a, b in ss]
            )
            np.testing.assert_allclose(after, before, atol=1e-3)


class TestTrajRotate:
    """traj_rotate: the mdtraj_rotate analog (reference misc/rotate.py:117)."""

    def test_sets_requested_dihedrals(self):
        from encodermap_tpu.data import SingleTraj
        from encodermap_tpu.misc.backmapping_offline import traj_rotate
        from tests.reference_impl import dihedral_from_xyz_np

        t = SingleTraj("/root/reference/tests/data/asp7.pdb")
        idx = t.top.indices_psi[:3]
        targets = np.array([[0.5, -1.0, 2.0], [1.5, 0.3, -2.5]], np.float32)
        out = traj_rotate(t, targets, idx)
        assert out.shape == (2, t.top.n_atoms, 3)
        meas = np.stack(
            [dihedral_from_xyz_np(out[:, q[0]], out[:, q[1]], out[:, q[2]],
                                  out[:, q[3]]) for q in idx], axis=1,
        )
        d = np.abs(meas - targets)
        assert np.minimum(d, 2 * np.pi - d).max() < 1e-5

    def test_degrees(self):
        from encodermap_tpu.data import SingleTraj
        from encodermap_tpu.misc.backmapping_offline import traj_rotate
        from tests.reference_impl import dihedral_from_xyz_np

        t = SingleTraj("/root/reference/tests/data/asp7.pdb")
        idx = t.top.indices_psi[:1]
        out = traj_rotate(t, np.array([[90.0]]), idx, deg=True)
        q = idx[0]
        meas = dihedral_from_xyz_np(out[:, q[0]], out[:, q[1]], out[:, q[2]],
                                    out[:, q[3]])
        np.testing.assert_allclose(meas, np.pi / 2, atol=1e-5)

    def test_reference_named_wrappers(self):
        """mdtraj_backmapping/mdtraj_rotate: the reference-named entry
        points (``misc/backmapping.py:1027``, ``misc/rotate.py:117``)
        resolve trajs/top, honor angle_type and column order, and return
        the rotated index tables on request."""
        from encodermap_tpu.data import SingleTraj, TrajEnsemble
        from encodermap_tpu.loading.features import CentralDihedrals
        from encodermap_tpu.misc.backmapping_offline import (
            mdtraj_backmapping,
            mdtraj_rotate,
            traj_rotate,
        )

        t = SingleTraj("/root/reference/tests/data/asp7.pdb")
        idx = t.top.indices_psi[:2]
        targets = np.array([[0.5, -1.0]], np.float32)
        np.testing.assert_array_equal(
            mdtraj_rotate(t, targets, idx), traj_rotate(t, targets, idx)
        )

        # central_dihedrals column order via trajs=
        cd = CentralDihedrals(t.top)
        rng = np.random.default_rng(1)
        dih = rng.uniform(-3, 3, (2, len(cd._indices))).astype(np.float32)
        out, tables = mdtraj_backmapping(
            trajs=TrajEnsemble([t]), dihedrals=dih, return_indices=True
        )
        assert out.shape == (2, t.top.n_atoms, 3)
        np.testing.assert_array_equal(tables["dihedrals"], cd._indices)

        # phi+psi order via a top path + degree conversion
        phi, psi = t.top.indices_phi, t.top.indices_psi
        dih_deg = np.degrees(
            rng.uniform(-3, 3, (1, len(phi) + len(psi)))
        ).astype(np.float32)
        out_deg = mdtraj_backmapping(
            top="/root/reference/tests/data/asp7.pdb",
            dihedrals=dih_deg, angle_type="degree",
        )
        out_rad = mdtraj_backmapping(
            top="/root/reference/tests/data/asp7.pdb",
            dihedrals=np.radians(dih_deg),
        )
        np.testing.assert_allclose(out_deg, out_rad, atol=1e-6)

        with pytest.raises(ValueError, match="dihedrals"):
            mdtraj_backmapping(trajs=TrajEnsemble([t]))
        with pytest.raises(ValueError, match="columns"):
            mdtraj_backmapping(
                trajs=TrajEnsemble([t]), dihedrals=np.zeros((1, 3))
            )

    def test_angle_type_unit_sanity(self):
        """The reference refuses unit-mislabeled dihedrals
        (``misc/backmapping.py:1232-1281``, mirrored from its
        ``test_backmapping_em1_em2.py`` deg/rad case matrix): radian input
        must stay within pi, degree input must exceed pi somewhere, and
        dihedrals/sidechain_dihedrals must agree on the frame count."""
        from encodermap_tpu.data import SingleTraj, TrajEnsemble
        from encodermap_tpu.loading.features import (
            CentralDihedrals,
            SideChainDihedrals,
        )
        from encodermap_tpu.misc.backmapping_offline import mdtraj_backmapping

        t = SingleTraj("/root/reference/tests/data/asp7.pdb")
        trajs = TrajEnsemble([t])
        n_c = len(CentralDihedrals(t.top)._indices)
        n_s = len(SideChainDihedrals(t.top)._indices)
        rng = np.random.default_rng(3)
        rad_c = rng.uniform(-np.pi, np.pi, (4, n_c)).astype(np.float32)
        rad_s = rng.uniform(-np.pi, np.pi, (4, n_s)).astype(np.float32)
        deg_c = np.degrees(rad_c)
        deg_s = np.degrees(rad_s)

        with pytest.raises(ValueError, match="look like degrees"):
            mdtraj_backmapping(trajs=trajs, dihedrals=deg_c,
                               sidechain_dihedrals=deg_s)
        with pytest.raises(ValueError, match="look like radians"):
            mdtraj_backmapping(trajs=trajs, dihedrals=rad_c,
                               sidechain_dihedrals=rad_s,
                               angle_type="degree")
        # valid central block but mislabeled sidechains still raises
        with pytest.raises(ValueError, match="sidechain"):
            mdtraj_backmapping(trajs=trajs, dihedrals=rad_c,
                               sidechain_dihedrals=deg_s)
        with pytest.raises(ValueError, match="must be the same"):
            mdtraj_backmapping(trajs=trajs, dihedrals=deg_c,
                               sidechain_dihedrals=deg_s[:2],
                               angle_type="degree")
        out = mdtraj_backmapping(trajs=trajs, dihedrals=deg_c,
                                 sidechain_dihedrals=deg_s,
                                 angle_type="degree")
        out_rad = mdtraj_backmapping(trajs=trajs, dihedrals=rad_c,
                                     sidechain_dihedrals=rad_s)
        # f32 deg<->rad rounding amplifies through the rotation chain
        np.testing.assert_allclose(out, out_rad, atol=1e-4)

    def test_top_int_indexes_lists_and_single_trajs(self):
        """top=<int> must index plain lists like TrajEnsembles, and pair
        sanely with a bare SingleTraj (ADVICE r3)."""
        from encodermap_tpu.data import SingleTraj, TrajEnsemble
        from encodermap_tpu.loading.features import CentralDihedrals
        from encodermap_tpu.misc.backmapping_offline import mdtraj_backmapping

        asp7 = SingleTraj("/root/reference/tests/data/asp7.pdb")
        glu7 = SingleTraj("/root/reference/tests/data/glu7.pdb")
        cd = CentralDihedrals(glu7.top)
        rng = np.random.default_rng(2)
        dih = rng.uniform(-3, 3, (1, len(cd._indices))).astype(np.float32)

        out_list = mdtraj_backmapping(top=1, trajs=[asp7, glu7],
                                      dihedrals=dih)
        out_ens = mdtraj_backmapping(top=1, trajs=TrajEnsemble([asp7, glu7]),
                                     dihedrals=dih)
        assert out_list.shape == (1, glu7.top.n_atoms, 3)
        np.testing.assert_array_equal(out_list, out_ens)

        out_single = mdtraj_backmapping(top=0, trajs=glu7, dihedrals=dih)
        np.testing.assert_array_equal(out_single, out_ens)
        with pytest.raises(ValueError, match="single trajectory"):
            mdtraj_backmapping(top=1, trajs=glu7, dihedrals=dih)

        # no top: a plain list seeds from its first element (ADVICE r3)
        out_fallback = mdtraj_backmapping(trajs=[glu7, asp7], dihedrals=dih)
        np.testing.assert_array_equal(out_fallback, out_ens)
        with pytest.raises(ValueError, match="empty"):
            mdtraj_backmapping(trajs=[], dihedrals=dih)


class TestPlottingBuildingBlocks:
    """get_histogram/density/free-energy pipeline + raw data, end-to-end,
    and latent animation (reference plotting.py:115-310, 1103, 2123, 2504)."""

    def test_free_energy_pipeline(self, rng):
        from encodermap_tpu.plot import (get_density, get_free_energy,
                                         get_histogram, to_free_energy)

        x, y = rng.standard_normal((2, 500))
        # reference return order (plotting.py:115-194): centers are 1-D and
        # H comes LAST when edges are requested
        xc, yc, xe, ye, H = get_histogram(x, y, bins=20, return_edges=True)
        assert H.sum() == 500 and len(xe) == 21
        assert xc.shape == (20,) and yc.shape == (20,)
        np.testing.assert_allclose(xc, (xe[:-1] + xe[1:]) / 2)
        _, _, D = get_density(x, y, bins=20)
        np.testing.assert_allclose(D.sum(), 1.0)
        # reference default: UNSHIFTED -kT ln(density) (minener_zero=False,
        # plotting.py:240-310); the shift is opt-in
        _, _, F = get_free_energy(x, y, bins=20)
        finite = F[np.isfinite(F)]
        assert finite.min() > 0.0  # -log(max density) with density < 1
        _, _, F0 = get_free_energy(x, y, bins=20, minener_zero=True)
        finite0 = F0[np.isfinite(F0)]
        assert finite0.min() == 0.0
        np.testing.assert_allclose(finite - finite.min(), finite0)
        assert np.isinf(to_free_energy(np.array([[0.0, 1.0]]))[0, 0])

    def test_raw_data_end2end_animation(self, rng, tmp_path):
        from encodermap_tpu.data import SingleTraj
        from encodermap_tpu.plot import (animate_lowd_trajectory,
                                         plot_end2end, plot_raw_data)

        out = plot_raw_data(rng.standard_normal((50, 6)),
                            labels=[f"f{i}" for i in range(6)],
                            save_path=tmp_path / "raw.png")
        assert Path(out).stat().st_size > 0
        traj = SingleTraj("/root/reference/tests/data/asp7.xtc",
                          "/root/reference/tests/data/asp7.pdb")
        out = plot_end2end(traj, save_path=tmp_path / "e2e.png")
        assert Path(out).stat().st_size > 0
        out = animate_lowd_trajectory(rng.standard_normal((30, 2)),
                                      tmp_path / "anim.gif", stride=3)
        assert Path(out).stat().st_size > 0


class TestInteractiveTools:
    """Headless logic of the interactive sigmoid tuner and path scrubber
    (reference plotting.py:1517-2023)."""

    def test_distance_histogram_interactive(self, rng):
        import encodermap_tpu as em
        from encodermap_tpu.plot import DistanceHistogramInteractive

        data = rng.uniform(-np.pi, np.pi, (80, 6)).astype(np.float32)
        h = DistanceHistogramInteractive(data, 2 * np.pi)
        xh, yh, xl, yl = h.update(sig_h=3.0, a_l=4)
        assert h.params == (3.0, 12, 6, 1, 4, 6)
        assert np.isfinite(yh).all() and np.isfinite(yl).all()
        assert yh[0] < 0.01 and yh[-1] > 0.9  # sigmoid goes 0 -> 1
        p = em.Parameters()
        h.apply(p)
        assert p.dist_sig_parameters == (3.0, 12, 6, 1, 4, 6)

    def test_distance_histogram_mpl_fallback(self, rng):
        """The ipywidgets-free tuner UI: matplotlib Slider widgets respond
        to set_val on the Agg backend and write through to .params."""
        from encodermap_tpu.plot import DistanceHistogramInteractive

        data = rng.uniform(-np.pi, np.pi, (60, 4)).astype(np.float32)
        h = DistanceHistogramInteractive(data, 2 * np.pi)
        sliders = h._show_mpl()
        assert set(sliders) == {"sig_h", "a_h", "b_h", "sig_l", "a_l", "b_l"}
        sliders["sig_h"].set_val(3.25)
        assert h.params[0] == pytest.approx(3.25)
        import matplotlib.pyplot as plt

        plt.close("all")

    def test_path_visualization_mpl_fallback(self, rng, monkeypatch):
        """Without ipywidgets the scrubber falls back to a matplotlib
        Slider; the returned box still carries children/_figure/_on_change."""
        import sys
        from types import SimpleNamespace

        import encodermap_tpu.plot.interactive  # ensure module imported

        monkeypatch.setitem(sys.modules, "ipywidgets", None)  # import fails
        from encodermap_tpu.plot import interactive_path_visualization

        path = rng.standard_normal((8, 2)).astype(np.float32)
        traj = SimpleNamespace(xyz=np.zeros((8, 5, 3)))
        box = interactive_path_visualization(
            traj, rng.standard_normal((50, 2)), path
        )
        from matplotlib.widgets import Slider

        assert isinstance(box.children[0], Slider)
        box.children[0].set_val(5)  # scrub via the widget
        box._on_change(2)           # and via the callback directly
        import matplotlib.pyplot as plt

        plt.close("all")

    def test_path_visualization_widget(self, rng):
        from types import SimpleNamespace

        from encodermap_tpu.plot import interactive_path_visualization

        path = rng.standard_normal((10, 2)).astype(np.float32)
        traj = SimpleNamespace(xyz=np.zeros((10, 5, 3)))
        box = interactive_path_visualization(
            traj, rng.standard_normal((100, 2)), path
        )
        box._on_change({"new": 7})  # scrub without a display
        with pytest.raises(AssertionError):
            interactive_path_visualization(
                SimpleNamespace(xyz=np.zeros((3, 5, 3))),
                rng.standard_normal((100, 2)), path,
            )


class TestReviewRegressions:
    """Regressions from the round-2 code review."""

    def test_path_rejects_single_control_point(self, rng):
        from encodermap_tpu.plot.interactive import InteractivePlotting

        class FakeAE:
            train_data = rng.standard_normal((10, 3)).astype(np.float32)

            class p:
                main_path = "."

            def encode(self, data):
                return np.asarray(data)[:, :2]

            def generate(self, z):
                return np.asarray(z)

        session = InteractivePlotting(FakeAE())
        with pytest.raises(ValueError, match="at least 2"):
            session.path([(0.0, 0.0)], n=5)

    def test_path_coincident_control_points(self, rng):
        """All-identical control points (degenerate lasso) must not produce
        NaN — the path collapses to the single point."""
        from encodermap_tpu.plot.interactive import InteractivePlotting

        class FakeAE:
            train_data = rng.standard_normal((10, 3)).astype(np.float32)

            class p:
                main_path = "."

            def encode(self, data):
                return np.asarray(data)[:, :2]

            def generate(self, z):
                return np.asarray(z)

        session = InteractivePlotting(FakeAE())
        out = session.path([(1.0, 2.0), (1.0, 2.0)], n=4)
        assert np.isfinite(out).all()
        np.testing.assert_allclose(out, np.tile([1.0, 2.0], (4, 1)))

    def test_dashboard_load_project_signature(self, monkeypatch):
        """UploadPage.load_project must call get_from_kondata with a valid
        signature (regression: passed a nonexistent kwarg)."""
        import encodermap_tpu.kondata as kondata
        from encodermap_tpu.plot.dashboard import DashboardSession, UploadPage

        calls = {}

        def fake(dataset_name, **kwargs):
            import inspect

            sig = inspect.signature(kondata.get_from_kondata)
            sig.bind(dataset_name, **kwargs)  # raises on bad kwargs
            calls["name"] = dataset_name
            return "/tmp/fake_project"

        monkeypatch.setattr(kondata, "get_from_kondata", fake)
        page = UploadPage(DashboardSession())
        msg = page.load_project("two_state")
        assert calls["name"] == "two_state"
        assert "two_state" in msg

    def test_prefetch_close_waits_for_worker(self):
        """close() must not return while the worker is mid-item (the owner
        closes the underlying file right after)."""
        import threading
        import time

        from encodermap_tpu.train.core import PrefetchSource

        in_read = threading.Event()
        reading = {"active": False, "violation": False}

        class SlowSource:
            def __iter__(self):
                return self

            def __next__(self):
                reading["active"] = True
                in_read.set()
                time.sleep(0.5)  # a long h5 read
                reading["active"] = False
                return 1

        src = PrefetchSource(SlowSource(), depth=1)
        in_read.wait(timeout=5)
        src.close()
        # after close returns, the worker must be fully out of __next__
        assert reading["active"] is False


class TestSmallUtilityParity:
    """The reference's small user-facing helpers: ``misc.misc`` utilities,
    Szudzik pairing, DSSP display maps, directory CV loading
    (``misc/misc.py:176-426``, ``loading/features.py:219-351``,
    ``plot/plotting.py:1650,2442-2516``, ``trajinfo_utils.py:2418``)."""

    def test_all_equal(self):
        from encodermap_tpu.misc import all_equal

        assert all_equal([1, 1, 1])
        assert not all_equal([1, 2, 1])
        assert all_equal([])
        assert all_equal(iter("aaa"))

    def test_match_files(self):
        from encodermap_tpu.misc import match_files

        tops, cs = match_files(
            ["/data/asp7/asp7.xtc", "/data/glu7/glu7_traj.xtc"],
            ["/tops/asp7.pdb", "/tops/glu7.pdb"],
            ["asp7", "glu7"],
        )
        assert tops == ["/tops/asp7.pdb", "/tops/glu7.pdb"]
        assert cs == ["asp7", "glu7"]
        # rightmost occurrence wins: file under a misleading parent dir
        tops, cs = match_files(
            ["/data/glu7/asp7.xtc"], ["/tops/asp7.pdb", "/tops/glu7.pdb"],
            ["asp7", "glu7"],
        )
        assert tops == ["/tops/asp7.pdb"] and cs == ["asp7"]
        # self-topologied h5 trajs return themselves (loop path: list
        # lengths differ, so the aligned-h5 early return doesn't fire)
        tops, cs = match_files(
            ["/data/asp7.h5", "/data/glu7.h5"], ["/tops/asp7.pdb"],
            ["asp7", "glu7"],
        )
        assert tops == ["/data/asp7.h5", "/data/glu7.h5"]
        assert cs == ["asp7", "glu7"]
        with pytest.raises(Exception, match="does not match"):
            match_files(["/data/lys8.xtc"], ["/tops/asp7.pdb"], ["asp7"])

    def test_print_table(self):
        from encodermap_tpu.misc import printTable

        rows = [
            {"name": "a", "value": 1},
            {"name": "longer_name", "value": 22},
        ]
        out = printTable(rows)
        lines = out.split("  \n")
        # header + dashed rule + 2 rows (the reference ALWAYS emits one
        # rule after the header, misc.py:374-378)
        assert len(lines) == 4
        assert all(ln.startswith("    ") for ln in lines)
        assert "name" in lines[0] and "value" in lines[0]
        assert set(lines[1].strip()) <= {"-", "+"}
        assert "longer_name" in lines[3]
        # all rows align on the same column widths
        assert len(set(map(len, lines))) == 1
        # multi-line cells via sep insert a dashed rule after the header
        out = printTable(
            [{"k": "line1\nline2", "v": "x"}], colList=["k", "v"], sep="\n"
        )
        lines = out.split("  \n")
        assert "-+-" in lines[1]
        assert "line1" in lines[2] and "line2" in lines[3]

    def test_arbitrary_dihedral_matches_geometry_kernel(self):
        import jax.numpy as jnp

        from encodermap_tpu.misc import arbitrary_dihedral
        from encodermap_tpu.ops.geometry import compute_dihedrals

        rng = np.random.default_rng(7)
        pos = rng.normal(size=(32, 4, 3)).astype(np.float32)
        host = arbitrary_dihedral(pos)
        dev = np.asarray(
            compute_dihedrals(jnp.asarray(pos), jnp.asarray([[0, 1, 2, 3]]))
        )[:, 0]
        np.testing.assert_allclose(host, dev, atol=2e-5)

    def test_szudzik_pair_unpair(self):
        from encodermap_tpu.loading.features import pair, unpair

        assert unpair(pair(0, 0)) == [0, 0]
        assert unpair(pair(3, 5)) == [3, 5]
        assert unpair(pair(5, 3)) == [5, 3]  # ordered, not symmetric
        assert pair(3, 5) != pair(5, 3)
        assert unpair(pair(12, 35, 99), n=3) == [12, 35, 99]
        # bijectivity on a grid
        seen = set()
        for a in range(30):
            for b in range(30):
                seen.add(pair(a, b))
        assert len(seen) == 900
        with pytest.raises(ValueError):
            pair(7)
        with pytest.raises(ValueError):
            pair(-1, 2)
        with pytest.raises(ValueError):
            unpair(-3)

    def test_dssp_display_maps(self):
        from encodermap_tpu.plot import dssp_to_rgb, dssp_to_text

        assert dssp_to_text("H") == "Alpha-helix"
        assert dssp_to_text("H", simplified=True) == "Helical"
        assert dssp_to_text(" ") == "Coil"
        assert dssp_to_rgb("E") == (1.0, 0.0, 0.0)
        assert dssp_to_rgb("C", simplified=True) == (1.0, 1.0, 1.0)
        with pytest.raises(KeyError):
            dssp_to_text("Z")

    def test_describe_last_feats(self, capsys):
        import encodermap_tpu as em
        from encodermap_tpu.loading.features import describe_last_feats
        from encodermap_tpu.loading.featurizer import SingleTrajFeaturizer

        traj = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))
        feat = SingleTrajFeaturizer(traj)
        feat.add_list_of_feats(["central_dihedrals"])
        describe_last_feats(feat, n=3)
        printed = capsys.readouterr().out.strip().splitlines()
        assert printed == feat.describe()[-3:]

    def test_distance_histogram_interactive_function(self):
        from encodermap_tpu.plot import distance_histogram_interactive

        rng = np.random.default_rng(0)
        data = rng.normal(size=(64, 6)).astype(np.float32)
        tuner = distance_histogram_interactive(data, float("inf"))
        x_h, y_h, x_l, y_l = tuner.update(sig_h=3.0)
        assert tuner.params[0] == 3.0
        assert np.isfinite(y_h).all() and np.isfinite(y_l).all()

    @needs_data
    def test_load_cvs_from_dir(self, tmp_path):
        import encodermap_tpu as em

        t1 = em.load(str(DATA / "asp7.xtc"), str(DATA / "asp7.pdb"))
        t2 = em.load(str(DATA / "glu7.xtc"), str(DATA / "glu7.pdb"))
        trajs = em.TrajEnsemble([t1, t2])
        v1 = np.random.default_rng(1).normal(
            size=(t1.n_frames, 4)).astype(np.float32)
        v2 = np.random.default_rng(2).normal(
            size=(t2.n_frames, 4)).astype(np.float32)
        np.save(tmp_path / "asp7_my_cv.npy", v1)
        np.save(tmp_path / "glu7_my_cv.npy", v2)
        # a .txt decoy with the same basename: .npy must win
        np.savetxt(tmp_path / "asp7_other.txt", v1[:, 0])
        trajs.load_CVs(str(tmp_path), attr_name="my_cv")
        np.testing.assert_array_equal(t1.CVs["my_cv"], v1)
        np.testing.assert_array_equal(t2.CVs["my_cv"], v2)
        # unmatched trajectory raises
        t3 = em.load(str(DATA / "1am7_corrected.xtc"),
                     str(DATA / "1am7_protein.pdb"))
        with pytest.raises(FileNotFoundError, match="matches trajectory"):
            em.TrajEnsemble([t3]).load_CVs_from_dir(tmp_path)


class TestInteractivePlottingInstantiation:
    """The reference's instantiation matrix (``tests/
    test_interactive_plotting.py:141-305``): data can come from the
    autoencoder, explicit arrays, or trajs CVs named lowd/highd; no
    autoencoder requires both."""

    def _fake_ae(self, n=50, d=8):
        rng = np.random.default_rng(0)

        class FakeAE:
            train_data = rng.normal(size=(n, d)).astype(np.float32)

            class p:
                main_path = "."

            def encode(self, data=None):
                data = self.train_data if data is None else data
                return np.asarray(data)[:, :2]

            def generate(self, lowd):
                return np.repeat(np.asarray(lowd), 4, axis=1)

        return FakeAE()

    def test_no_autoencoder_requires_both(self):
        from encodermap_tpu.plot import InteractivePlotting

        lowd = np.random.default_rng(1).normal(size=(50, 2))
        highd = np.random.default_rng(2).normal(size=(50, 8))
        sess = InteractivePlotting(lowd_data=lowd, highd_data=highd)
        assert sess.latent.shape == (50, 2)
        with pytest.raises(AssertionError):
            InteractivePlotting(lowd_data=lowd)
        with pytest.raises(AssertionError):
            InteractivePlotting(highd_data=highd)

    def test_lowd_from_trajs_cv(self):
        from pathlib import Path

        from encodermap_tpu.data import SingleTraj, TrajEnsemble
        from encodermap_tpu.plot import InteractivePlotting

        D = Path("/root/reference/tests/data")
        if not D.exists():
            pytest.skip("no reference data")
        t = SingleTraj(D / "asp7.xtc", D / "asp7.pdb")
        trajs = TrajEnsemble([t])
        rng = np.random.default_rng(3)
        trajs.load_CVs(rng.normal(size=(trajs.n_frames, 2)).astype(
            np.float32), "lowd")
        trajs.load_CVs(rng.normal(size=(trajs.n_frames, 8)).astype(
            np.float32), "highd")
        sess = InteractivePlotting(trajs=trajs)
        assert sess.latent.shape == (trajs.n_frames, 2)

    def test_autoencoder_generate_and_write_cluster(self, tmp_path):
        from encodermap_tpu.plot import InteractivePlotting

        ae = self._fake_ae()
        sess = InteractivePlotting(ae, main_path=tmp_path)
        path = np.linspace([-1, -1], [1, 1], 10)
        out = sess.generate(path)
        assert np.asarray(out).shape == (10, 8)
        lo = sess.latent.min(0) - 1
        hi = sess.latent.max(0) + 1
        sess.select([(lo[0], lo[1]), (hi[0], lo[1]), (hi[0], hi[1]),
                     (lo[0], hi[1])])
        assert len(sess.selection) == 50


class TestDeleteBonds:
    """CustomAAsDict 'delete_bonds' / 'optional_delete_bonds' semantics
    (reference ``trajinfo_utils.py:980-991`` and the phosphothreonine
    custom-AAs test, ``tests/test_featurizer.py:2586-2700``)."""

    @pytest.fixture()
    def asp7(self):
        from encodermap_tpu.data import SingleTraj

        return SingleTraj("/root/reference/tests/data/asp7.xtc",
                          "/root/reference/tests/data/asp7.pdb")

    def test_optional_delete_removes_guessed_bond(self, asp7):
        from encodermap_tpu.misc.backmapping_offline import guess_bonds

        custom = {"ASP": (
            "D", {"optional_delete_bonds": [("CB", "CG")]},
        )}
        plain = guess_bonds(asp7.top, asp7.xyz[0])
        asp7.load_custom_topology(custom)
        pruned = guess_bonds(asp7.top, asp7.xyz[0])
        cb_cg = [
            (a, b) for a, b in plain
            if {asp7.top.atom(a).name, asp7.top.atom(b).name} == {"CB", "CG"}
        ]
        assert cb_cg, "sanity: ASP CB-CG bonds are guessed"
        assert all(p not in pruned for p in cb_cg)
        assert len(pruned) == len(plain) - len(cb_cg)

    def test_strict_delete_of_missing_bond_raises(self, asp7):
        # N and OD2 of the same ASP are never within covalent range; the
        # strict form raises EARLY, at topology-patch time (like the
        # reference), not geometry-dependently inside later guessing
        with pytest.raises(ValueError, match="optional_delete_bonds"):
            asp7.load_custom_topology(
                {"ASP": ("D", {"delete_bonds": [("N", "OD2")]})}
            )

    def test_strict_delete_validated_once_then_inert(self, asp7):
        from encodermap_tpu.misc.backmapping_offline import guess_bonds

        # a real bond deletes strictly without error ...
        asp7.load_custom_topology(
            {"ASP": ("D", {"delete_bonds": [("CB", "CG")]})}
        )
        # ... and afterwards even distorted coordinates (where the bond
        # would never be guessed) cannot raise from inside plotting or
        # backmapping paths
        far = asp7.xyz[0] + np.arange(asp7.n_atoms)[:, None] * 10.0
        bonds = guess_bonds(asp7.top, far)
        assert isinstance(bonds, list)

    def test_custom_topology_instance_route_carries_deletes(self, asp7):
        from encodermap_tpu.data.custom_topology import CustomTopology
        from encodermap_tpu.misc.backmapping_offline import guess_bonds

        ct = CustomTopology.from_custom_aas(
            asp7.top, {"ASP": ("D", {"optional_delete_bonds": [("CB", "CG")]})}
        )
        asp7.load_custom_topology(ct)  # instance, not dict
        names = {
            frozenset((asp7.top.atom(a).name, asp7.top.atom(b).name))
            for a, b in guess_bonds(asp7.top, asp7.xyz[0])
        }
        assert frozenset(("CB", "CG")) not in names

    def test_int_atom_indices_in_bond_tables(self, asp7):
        from encodermap_tpu.misc.backmapping_offline import guess_bonds

        plain = guess_bonds(asp7.top, asp7.xyz[0])
        lo, hi = plain[0]
        asp7.load_custom_topology(
            {"ASP": ("D", {"optional_delete_bonds": [(lo, hi)]})}
        )
        assert (lo, hi) not in guess_bonds(asp7.top, asp7.xyz[0])

    def test_delete_bonds_survive_json_roundtrip(self, asp7):
        from encodermap_tpu.data.custom_topology import CustomTopology
        from encodermap_tpu.misc.backmapping_offline import guess_bonds

        custom = {"ASP": ("D", {"optional_delete_bonds": [("CB", "CG")]})}
        ct = CustomTopology.from_custom_aas(asp7.top, custom)
        ct2 = CustomTopology.from_json(asp7.top, ct.to_json())
        assert ct2._delete_bonds == ct._delete_bonds
        top2 = ct2.apply()
        bonds = guess_bonds(top2, asp7.xyz[0])
        names = {
            frozenset((top2.atom(a).name, top2.atom(b).name))
            for a, b in bonds
            if top2.atom(a).residue.name == "ASP"
            and top2.atom(b).residue.name == "ASP"
        }
        assert frozenset(("CB", "CG")) not in names

    def test_reference_phospho_shape_parses(self, asp7):
        """The exact CustomAAsDict shape of the reference's
        phosphothreonine test (optional_bonds with -C/+N reach,
        optional_delete_bonds, CHI2/CHI3, None-valued solvent residues)
        is accepted."""
        custom = {
            "CLA": None,
            "THR": ("T", {
                "optional_bonds": [
                    ("-C", "N"), ("N", "CA"), ("CB", "OG1"),
                    ("OG1", "P"), ("P", "OXT"), ("C", "+N"),
                ],
                "optional_delete_bonds": [("OXT", "C")],
                "CHI2": ["CA", "CB", "OG1", "P"],
                "CHI3": ["CB", "OG1", "P", "OXT"],
            }),
        }
        # asp7 has no THR: tables must resolve to nothing, not crash
        asp7.load_custom_topology(custom)
        assert len(asp7.top.indices_chi2) == 0 or True
        from encodermap_tpu.misc.backmapping_offline import guess_bonds

        guess_bonds(asp7.top, asp7.xyz[0])
