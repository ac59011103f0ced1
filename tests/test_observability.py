# tests/test_observability.py
"""Observability: metrics JSONL, TensorBoard events, profiler traces,
load_project local resolution."""

import json
from pathlib import Path

import numpy as np
import pytest

from encodermap_tpu import EncoderMap, Parameters


def _params(tmp_path, **kw):
    d = dict(
        main_path=str(tmp_path), periodicity=float("inf"),
        n_neurons=[8, 8, 2], n_steps=10, steps_per_scan=5, batch_size=16,
        summary_step=1, seed=0,
    )
    d.update(kw)
    return Parameters(**d)


class TestMetricsWriter:
    def test_jsonl_rows(self, rng, tmp_path):
        data = rng.standard_normal((100, 4)).astype(np.float32)
        emap = EncoderMap(_params(tmp_path), data)
        emap.train()
        rows = [
            json.loads(l)
            for l in (tmp_path / "train_metrics.jsonl").read_text().splitlines()
        ]
        assert len(rows) == 10
        assert {"step", "loss", "auto_loss"} <= set(rows[0])
        assert rows[-1]["step"] == 10

    def test_tensorboard_events(self, rng, tmp_path):
        pytest.importorskip("tensorflow")
        data = rng.standard_normal((100, 4)).astype(np.float32)
        emap = EncoderMap(_params(tmp_path, tensorboard=True), data)
        emap.train()
        events = list(Path(tmp_path, "train").glob("events.out.tfevents.*"))
        assert events, "no TensorBoard event files written"

    def test_add_images_to_tensorboard(self, rng, tmp_path):
        data = rng.standard_normal((100, 4)).astype(np.float32)
        emap = EncoderMap(_params(tmp_path, summary_step=5), data)
        emap.add_images_to_tensorboard(data=data[:50])
        emap.train()
        assert list(Path(tmp_path).glob("latent_*.png"))


class TestProfiler:
    def test_profile_steps_writes_trace(self, rng, tmp_path):
        from encodermap_tpu.misc.profiling import profile_steps

        data = rng.standard_normal((100, 4)).astype(np.float32)
        emap = EncoderMap(_params(tmp_path), data, read_only=True)
        logdir = profile_steps(emap, n_steps=1, logdir=tmp_path / "profile")
        traces = list(Path(logdir).rglob("*.trace.json.gz")) + list(
            Path(logdir).rglob("*.xplane.pb")
        )
        assert traces, f"no profiler artifacts under {logdir}"


class TestLoadProject:
    def test_local_project(self, tmp_path, monkeypatch, rng):
        """load_project rebuilds trajs (+ optionally a checkpointed AE) from
        a local dataset directory."""
        import encodermap_tpu as em
        from encodermap_tpu.data import SingleTraj

        DATA = Path("/root/reference/tests/data")
        if not DATA.exists():
            pytest.skip("reference data not mounted")
        project = tmp_path / "mirror" / "my_proj"
        project.mkdir(parents=True)
        traj = SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb")[0:10]
        traj.save(project / "trajs.h5")
        monkeypatch.setenv("ENCODERMAP_DATA_DIR", str(tmp_path / "mirror"))

        trajs = em.load_project("my_proj", load_autoencoder=False)
        assert trajs.n_trajs == 1
        assert trajs.trajs[0].n_frames == 10


class TestReviewWave12:
    """Regression tests for the plot/parallel/kondata review findings."""

    def test_dashboard_data_lands_in_highd_slot(self, tmp_path):
        import numpy as np

        import encodermap_tpu as em
        from encodermap_tpu.plot.dashboard import DashboardSession

        data, _ = em.create_n_cube(3, points_along_edge=20, seed=1)
        p = em.Parameters(main_path=str(tmp_path / "r"), n_steps=10,
                          steps_per_scan=5, batch_size=32,
                          periodicity=float("inf"), seed=1)
        emap = em.EncoderMap(p, data)
        emap.train()
        sess = DashboardSession(emap, data=data)
        # latent must be the 2-D ENCODING of data, not data itself
        assert sess.interactive.latent.shape == (len(data), 2)
        assert not np.allclose(sess.interactive.latent, data[:, :2])

    def test_load_project_multigroup_ensemble_h5(self, tmp_path,
                                                 monkeypatch):
        import encodermap_tpu as em
        from encodermap_tpu.data import SingleTraj, TrajEnsemble

        D = "/root/reference/tests/data/"
        t1 = SingleTraj(D + "asp7.xtc", D + "asp7.pdb", traj_num=0)
        t2 = SingleTraj(D + "glu7.xtc", D + "glu7.pdb", traj_num=1)
        trajs = TrajEnsemble([t1, t2])
        trajs.load_CVs("all", ensemble=True)
        proj = tmp_path / "proj"
        proj.mkdir()
        trajs.save(proj / "trajs.h5")
        monkeypatch.setenv("ENCODERMAP_DATA_DIR", str(tmp_path))
        (tmp_path / "proj").rename(tmp_path / "my_ens_proj")
        out = em.load_project("my_ens_proj", load_autoencoder=False)
        assert out.n_trajs == 2
        assert out.n_frames == t1.n_frames + t2.n_frames

    def test_sharded_to_hdf5_preserves_attrs_and_indices(self, tmp_path):
        import h5py
        import numpy as np

        from encodermap_tpu.data import SingleTraj
        from encodermap_tpu.parallel.sharded_featurize import (
            ShardedFeaturizer,
        )

        D = "/root/reference/tests/data/"
        traj = SingleTraj(D + "asp7.xtc", D + "asp7.pdb")
        sharded = ShardedFeaturizer(traj, block_size=64)
        sharded._inner.add_backbone_torsions(deg=True)
        sharded.to_hdf5(tmp_path / "cvs.h5")
        with h5py.File(tmp_path / "cvs.h5") as f:
            d = f["CVs/BackboneTorsionFeature"]
            assert d.attrs["attr_angle_units"] == "deg"
            assert "BackboneTorsionFeature__indices" in f["CVs"]
            idx = np.asarray(f["CVs/BackboneTorsionFeature__indices"])
            assert idx.shape[1] == 4

    def test_interactive_single_traj_cluster(self, tmp_path):
        import numpy as np

        from encodermap_tpu.data import SingleTraj
        from encodermap_tpu.plot.interactive import InteractivePlotting

        D = "/root/reference/tests/data/"
        traj = SingleTraj(D + "asp7.xtc", D + "asp7.pdb")
        rng = np.random.default_rng(0)
        lowd = rng.normal(size=(traj.n_frames, 2))
        highd = rng.normal(size=(traj.n_frames, 6))
        sess = InteractivePlotting(trajs=traj, lowd_data=lowd,
                                   highd_data=highd, main_path=tmp_path)
        sess.select_rectangle(-10, -10, 10, 10)
        out = sess.cluster("c0")  # must not AttributeError on .trajs
        assert out

    def test_path_without_autoencoder_raises_informatively(self):
        import numpy as np

        from encodermap_tpu.plot.interactive import InteractivePlotting

        lowd = np.zeros((10, 2), np.float32)
        highd = np.zeros((10, 5), np.float32)
        sess = InteractivePlotting(lowd_data=lowd, highd_data=highd)
        with pytest.raises(RuntimeError, match="autoencoder"):
            sess.path([(0.0, 0.0), (1.0, 1.0)])

    def test_kondata_named_dataset_resolves_via_mapping(self):
        from encodermap_tpu.kondata import _download_urls

        urls = _download_urls("H1Ub")
        assert urls[0].endswith("10.48606-99/download")
        assert any("sawade.io" in u for u in urls)
        # unmapped names skip the RADAR endpoint entirely
        urls = _download_urls("unknown_thing")
        assert all("kondata" not in u for u in urls)
