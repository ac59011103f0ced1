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
