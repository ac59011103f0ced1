# tests/test_streaming.py
"""Out-of-core streaming training: HDF5BatchSource + train_streaming."""

import numpy as np
import pytest

from encodermap_tpu import EncoderMap, Parameters
from encodermap_tpu.train.core import HDF5BatchSource, run_streaming


@pytest.fixture
def h5_cvs(tmp_path):
    import h5py

    rng = np.random.default_rng(0)
    data = rng.standard_normal((1000, 6)).astype(np.float32)
    path = tmp_path / "cvs.h5"
    with h5py.File(path, "w") as f:
        g = f.create_group("CVs")
        g.create_dataset("features", data=data)
    return str(path), data


class TestStreaming:
    def test_hdf5_source_shapes(self, h5_cvs):
        path, data = h5_cvs
        src = HDF5BatchSource(path, ["features"], batch_size=16,
                              steps_per_scan=4)
        superbatch = next(src)
        assert isinstance(superbatch, tuple)
        assert superbatch[0].shape == (4, 16, 6)
        src.close()

    def test_train_streaming_encodermap(self, h5_cvs, tmp_path):
        path, data = h5_cvs
        p = Parameters(
            main_path=str(tmp_path / "run"), periodicity=float("inf"),
            n_neurons=[8, 8, 2], n_steps=12, steps_per_scan=4, batch_size=16,
            seed=0,
        )
        emap = EncoderMap(p, data[:10])  # only a prototype batch on device

        class Source:
            """Streams single-array superbatches for the plain EncoderMap."""

            def __init__(self):
                self.inner = HDF5BatchSource(
                    path, ["features"], batch_size=16, steps_per_scan=4
                )

            def __iter__(self):
                return self

            def __next__(self):
                return next(self.inner)[0]

        history = emap.train_streaming(Source(), n_steps=12)
        assert len(history["loss"]) == 12
        assert np.isfinite(history["loss"]).all()
        assert int(emap.state.step) == 12

    def test_streaming_matches_loss_scale(self, h5_cvs, tmp_path):
        """Streaming training decreases the loss like in-memory training."""
        path, data = h5_cvs
        p = Parameters(
            main_path=str(tmp_path / "runb"), periodicity=float("inf"),
            n_neurons=[8, 8, 2], n_steps=40, steps_per_scan=10,
            batch_size=32, seed=1,
        )
        emap = EncoderMap(p, data[:10])

        class Source:
            def __init__(self):
                self.inner = HDF5BatchSource(
                    path, ["features"], batch_size=32, steps_per_scan=10
                )

            def __iter__(self):
                return self

            def __next__(self):
                return next(self.inner)[0]

        history = emap.train_streaming(Source(), n_steps=40)
        assert history["loss"][-10:].mean() < history["loss"][:10].mean()


class TestEnsembleH5Streaming:
    """The joined halves: TrajEnsemble.save() -> HDF5BatchSource ->
    ADC train_streaming, without the CVs ever fully materializing in RAM
    (reference: lazy HDF5 batch_iterator, ``info_all.py:2870-3078``)."""

    DATA = __import__("pathlib").Path("/root/reference/tests/data")

    @pytest.fixture(scope="class")
    def ensemble_h5(self, tmp_path_factory):
        if not self.DATA.exists():
            pytest.skip("reference test data not mounted")
        import encodermap_tpu as em

        trajs = em.load(
            [self.DATA / "asp7.xtc", self.DATA / "glu7.xtc"],
            [self.DATA / "asp7.pdb", self.DATA / "glu7.pdb"],
        )
        trajs.load_CVs("all", ensemble=True)
        path = tmp_path_factory.mktemp("ens") / "trajs.h5"
        trajs.save(path)
        return str(path), trajs

    def test_source_reads_ensemble_layout(self, ensemble_h5):
        path, trajs = ensemble_h5
        src = HDF5BatchSource(
            path, ["central_angles", "central_dihedrals"], batch_size=16,
            steps_per_scan=3,
        )
        assert src.n_frames == trajs.n_frames
        sb = next(src)
        assert sb[0].shape == (3, 16, trajs.CVs["central_angles"].shape[1])
        proto = src.read_prototype(2)
        # 2 frames from each of the two member trajs
        assert proto[0].shape[0] == 4
        src.close()

    def test_adc_trains_from_disk(self, ensemble_h5, tmp_path):
        """from_ensemble_h5 + train_streaming(path): fully out-of-core; the
        mixed asp7/glu7 topology routes through sparse (NaN-masked) mode."""
        import encodermap_tpu as em
        from encodermap_tpu.train.adc_autoencoder import (
            AngleDihedralCartesianEncoderMap,
        )

        path, trajs = ensemble_h5
        p = em.ADCParameters(
            main_path=str(tmp_path / "stream_adc"), batch_size=32,
            n_steps=8, steps_per_scan=4, use_backbone_angles=True,
            use_sidechains=True, n_neurons=[16, 16, 2], seed=0,
        )
        emap = AngleDihedralCartesianEncoderMap.from_ensemble_h5(path, p)
        # only the prototype lives in RAM
        assert len(emap.train_data[0]) == 8  # 4 frames x 2 trajs
        assert emap.sparse  # glu7 chi3 columns are NaN for asp7
        h = emap.train_streaming(path)
        assert len(h["loss"]) == 8
        assert np.isfinite(h["loss"]).all()
        assert int(emap.state.step) == 8


class TestShardedStreaming:
    def test_config5_streaming_plus_dp(self, h5_cvs, tmp_path):
        """BASELINE config 5 shape: out-of-core streaming combined with
        data-parallel sharding over the virtual mesh."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from encodermap_tpu.parallel.mesh import make_mesh

        path, data = h5_cvs
        mesh = make_mesh(n_devices=8, tp=1)
        p = Parameters(
            main_path=str(tmp_path / "run"), periodicity=float("inf"),
            n_neurons=[8, 8, 2], n_steps=8, steps_per_scan=4, batch_size=32,
            seed=0,
        )
        emap = EncoderMap(p, data[:10])

        class Source:
            def __init__(self):
                self.inner = HDF5BatchSource(
                    path, ["features"], batch_size=32, steps_per_scan=4
                )

            def __iter__(self):
                return self

            def __next__(self):
                return next(self.inner)[0]

        sharding = NamedSharding(mesh, P(None, "dp"))
        with mesh:
            history = run_streaming(emap, Source(), 8, sharding=sharding)
        assert len(history["loss"]) == 8
        assert np.isfinite(history["loss"]).all()


class TestPrefetchSource:
    def test_order_and_completion(self):
        from encodermap_tpu.train.core import PrefetchSource

        items = [np.full((4,), i, np.float32) for i in range(10)]
        out = list(PrefetchSource(iter(items), depth=2))
        assert len(out) == 10
        for i, x in enumerate(out):
            np.testing.assert_array_equal(x, items[i])

    def test_error_propagates(self):
        from encodermap_tpu.train.core import PrefetchSource

        def bad():
            yield np.zeros(2)
            raise ValueError("boom")

        src = PrefetchSource(bad(), depth=2)
        next(src)
        with pytest.raises(ValueError, match="boom"):
            next(src)

    def test_overlap(self):
        """With a slow producer, prefetch hides most of the production time."""
        import time

        from encodermap_tpu.train.core import PrefetchSource

        def slow():
            for _ in range(5):
                time.sleep(0.05)
                yield np.zeros(2)

        src = PrefetchSource(slow(), depth=2)
        time.sleep(0.15)  # let the worker fill the queue
        t0 = time.perf_counter()
        next(src); next(src)
        assert time.perf_counter() - t0 < 0.04  # served from the queue

    def test_early_abandon_unblocks_worker(self):
        """Consumer stopping early must not leave the producer blocked."""
        import time

        from encodermap_tpu.train.core import PrefetchSource

        def infinite():
            i = 0
            while True:
                yield np.full((2,), i, np.float32)
                i += 1

        src = PrefetchSource(infinite(), depth=2)
        next(src)
        src.close()
        assert not src._thread.is_alive()
