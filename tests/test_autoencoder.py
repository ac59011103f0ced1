# tests/test_autoencoder.py
"""End-to-end EncoderMap training on the hypercube toy set.

Mirrors the core of the reference's ``tests/test_autoencoder.py``: losses
decrease, encode/decode round-trips have the right shapes, save -> reload ->
continue-training works, parameters JSON round-trips."""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from encodermap_tpu import EncoderMap, Parameters, create_n_cube
from encodermap_tpu.parameters import ADCParameters


@pytest.fixture(scope="module")
def cube_data():
    data, _ = create_n_cube(3, points_along_edge=50, seed=0)
    return data.astype(np.float32)


class TestParameters:
    def test_defaults(self):
        p = Parameters()
        assert p.n_neurons == [128, 128, 2]
        assert p.batch_size == 256
        assert p.dist_sig_parameters == (4.5, 12, 6, 1, 2, 6)
        assert p.learning_rate == 0.001

    def test_adc_defaults(self):
        p = ADCParameters()
        assert p.auto_cost_scale is None
        assert p.distance_cost_scale is None
        assert p.cartesian_cost_scale == 1
        assert p.model_api == "functional"

    def test_json_roundtrip(self, tmp_path):
        p = Parameters(n_neurons=[16, 16, 2], learning_rate=0.01)
        path = p.save(tmp_path / "parameters.json")
        p2 = Parameters.from_file(path)
        assert p2.n_neurons == [16, 16, 2]
        assert p2.learning_rate == 0.01

    def test_inf_periodicity_roundtrip(self, tmp_path):
        p = Parameters(periodicity=float("inf"))
        path = p.save(tmp_path / "parameters.json")
        p2 = Parameters.from_file(path)
        assert p2.periodicity == float("inf")

    def test_unknown_keys_dropped(self):
        p = Parameters.from_dict({
            "n_neurons": [4, 2],
            "activation_functions": ["", "tanh", ""],
            "bogus_key": 1,
        })
        assert p.n_neurons == [4, 2]
        assert not hasattr(p, "bogus_key")

    def test_main_path_relocation_repair(self, tmp_path):
        p = Parameters(main_path=str(tmp_path / "origin"))
        (tmp_path / "moved").mkdir()
        path = tmp_path / "moved" / "parameters.json"
        p.save(path)
        p2 = Parameters.from_file(path)
        assert p2.main_path == str((tmp_path / "moved").resolve())


def _small_params(tmp_path, **kw):
    defaults = dict(
        main_path=str(tmp_path),
        n_neurons=[16, 16, 2],
        n_steps=30,
        batch_size=64,
        periodicity=float("inf"),
        steps_per_scan=10,
        summary_step=10,
        checkpoint_step=1000,
        seed=1,
    )
    defaults.update(kw)
    return Parameters(**defaults)


class TestEncoderMapEndToEnd:
    def test_training_decreases_loss(self, cube_data, tmp_path):
        p = _small_params(tmp_path)
        emap = EncoderMap(p, cube_data)
        history = emap.train()
        assert "loss" in history and len(history["loss"]) == 30
        first, last = history["loss"][:5].mean(), history["loss"][-5:].mean()
        assert np.isfinite(history["loss"]).all()
        assert last < first, f"loss did not decrease: {first} -> {last}"

    def test_all_loss_components_logged(self, cube_data, tmp_path):
        p = _small_params(tmp_path)
        emap = EncoderMap(p, cube_data)
        history = emap.train()
        for name in ("auto_loss", "center_loss", "regularization_loss",
                     "distance_loss", "loss"):
            assert name in history

    def test_encode_decode_shapes(self, cube_data, tmp_path):
        p = _small_params(tmp_path, n_steps=5, steps_per_scan=5)
        emap = EncoderMap(p, cube_data)
        emap.train()
        latent = emap.encode(cube_data[:100])
        assert latent.shape == (100, 2)
        back = emap.decode(latent)
        assert back.shape == (100, 3)
        gen = emap.generate(np.zeros((7, 2), np.float32))
        assert gen.shape == (7, 3)

    def test_encode_decode_no_retrace(self, cube_data, tmp_path):
        """Repeated encode/decode calls — and calls after a parameter
        update — must reuse one compiled function instead of constructing a
        fresh jax.jit per call (a full retrace, and on the remote-compile
        TPU platform a minutes-long RPC)."""
        from encodermap_tpu.models import sequential as seq

        p = _small_params(tmp_path, n_steps=2, steps_per_scan=2)
        emap = EncoderMap(p, cube_data, read_only=True)

        traces = {"encode": 0, "decode": 0}
        orig_enc, orig_dec = seq.encode, seq.decode

        def counting_enc(*a, **k):
            traces["encode"] += 1
            return orig_enc(*a, **k)

        def counting_dec(*a, **k):
            traces["decode"] += 1
            return orig_dec(*a, **k)

        seq.encode, seq.decode = counting_enc, counting_dec
        try:
            z1 = emap.encode(cube_data[:32])
            emap.encode(cube_data[:32])
            emap.decode(z1)
            emap.decode(z1)
            assert traces == {"encode": 1, "decode": 1}

            # params are call args, not baked-in constants: an update must
            # change the output without triggering a retrace
            emap.state = emap.state.replace(
                params=jax.tree_util.tree_map(
                    lambda x: x + 0.05, emap.state.params
                )
            )
            z2 = emap.encode(cube_data[:32])
            assert traces["encode"] == 1
            assert not np.allclose(z1, z2)
        finally:
            seq.encode, seq.decode = orig_enc, orig_dec

    def test_adc_encode_decode_no_retrace(self, rng, tmp_path):
        """Same guarantee for the ADC class (encode/decode/generate)."""
        from encodermap_tpu.models import adc
        from encodermap_tpu.train.adc_autoencoder import (
            AngleDihedralCartesianEncoderMap,
        )
        from tests.reference_impl import backmap_np

        n_atoms, F = 12, 48
        angles = rng.uniform(1.6, 2.4, (F, n_atoms - 2)).astype(np.float32)
        dihedrals = rng.uniform(-np.pi, np.pi, (F, n_atoms - 3)).astype(
            np.float32)
        distances = rng.uniform(0.13, 0.155, (F, n_atoms - 1)).astype(
            np.float32)
        cart = backmap_np(distances, angles, dihedrals).astype(np.float32)
        cvs = dict(central_angles=angles, central_dihedrals=dihedrals,
                   central_cartesians=cart, central_distances=distances)
        p = ADCParameters(batch_size=16, use_backbone_angles=True,
                          use_sidechains=False, n_neurons=[8, 8, 2], seed=0)
        emap = AngleDihedralCartesianEncoderMap(cvs, p, read_only=True)

        traces = {"encode": 0, "decode": 0}
        orig_enc, orig_dec = adc.encode, adc.decode

        def counting_enc(*a, **k):
            traces["encode"] += 1
            return orig_enc(*a, **k)

        def counting_dec(*a, **k):
            traces["decode"] += 1
            return orig_dec(*a, **k)

        adc.encode, adc.decode = counting_enc, counting_dec
        try:
            z = emap.encode()
            emap.encode()
            assert traces["encode"] == 1
            emap.decode(z[:8])
            emap.decode(z[:8])
            assert traces["decode"] == 1
            emap.generate(z[:4])
            emap.generate(z[:4])
            # decode+backmap fused into one cached jit, traced exactly once
            assert "generate_fused" in emap._jit_cache
            assert traces["decode"] == 2
        finally:
            adc.encode, adc.decode = orig_enc, orig_dec

    def test_single_sample_encode(self, cube_data, tmp_path):
        p = _small_params(tmp_path, n_steps=2, steps_per_scan=2)
        emap = EncoderMap(p, cube_data)
        latent = emap.encode(cube_data[0])
        assert latent.shape == (2,)

    def test_periodic_model(self, rng, tmp_path):
        """Dihedral-like periodic data trains with sin/cos fold-in."""
        data = rng.uniform(-np.pi, np.pi, (500, 8)).astype(np.float32)
        p = _small_params(tmp_path, periodicity=2 * np.pi, n_steps=20,
                          steps_per_scan=10)
        emap = EncoderMap(p, data)
        history = emap.train()
        assert np.isfinite(history["loss"]).all()
        out = emap.decode(emap.encode(data[:10]))
        assert out.shape == (10, 8)
        assert np.all(out >= -np.pi - 1e-5) and np.all(out <= np.pi + 1e-5)

    def test_hypercube_fallback(self, tmp_path):
        p = _small_params(tmp_path, n_steps=2, steps_per_scan=2)
        emap = EncoderMap(p, train_data=None)
        assert emap.p.using_hypercube
        assert emap.train_data.shape[1] == 3

    def test_deterministic_with_seed(self, cube_data, tmp_path):
        p1 = _small_params(tmp_path / "a", n_steps=10, steps_per_scan=10, seed=7)
        p2 = _small_params(tmp_path / "b", n_steps=10, steps_per_scan=10, seed=7)
        h1 = EncoderMap(p1, cube_data).train()
        h2 = EncoderMap(p2, cube_data).train()
        np.testing.assert_allclose(h1["loss"], h2["loss"], rtol=1e-6)


class TestSaveLoad:
    def test_checkpoint_roundtrip(self, cube_data, tmp_path):
        p = _small_params(tmp_path, n_steps=10, steps_per_scan=10)
        emap = EncoderMap(p, cube_data)
        emap.train()
        latent_before = emap.encode(cube_data[:50])

        emap2 = EncoderMap.from_checkpoint(tmp_path, train_data=cube_data)
        latent_after = emap2.encode(cube_data[:50])
        np.testing.assert_allclose(latent_before, latent_after, atol=1e-6)
        assert int(emap2.state.step) == 10

    def test_resume_training(self, cube_data, tmp_path):
        p = _small_params(tmp_path, n_steps=10, steps_per_scan=10)
        emap = EncoderMap(p, cube_data)
        emap.train()

        emap2 = EncoderMap.from_checkpoint(tmp_path, train_data=cube_data)
        emap2.p.n_steps = 20
        history = emap2.train()
        assert len(history["loss"]) == 10  # only the remaining steps
        assert int(emap2.state.step) == 20

    def test_already_trained_message(self, cube_data, tmp_path, capsys):
        p = _small_params(tmp_path, n_steps=5, steps_per_scan=5)
        emap = EncoderMap(p, cube_data)
        emap.train()
        emap.train()
        assert "already been trained" in capsys.readouterr().out


class TestReloadErrors:
    def test_reload_without_data_raises_descriptive_error(
        self, cube_data, tmp_path
    ):
        """Reloading a model trained on user data without passing that data
        must raise a descriptive error instead of silently substituting
        hypercube data of the wrong dimension (reference
        ``test_autoencoder.py:3230``)."""
        p = _small_params(tmp_path, n_steps=2, steps_per_scan=2)
        emap = EncoderMap(p, cube_data)
        emap.train()
        with pytest.raises(ValueError, match="train_data"):
            EncoderMap.from_checkpoint(tmp_path)
        # hypercube-trained models still reload without data
        p2 = Parameters(
            main_path=str(tmp_path / "hyper"), periodicity=float("inf"),
            n_neurons=[16, 16, 2], n_steps=2, steps_per_scan=2,
            batch_size=32, seed=0,
        )
        emap2 = EncoderMap(p2)  # no data -> hypercube
        emap2.train()
        reloaded = EncoderMap.from_checkpoint(tmp_path / "hyper")
        assert reloaded.input_dim == emap2.input_dim


class TestCallbacks:
    def test_early_stop(self, cube_data, tmp_path):
        from encodermap_tpu.train.callbacks import EarlyStop

        p = _small_params(tmp_path, n_steps=100, steps_per_scan=10)
        emap = EncoderMap(p, cube_data)
        emap.callbacks.append(EarlyStop(patience=0, min_delta=1e9))
        history = emap.train()
        # impossible min_delta -> stops after the first chunk
        assert len(history["loss"]) <= 20

    def test_image_callback_writes_png(self, cube_data, tmp_path):
        from encodermap_tpu.train.callbacks import ImageCallback

        p = _small_params(tmp_path, n_steps=10, steps_per_scan=5)
        emap = EncoderMap(p, cube_data)
        emap.callbacks.append(ImageCallback(emap, image_step=5,
                                            data=cube_data[:100]))
        emap.train()
        pngs = list(Path(tmp_path).glob("latent_*.png"))
        assert pngs, "ImageCallback produced no latent images"

    def test_image_callback_primary_only(self, cube_data, tmp_path,
                                         monkeypatch):
        """Non-primary pod processes must not render/write images (same
        gate as CheckpointSaver — otherwise N processes race on the same
        latent_{step}.png in a shared main_path, wave 28)."""
        from encodermap_tpu.train import callbacks as cb

        monkeypatch.setattr(
            "encodermap_tpu.parallel.distributed.is_primary", lambda: False
        )
        p = _small_params(tmp_path, n_steps=10, steps_per_scan=5)
        emap = EncoderMap(p, cube_data)
        emap.callbacks.append(cb.ImageCallback(emap, image_step=5,
                                               data=cube_data[:100]))
        emap.train()
        assert not list(Path(tmp_path).glob("latent_*.png"))

    def test_early_stop_restores_best_weights(self, cube_data, tmp_path):
        import jax

        from encodermap_tpu.train.callbacks import EarlyStop

        p = _small_params(tmp_path, n_steps=100, steps_per_scan=10)
        emap = EncoderMap(p, cube_data)
        cb = EarlyStop(patience=0, min_delta=1e9, restore_best_weights=True)
        emap.callbacks.append(cb)
        emap.train()
        # min_delta is impossible after the first chunk, so the restored
        # params must equal the snapshot from that chunk
        assert cb._best_params is not None
        for a, b in zip(
            jax.tree_util.tree_leaves(cb._best_params),
            jax.tree_util.tree_leaves(emap.state.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestTrainerExtensions:
    """add_loss / add_metric / add_callback / plot_network / set_train_data
    (reference autoencoder.py:788, 1031-1109)."""

    def test_custom_loss_and_metric(self, cube_data, tmp_path):
        import jax.numpy as jnp

        p = _small_params(tmp_path, n_steps=10, steps_per_scan=5)
        emap = EncoderMap(p, cube_data)
        emap.add_loss(lambda params, batch: 0.01 * jnp.mean(batch**2),
                      name="my_loss")
        emap.add_metric(lambda params, batch: jnp.max(jnp.abs(batch)),
                        name="batch_max")
        h = emap.train()
        assert "my_loss" in h and "batch_max" in h
        assert np.isfinite(h["my_loss"]).all()

    def test_plot_network(self, cube_data, tmp_path):
        p = _small_params(tmp_path, n_steps=2, steps_per_scan=2)
        emap = EncoderMap(p, cube_data)
        out = emap.plot_network()
        assert Path(out).exists()

    def test_encoder_decoder_submodels(self, cube_data, tmp_path):
        """emap.encoder / emap.decoder behave like the reference's keras
        submodels (autoencoder.py:936-943): callable and with .predict."""
        p = _small_params(tmp_path, n_steps=2, steps_per_scan=2)
        emap = EncoderMap(p, cube_data)
        z = emap.encoder(cube_data[:7])
        np.testing.assert_array_equal(z, emap.encode(cube_data[:7]))
        np.testing.assert_array_equal(
            emap.encoder.predict(cube_data[:7]), z
        )
        back = emap.decoder(z)
        np.testing.assert_array_equal(back, emap.decode(z))

    def test_set_train_data(self, cube_data, tmp_path):
        p = _small_params(tmp_path, n_steps=2, steps_per_scan=2)
        emap = EncoderMap(p, cube_data)
        emap.set_train_data(cube_data[:100])
        assert emap.train_data.shape[0] == 100
        with pytest.raises(AssertionError):
            emap.set_train_data(np.zeros((10, 99), np.float32))


class TestComputeDtype:
    def test_bfloat16_training(self, cube_data, tmp_path):
        """compute_dtype='bfloat16' runs matmuls in bf16 and still trains."""
        p = _small_params(tmp_path, n_steps=20, steps_per_scan=10,
                          compute_dtype="bfloat16")
        emap = EncoderMap(p, cube_data)
        h = emap.train()
        assert np.isfinite(h["loss"]).all()
        assert h["loss"][-1] < h["loss"][0]
        latent = emap.encode(cube_data[:10])
        assert latent.dtype == np.float32  # outputs stay f32


class TestLearningRateSchedule:
    """TPU-native analog of the reference's keras LearningRateScheduler
    tutorial (``tutorials/notebooks_customization/04``): any optax
    schedule replaces the constant lr and the per-step lr is logged."""

    def test_schedule_trains_and_logs(self, tmp_path):
        import optax

        import encodermap_tpu as em

        data, _ = em.create_n_cube(3, points_along_edge=30, seed=0)
        p = em.Parameters(main_path=str(tmp_path / "s"), n_steps=40,
                          steps_per_scan=20, batch_size=64,
                          periodicity=float("inf"), seed=1)
        schedule = optax.exponential_decay(
            init_value=p.learning_rate, transition_steps=10, decay_rate=0.5
        )
        emap = em.EncoderMap(p, data, learning_rate_schedule=schedule)
        h = emap.train()
        assert "learning_rate" in h
        lrs = np.asarray(h["learning_rate"])
        assert lrs[0] > lrs[-1]
        np.testing.assert_allclose(lrs[0], schedule(0), rtol=1e-5)
        assert h["loss"][-1] < h["loss"][0]

    def test_schedule_changes_trajectory_vs_constant(self, tmp_path):
        import encodermap_tpu as em

        data, _ = em.create_n_cube(3, points_along_edge=30, seed=0)

        def make(path, sched):
            p = em.Parameters(main_path=str(tmp_path / path), n_steps=20,
                              steps_per_scan=20, batch_size=64,
                              periodicity=float("inf"), seed=1)
            return em.EncoderMap(p, data, learning_rate_schedule=sched)

        h_const = make("c", None).train()
        h_sched = make("d", lambda step: 0.0001 * 0.5 ** (step / 5)).train()
        assert not np.allclose(h_const["loss"][-5:], h_sched["loss"][-5:])

    def test_custom_python_callable_schedule(self, tmp_path):
        """The notebook's hand-written scheduler shape: plain Python
        callable with jnp control flow."""
        import jax.numpy as jnp

        import encodermap_tpu as em

        def scheduler(step):
            return jnp.where(step < 10, 1e-4, 1e-4 * jnp.exp(-0.1))

        data, _ = em.create_n_cube(3, points_along_edge=30, seed=0)
        p = em.Parameters(main_path=str(tmp_path / "n"), n_steps=20,
                          steps_per_scan=10, batch_size=64,
                          periodicity=float("inf"), seed=1)
        emap = em.EncoderMap(p, data, learning_rate_schedule=scheduler)
        h = emap.train()
        lrs = np.asarray(h["learning_rate"])
        np.testing.assert_allclose(lrs[:10], 1e-4, rtol=1e-6)
        np.testing.assert_allclose(lrs[10:], 1e-4 * np.exp(-0.1), rtol=1e-5)

    def test_schedule_survives_checkpoint_roundtrip(self, tmp_path):
        """Documented contract: the schedule is not serialized — passing it
        again to from_checkpoint must restore the optimizer state (incl.
        the schedule's step count) and continue the decay, not restart it."""
        import optax

        import encodermap_tpu as em

        data, _ = em.create_n_cube(3, points_along_edge=30, seed=0)
        sched = optax.exponential_decay(
            init_value=1e-4, transition_steps=5, decay_rate=0.5
        )

        def params(path, n_steps):
            return em.Parameters(main_path=str(tmp_path / path),
                                 n_steps=n_steps, steps_per_scan=10,
                                 batch_size=64, periodicity=float("inf"),
                                 seed=1)

        # uninterrupted 20-step run
        full = em.EncoderMap(params("full", 20), data,
                             learning_rate_schedule=sched)
        h_full = full.train()

        # 10 steps, save, reload WITH the schedule, 10 more
        first = em.EncoderMap(params("half", 10), data,
                              learning_rate_schedule=sched)
        h1 = first.train()
        ckpt = first.save()
        second = em.EncoderMap.from_checkpoint(
            ckpt, train_data=data, learning_rate_schedule=sched
        )
        second.p.n_steps = 20
        second.p.main_path = str(tmp_path / "half2")
        h2 = second.train()

        lrs = np.concatenate([h1["learning_rate"], h2["learning_rate"]])
        np.testing.assert_allclose(lrs, h_full["learning_rate"], rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(h2["loss"]), np.asarray(h_full["loss"])[10:],
            rtol=1e-4, atol=1e-6,
        )


class TestAdditionalImageFns:
    """The reference's ImageCallback additional_fns hook (customization
    tutorial 03): user callables over the latent projection, written as
    PNGs at each image step."""

    def test_custom_images_written(self, tmp_path):
        import matplotlib

        matplotlib.use("Agg")
        import encodermap_tpu as em

        calls = []

        def free_energy_png(lowd):
            calls.append(lowd.shape)
            H, xe, ye = np.histogram2d(*lowd.T, bins=10)
            return H  # array route

        def figure_route(lowd):
            from matplotlib.figure import Figure

            fig = Figure()
            fig.subplots().scatter(lowd[:, 0], lowd[:, 1], s=1)
            return fig

        data, _ = em.create_n_cube(3, points_along_edge=20, seed=0)
        p = em.Parameters(main_path=str(tmp_path / "img"), n_steps=20,
                          steps_per_scan=10, batch_size=32,
                          periodicity=float("inf"), seed=1,
                          summary_step=10)
        emap = em.EncoderMap(p, data)
        emap.add_images_to_tensorboard(
            image_step=10, additional_fns=[free_energy_png, figure_route]
        )
        emap.train()
        written = sorted(f.name for f in (tmp_path / "img").glob("*.png"))
        assert any(n.startswith("free_energy_png_") for n in written)
        assert any(n.startswith("figure_route_") for n in written)
        assert calls and calls[0][1] == 2

    def test_broken_fn_does_not_kill_training(self, tmp_path):
        import encodermap_tpu as em

        def broken(lowd):
            raise RuntimeError("boom")

        data, _ = em.create_n_cube(3, points_along_edge=20, seed=0)
        p = em.Parameters(main_path=str(tmp_path / "img2"), n_steps=20,
                          steps_per_scan=10, batch_size=32,
                          periodicity=float("inf"), seed=1)
        emap = em.EncoderMap(p, data)
        emap.add_images_to_tensorboard(image_step=10,
                                       additional_fns=[broken])
        h = emap.train()
        assert len(h["loss"]) == 20


class TestConsumedConfigKnobs:
    """The reference's training/batched/model_api/write_summary knobs act
    here too (VERDICT r4 directive 6 — no silently-dead config)."""

    def _data(self):
        data, _ = create_n_cube(3, points_along_edge=4, seed=0)
        return np.asarray(data, np.float32)

    def test_unknown_training_mode_raises(self, tmp_path):
        p = Parameters(main_path=str(tmp_path), training="bogus", n_steps=2)
        emap = EncoderMap(p, self._data())
        with pytest.raises(ValueError, match="'custom', 'auto'"):
            emap.train()

    def test_unbatched_trains_on_full_dataset(self, tmp_path):
        """batched=False: every step consumes the entire dataset
        (reference autoencoder.py:1001-1004). Deterministic: two runs with
        different seeds produce identical losses, since no random batch
        sampling happens."""
        data = self._data()
        hists = []
        for seed in (1, 2):
            p = Parameters(
                main_path=str(tmp_path / f"s{seed}"), training="custom",
                batched=False, n_steps=6, steps_per_scan=3, batch_size=4,
                periodicity=float("inf"), seed=3,  # same model init
            )
            emap = EncoderMap(p, data)
            # different sampling rng; full-batch must ignore it
            emap.state = emap.state.replace(
                rng=jax.random.PRNGKey(seed)
            )
            hists.append(emap.train()["loss"])
        np.testing.assert_array_equal(hists[0], hists[1])

    def test_batched_runs_differ_across_sampling_rng(self, tmp_path):
        """Control for the test above: WITH batching, different sampling
        keys give different loss curves."""
        data = self._data()
        hists = []
        for seed in (1, 2):
            p = Parameters(
                main_path=str(tmp_path / f"b{seed}"), n_steps=6,
                steps_per_scan=3, batch_size=4, periodicity=float("inf"),
                seed=3, fused_trainer=False,
            )
            emap = EncoderMap(p, data)
            emap.state = emap.state.replace(rng=jax.random.PRNGKey(seed))
            hists.append(emap.train()["loss"])
        assert not np.array_equal(hists[0], hists[1])

    def test_model_api_guard(self, tmp_path):
        data = self._data()
        with pytest.raises(NotImplementedError, match="custom"):
            EncoderMap(
                Parameters(main_path=str(tmp_path), model_api="custom"),
                data,
            )
        with pytest.raises(ValueError, match="functional"):
            EncoderMap(
                Parameters(main_path=str(tmp_path), model_api="functional"),
                data,
            )
        with pytest.raises(ValueError, match="model_api"):
            EncoderMap(
                Parameters(main_path=str(tmp_path), model_api="nonesuch"),
                data,
            )

    def test_write_summary_creates_model_summary_file(self, tmp_path):
        p = Parameters(
            main_path=str(tmp_path), write_summary=True, n_steps=2,
        )
        EncoderMap(p, self._data())
        out = Path(tmp_path) / "complete_model_summary.txt"
        assert out.exists()
        text = out.read_text()
        assert "Total params:" in text and "encoder" in text

    def test_no_summary_by_default(self, tmp_path):
        p = Parameters(main_path=str(tmp_path), n_steps=2)
        EncoderMap(p, self._data())
        assert not (Path(tmp_path) / "complete_model_summary.txt").exists()
