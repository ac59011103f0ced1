# tests/test_keras_import.py
"""Reference-format ``.keras`` checkpoint import (VERDICT r4 #3).

Round-trip contract: a TF twin built exactly like the reference's models
(Encoder/Decoder submodels holding ``Encoder_{i}`` / ``Decoder_{i}`` Dense
stacks, ``models/models.py:1720,1870``) is saved as ``saved_model_*.keras``
(``misc/saving_loading_models.py:201-268``); importing it must reproduce
encode/decode at 1e-5, and a reference-layout project directory must load
into a working autoencoder through ``from_checkpoint``/``load_project``.
"""

import json
from pathlib import Path

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from encodermap_tpu.misc.keras_import import (  # noqa: E402
    import_keras_checkpoint,
    keras_weights_to_pytree,
    latest_keras_checkpoint,
    read_keras_dense_weights,
)

N_NEURONS = [16, 16, 2]
ACTS = ["", "tanh", "tanh", ""]


def _tf_twin(in_dim: int, seed: int = 0) -> tf.keras.Model:
    """A model shaped like the reference's sequential EncoderMap twin:
    Encoder/Decoder functional submodels with Encoder_i/Decoder_i Dense
    layers."""
    ki = tf.keras.initializers.GlorotUniform(seed=seed)
    e_in = tf.keras.Input((in_dim,))
    x = e_in
    for i, (n, act) in enumerate(zip(N_NEURONS, ACTS[1:])):
        x = tf.keras.layers.Dense(
            n, activation=act or None, name=f"Encoder_{i}",
            kernel_initializer=ki,
        )(x)
    enc = tf.keras.Model(e_in, x, name="Encoder")
    d_in = tf.keras.Input((N_NEURONS[-1],))
    y = d_in
    dec_dims = N_NEURONS[-2::-1] + [in_dim]
    for i, (n, act) in enumerate(zip(dec_dims, ACTS[-2::-1])):
        y = tf.keras.layers.Dense(
            n, activation=act or None, name=f"Decoder_{i}",
            kernel_initializer=ki,
        )(y)
    dec = tf.keras.Model(d_in, y, name="Decoder")
    inp = tf.keras.Input((in_dim,))
    model = tf.keras.Model(inp, dec(enc(inp)))
    model.encoder_model = enc
    model.decoder_model = dec
    return model


class TestKerasWeightReading:
    def test_reads_named_dense_stacks(self, tmp_path):
        m = _tf_twin(10)
        f = tmp_path / "saved_model_100.keras"
        m.save(f)
        denses = read_keras_dense_weights(f)
        names = [d["name"] for d in denses]
        assert names == [
            "Encoder/Encoder_0", "Encoder/Encoder_1", "Encoder/Encoder_2",
            "Decoder/Decoder_0", "Decoder/Decoder_1", "Decoder/Decoder_2",
        ]
        assert denses[0]["kernel"].shape == (10, 16)
        assert denses[-1]["kernel"].shape == (16, 10)

    def test_pytree_mapping_matches_tf_weights(self, tmp_path):
        m = _tf_twin(8, seed=3)
        f = tmp_path / "saved_model_7.keras"
        m.save(f)
        params, step = import_keras_checkpoint(f)
        assert step == 7
        enc_layers = [l for l in m.encoder_model.layers
                      if isinstance(l, tf.keras.layers.Dense)]
        for ours, theirs in zip(params["encoder"], enc_layers):
            np.testing.assert_array_equal(
                ours["kernel"], theirs.kernel.numpy()
            )
            np.testing.assert_array_equal(ours["bias"], theirs.bias.numpy())

    def test_shape_chain_validation(self):
        bad = [
            {"name": "Encoder_0", "class": "Dense",
             "kernel": np.zeros((4, 8)), "bias": np.zeros(8)},
            {"name": "Decoder_0", "class": "Dense",
             "kernel": np.zeros((9, 4)), "bias": np.zeros(4)},
        ]
        with pytest.raises(ValueError, match="chain"):
            keras_weights_to_pytree(bad)

    def test_latest_checkpoint_selection(self, tmp_path):
        m = _tf_twin(6)
        m.save(tmp_path / "saved_model_10.keras")
        m.save(tmp_path / "saved_model_200.keras")
        m.encoder_model.save(tmp_path / "saved_model_300_encoder.keras")
        path, step = latest_keras_checkpoint(tmp_path)
        assert step == 200 and path.endswith("saved_model_200.keras")

    def test_time_named_checkpoint_step_unknown(self, tmp_path):
        m = _tf_twin(6)
        m.save(tmp_path / "saved_model_2024-01-01T00-00-00.keras")
        path, step = latest_keras_checkpoint(tmp_path)
        assert step == -1


class TestEncoderMapRoundTrip:
    def test_from_checkpoint_reproduces_tf_encode_decode(self, tmp_path):
        """The VERDICT done-condition: TF twin with known weights ->
        save .keras -> import -> encode/decode parity at 1e-5."""
        import encodermap_tpu as em

        rng = np.random.default_rng(0)
        in_dim = 12
        data = rng.normal(size=(64, in_dim)).astype(np.float32)

        m = _tf_twin(in_dim, seed=11)
        run = tmp_path / "run0"
        run.mkdir()
        m.save(run / "saved_model_100.keras")
        p = em.Parameters(
            main_path=str(run), n_neurons=N_NEURONS,
            activation_functions=ACTS, periodicity=float("inf"),
            n_steps=100, current_training_step=100,
        )
        p.save(run / "parameters.json")

        emap = em.EncoderMap.from_checkpoint(run, train_data=data)
        assert int(emap.state.step) == 100

        ours_lat = emap.encode(data)
        tf_lat = m.encoder_model(tf.convert_to_tensor(data)).numpy()
        np.testing.assert_allclose(ours_lat, tf_lat, atol=1e-5)

        ours_out = emap.decode(tf_lat)
        tf_out = m.decoder_model(tf.convert_to_tensor(tf_lat)).numpy()
        np.testing.assert_allclose(ours_out, tf_out, atol=1e-5)

    def test_explicit_keras_file_path(self, tmp_path):
        import encodermap_tpu as em

        in_dim = 9
        data = np.random.default_rng(1).normal(
            size=(16, in_dim)).astype(np.float32)
        m = _tf_twin(in_dim, seed=5)
        run = tmp_path / "run0"
        run.mkdir()
        f = run / "saved_model_50.keras"
        m.save(f)
        em.Parameters(
            main_path=str(run), n_neurons=N_NEURONS,
            activation_functions=ACTS, periodicity=float("inf"),
            current_training_step=50,
        ).save(run / "parameters.json")
        emap = em.EncoderMap.from_checkpoint(f, train_data=data)
        np.testing.assert_allclose(
            emap.encode(data),
            m.encoder_model(tf.convert_to_tensor(data)).numpy(),
            atol=1e-5,
        )


def _subclassed_twin(in_dim: int, seed: int = 0) -> tf.keras.Model:
    """A SUBCLASSED twin mirroring the reference's base-EncoderMap
    ``SequentialModel`` (``models/models.py:3283-3306``): no functional
    layer graph — ``encoder_model``/``decoder_model`` Sequential
    attributes whose bottleneck Dense is named ``Latent``
    (``models.py:3152``), and a get_config carrying the serialized
    submodels under ``encoder``/``decoder`` keys."""
    import keras

    ki = tf.keras.initializers.GlorotUniform(seed=seed)

    class RefTwin(tf.keras.Model):
        def __init__(self, **kw):
            kw.pop("name", None)
            super().__init__(**kw)
            enc = [
                tf.keras.layers.Dense(
                    N_NEURONS[0], activation="tanh", name="Encoder_0",
                    kernel_initializer=ki, input_shape=(in_dim,),
                ),
                tf.keras.layers.Dense(
                    N_NEURONS[1], activation="tanh", name="Encoder_1",
                    kernel_initializer=ki,
                ),
                tf.keras.layers.Dense(
                    N_NEURONS[2], activation=None, name="Latent",
                    kernel_initializer=ki,
                ),
            ]
            self.encoder_model = tf.keras.Sequential(enc, name="Encoder")
            dec_dims = N_NEURONS[-2::-1] + [in_dim]
            dec = [
                tf.keras.layers.Dense(
                    n, activation=(act or None), name=f"Decoder_{i}",
                    kernel_initializer=ki,
                )
                for i, (n, act) in enumerate(zip(dec_dims, ACTS[-2::-1]))
            ]
            self.decoder_model = tf.keras.Sequential(dec, name="Decoder")

        def call(self, x):
            return self.decoder_model(self.encoder_model(x))

        def get_config(self):
            c = super().get_config()
            c.update({
                "input_dim": in_dim,
                "parameters": {"dummy": 1},
                "sparse": False,
                "encoder": keras.saving.serialize_keras_object(
                    self.encoder_model),
                "decoder": keras.saving.serialize_keras_object(
                    self.decoder_model),
                "get_dense_model": None,
            })
            return c

    m = RefTwin()
    m(tf.zeros((2, in_dim)))
    return m


class TestSubclassedReferenceModel:
    """Genuine reference base-EncoderMap checkpoints are saved from a
    SUBCLASSED model — config has no top-level 'layers', weights sit under
    attribute-named h5 groups, and the bottleneck Dense is 'Latent'."""

    def test_reads_subclassed_layout_with_latent(self, tmp_path):
        m = _subclassed_twin(10, seed=2)
        f = tmp_path / "saved_model_40.keras"
        m.save(f)
        denses = read_keras_dense_weights(f)
        assert [d["name"] for d in denses] == [
            "Encoder/Encoder_0", "Encoder/Encoder_1", "Encoder/Latent",
            "Decoder/Decoder_0", "Decoder/Decoder_1", "Decoder/Decoder_2",
        ]
        params, step = import_keras_checkpoint(f)
        assert step == 40
        # the Latent layer must land as the LAST encoder layer
        assert [l["kernel"].shape for l in params["encoder"]] == [
            (10, 16), (16, 16), (16, 2)
        ]
        enc_denses = [l for l in m.encoder_model.layers
                      if isinstance(l, tf.keras.layers.Dense)]
        for ours, theirs in zip(params["encoder"], enc_denses):
            np.testing.assert_array_equal(
                ours["kernel"], theirs.kernel.numpy())

    def test_from_checkpoint_subclassed(self, tmp_path):
        import encodermap_tpu as em

        in_dim = 10
        data = np.random.default_rng(4).normal(
            size=(16, in_dim)).astype(np.float32)
        m = _subclassed_twin(in_dim, seed=9)
        run = tmp_path / "run0"
        run.mkdir()
        m.save(run / "saved_model_60.keras")
        em.Parameters(
            main_path=str(run), n_neurons=N_NEURONS,
            activation_functions=ACTS, periodicity=float("inf"),
            current_training_step=60,
        ).save(run / "parameters.json")
        emap = em.EncoderMap.from_checkpoint(run, train_data=data)
        assert int(emap.state.step) == 60
        np.testing.assert_allclose(
            emap.encode(data),
            m.encoder_model(tf.convert_to_tensor(data)).numpy(),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            emap.decode(emap.encode(data)),
            m(tf.convert_to_tensor(data)).numpy(),
            atol=1e-5,
        )


class TestADCKerasImport:
    @pytest.mark.skipif(
        not Path("/root/reference/tests/data").exists(),
        reason="reference test data not mounted",
    )
    def test_adc_project_layout_loads(self, tmp_path):
        """A synthesized reference-layout project directory (ensemble h5 +
        parameters.json + saved_model_N.keras) loads into a working ADC
        autoencoder whose encoder weights are the keras file's."""
        import encodermap_tpu as em

        traj = em.load("/root/reference/tests/data/asp7.xtc",
                       "/root/reference/tests/data/asp7.pdb")
        trajs = em.TrajEnsemble([traj])
        trajs.load_CVs("all")
        proj = tmp_path / "project"
        proj.mkdir()
        trajs.save(proj / "trajs.h5")

        # train briefly so shapes/params are real, then export the weights
        # into a reference-shaped .keras
        p = em.ADCParameters(
            main_path=str(proj), n_steps=10, steps_per_scan=5,
            batch_size=16, use_backbone_angles=True, use_sidechains=True,
            n_neurons=N_NEURONS, activation_functions=ACTS, seed=0,
        )
        adc = em.AngleDihedralCartesianEncoderMap(trajs, p)
        adc.train()
        # remove the npz checkpoints: only the .keras must remain, so the
        # loader exercises the keras path
        for f in proj.glob("saved_model_*.npz"):
            f.unlink()
        for f in list(proj.glob("saved_model_*.opt.npz")) + list(
                proj.glob("saved_model_*.rng.npy")):
            f.unlink()

        enc_dims = [w["kernel"].shape for w in adc.state.params["encoder"]]
        in_dim = enc_dims[0][0]
        m = _tf_twin_from_params(adc.state.params, in_dim)
        m.save(proj / f"saved_model_{int(adc.state.step)}.keras")

        # load_autoencoder defaults False like the reference (wave 24);
        # the tuple return is the opt-in form
        ens2, adc2 = em.load_project(str(proj), load_autoencoder=True)
        assert adc2 is not None
        np.testing.assert_allclose(
            np.asarray(adc2.state.params["encoder"][0]["kernel"]),
            np.asarray(adc.state.params["encoder"][0]["kernel"]),
            atol=1e-7,
        )
        lat = adc2.encode()
        np.testing.assert_allclose(lat[:8], adc.encode()[:8], atol=1e-5)
        xyz = adc2.generate(lat[:2])
        assert np.isfinite(xyz).all()


def _tf_twin_from_params(params: dict, in_dim: int) -> tf.keras.Model:
    """Build the reference-shaped TF twin carrying OUR trained weights."""
    e_in = tf.keras.Input((in_dim,))
    x = e_in
    for i, lp in enumerate(params["encoder"]):
        x = tf.keras.layers.Dense(
            lp["kernel"].shape[1], name=f"Encoder_{i}"
        )(x)
    enc = tf.keras.Model(e_in, x, name="Encoder")
    d_in = tf.keras.Input((params["decoder"][0]["kernel"].shape[0],))
    y = d_in
    for i, lp in enumerate(params["decoder"]):
        y = tf.keras.layers.Dense(
            lp["kernel"].shape[1], name=f"Decoder_{i}"
        )(y)
    dec = tf.keras.Model(d_in, y, name="Decoder")
    inp = tf.keras.Input((in_dim,))
    model = tf.keras.Model(inp, dec(enc(inp)))
    for sub, key in ((enc, "encoder"), (dec, "decoder")):
        denses = [l for l in sub.layers
                  if isinstance(l, tf.keras.layers.Dense)]
        for layer, lp in zip(denses, params[key]):
            layer.set_weights(
                [np.asarray(lp["kernel"]), np.asarray(lp["bias"])]
            )
    return model


class TestPositionalSplitThroughAPI:
    def test_from_checkpoint_generic_dense_names(self, tmp_path):
        """Keras files whose Dense layers are NOT named Encoder_i/Decoder_i
        (hand-built models) import through from_checkpoint via the
        positional split — n_encoder=len(p.n_neurons) is plumbed from
        parameters.json, so the 'pass n_encoder' error is reachable only
        from the low-level importer (review wave 22)."""
        import encodermap_tpu as em

        in_dim = 10
        rng = np.random.default_rng(7)
        data = rng.normal(size=(32, in_dim)).astype(np.float32)
        ki = tf.keras.initializers.GlorotUniform(seed=3)
        m = tf.keras.Sequential([tf.keras.Input((in_dim,))] + [
            tf.keras.layers.Dense(n, activation=act or None,
                                  kernel_initializer=ki)
            for n, act in list(zip(N_NEURONS, ACTS[1:]))
            + list(zip(N_NEURONS[-2::-1] + [in_dim], ACTS[-2::-1]))
        ])
        run = tmp_path / "run0"
        run.mkdir()
        m.save(run / "saved_model_25.keras")
        em.Parameters(
            main_path=str(run), n_neurons=N_NEURONS,
            activation_functions=ACTS, periodicity=float("inf"),
            current_training_step=25,
        ).save(run / "parameters.json")

        emap = em.EncoderMap.from_checkpoint(run, train_data=data)
        assert int(emap.state.step) == 25
        np.testing.assert_allclose(
            emap.decode(emap.encode(data)),
            m(tf.convert_to_tensor(data)).numpy(),
            atol=1e-5,
        )
