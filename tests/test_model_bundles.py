# tests/test_model_bundles.py
"""Reference-named model factories and custom-loop conveniences.

Covers the surfaces the reference exposes for users who build their own
training loops instead of the high-level ``EncoderMap`` classes:

* ``gen_sequential_model`` / ``SequentialModel`` (reference
  ``models/models.py:105,256-288,3099-3401``),
* ``gen_functional_model`` / ``ADCFunctionalModel`` (reference
  ``models/models.py:385-1060,2152-2523``),
* ``reconstruction_loss`` / ``loss_combinator`` (reference
  ``loss_functions/loss_functions.py:146-198,511-551``),
* ``save_model`` / ``load_model`` (reference
  ``misc/saving_loading_models.py:75``),
* ``add_layer_summaries`` (reference ``misc/summaries.py:73-98``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import encodermap_tpu as em
from encodermap_tpu.losses import loss_combinator, reconstruction_loss
from encodermap_tpu.models import (
    ADCFunctionalModel,
    SequentialModel,
    gen_functional_model,
    gen_sequential_model,
)
from encodermap_tpu.models import adc as adc_mod
from encodermap_tpu.models import sequential as seq_mod
from encodermap_tpu.parameters import ADCParameters, Parameters


SMALL = dict(n_neurons=[16, 16, 2], activation_functions=["", "tanh", "tanh", ""])


@pytest.fixture
def adc_inputs(rng):
    # 12-atom backbone chain: 11 distances, 10 angles, 9 dihedrals
    angles = rng.uniform(0.5, 2.5, (4, 10)).astype(np.float32)
    dihedrals = rng.uniform(-np.pi, np.pi, (4, 9)).astype(np.float32)
    cart = rng.standard_normal((4, 12, 3)).astype(np.float32)
    dist = rng.uniform(0.1, 0.2, (4, 11)).astype(np.float32)
    return angles, dihedrals, cart, dist


class TestSequentialModelBundle:
    def test_roundtrip_shapes_and_parity(self, rng):
        p = Parameters(periodicity=float("inf"), **SMALL)
        m = gen_sequential_model(10, p)
        assert isinstance(m, SequentialModel)
        x = rng.standard_normal((8, 10)).astype(np.float32)
        z = m.encoder(x)
        y = m(x)
        assert z.shape == (8, 2) and y.shape == (8, 10)
        # bundle == the pure functions it wraps
        z_ref = seq_mod.encode(m.params, m.p, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref))
        y_ref = seq_mod.decode(m.params, m.p, z_ref)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref))

    def test_periodic_inputs(self, rng):
        m = gen_sequential_model(7, Parameters(periodicity=2 * np.pi, **SMALL))
        x = rng.uniform(-np.pi, np.pi, (4, 7)).astype(np.float32)
        y = m(x)
        assert y.shape == (4, 7)
        assert np.all(np.abs(np.asarray(y)) <= np.pi + 1e-6)

    def test_seed_determinism(self):
        p = Parameters(periodicity=float("inf"), **SMALL)
        a = SequentialModel(5, p, seed=3)
        b = SequentialModel(5, p, seed=3)
        c = SequentialModel(5, p, seed=4)
        la, lb = jax.tree_util.tree_leaves(a.params), jax.tree_util.tree_leaves(b.params)
        assert all(np.array_equal(x, y) for x, y in zip(la, lb))
        lc = jax.tree_util.tree_leaves(c.params)
        assert any(not np.array_equal(x, y) for x, y in zip(la, lc))

    def test_adc_parameters_rejected(self):
        with pytest.raises(TypeError, match="gen_functional_model"):
            gen_sequential_model(10, ADCParameters())
        with pytest.raises(TypeError, match="Parameters"):
            gen_sequential_model(10, parameters=object())

    def test_sparse_densifies_nans(self, rng):
        m = gen_sequential_model(6, Parameters(periodicity=float("inf"), **SMALL),
                                 sparse=True)
        x = rng.standard_normal((4, 6)).astype(np.float32)
        x[0, 2] = np.nan
        y = m(x)
        assert np.all(np.isfinite(np.asarray(y)))


class TestADCFunctionalModelBundle:
    def test_forward_matches_pure_fn(self, adc_inputs):
        p = ADCParameters(use_backbone_angles=True, **SMALL)
        m = gen_functional_model(((10,), (9,), (12, 3), (11,)), p)
        assert isinstance(m, ADCFunctionalModel)
        out = m(adc_inputs)
        ref = adc_mod.forward(
            m.params, m.p, tuple(jnp.asarray(x) for x in adc_inputs), m.shapes
        )
        assert len(out) == len(ref)
        for a, b in zip(out, ref):
            if a is None or b is None:
                assert a is b
            else:
                np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_encoder_decoder_halves(self, adc_inputs):
        p = ADCParameters(use_backbone_angles=True, **SMALL)
        m = gen_functional_model(((10,), (9,), (12, 3), (11,)), p)
        z = m.encoder(adc_inputs)
        assert z.shape == (4, 2)
        dec = m.decoder(z)
        # (angles, dihedrals[, side_dihedrals]) splits
        assert dec[0].shape == (4, 10) and dec[1].shape == (4, 9)

    def test_sidechain_shapes(self, rng, adc_inputs):
        p = ADCParameters(use_backbone_angles=True, use_sidechains=True, **SMALL)
        m = gen_functional_model(((10,), (9,), (12, 3), (11,), (5,)), p)
        side = rng.uniform(-np.pi, np.pi, (4, 5)).astype(np.float32)
        out = m(adc_inputs + (side,))
        assert m.shapes.n_side_dihedrals == 5
        z = m.encoder(adc_inputs + (side,))
        assert z.shape == (4, 2)

    def test_cartesian_shape_as_scalar(self):
        # reference accepts n_cartesians with or without the trailing 3
        p = ADCParameters(use_backbone_angles=True, **SMALL)
        m1 = gen_functional_model(((10,), (9,), (12, 3), (11,)), p)
        m2 = gen_functional_model(((10,), (9,), (12,), (11,)), p)
        assert m1.shapes == m2.shapes


class TestLossFactories:
    def test_reconstruction_loss_with_model(self, rng):
        m = gen_sequential_model(10, Parameters(periodicity=float("inf"), **SMALL))
        x = rng.standard_normal((8, 10)).astype(np.float32)
        loss = reconstruction_loss(m)
        expected = float(np.mean((np.asarray(m(x)) - x) ** 2))
        assert float(loss(x)) == pytest.approx(expected, rel=1e-6)

    def test_reconstruction_loss_with_y_pred(self, rng):
        x = rng.standard_normal((4, 3)).astype(np.float32)
        y = rng.standard_normal((4, 3)).astype(np.float32)
        loss = reconstruction_loss()
        assert float(loss(x, y)) == pytest.approx(float(np.mean((y - x) ** 2)), rel=1e-6)

    def test_reconstruction_loss_needs_model_or_pred(self, rng):
        with pytest.raises(ValueError, match="model"):
            reconstruction_loss()(np.zeros((2, 2), np.float32))

    def test_reconstruction_loss_is_differentiable(self, rng):
        m = gen_sequential_model(6, Parameters(periodicity=float("inf"), **SMALL))
        x = jnp.asarray(rng.standard_normal((4, 6)).astype(np.float32))

        def scalar(params):
            y = seq_mod.forward(params, m.p, x)
            return jnp.mean(jnp.square(y - x))

        g = jax.grad(scalar)(m.params)
        assert all(np.all(np.isfinite(l)) for l in jax.tree_util.tree_leaves(g))

    def test_loss_combinator_sums(self, rng):
        x = rng.standard_normal((4, 3)).astype(np.float32)
        y = x + 1.0
        combined = loss_combinator(
            lambda t, p: jnp.mean(jnp.square(p - t)),
            lambda t, p: jnp.asarray(2.0),
        )
        assert float(combined(x, y)) == pytest.approx(3.0, rel=1e-6)


class TestSaveLoadModel:
    def _trained_em(self, tmp_path, rng):
        data = rng.standard_normal((64, 10)).astype(np.float32)
        p = Parameters(periodicity=float("inf"), main_path=str(tmp_path),
                       n_steps=2, batch_size=16, checkpoint_step=100,
                       tensorboard=False, **SMALL)
        e = em.EncoderMap(parameters=p, train_data=data)
        return e, data

    def test_roundtrip(self, tmp_path, rng):
        from encodermap_tpu.misc import load_model, save_model

        e, data = self._trained_em(tmp_path, rng)
        path = save_model(e)
        assert path is not None
        out = load_model(em.EncoderMap, path, train_data=data)
        np.testing.assert_allclose(
            np.asarray(e.encode(data[:4])), np.asarray(out.encode(data[:4])),
            rtol=1e-6,
        )

    def test_class_inference_and_submodel(self, tmp_path, rng):
        from encodermap_tpu.misc import load_model, save_model

        e, data = self._trained_em(tmp_path, rng)
        path = save_model(e)
        # autoencoder=None infers plain EncoderMap from parameters.json
        enc = load_model(None, path, train_data=data, submodel="encoder")
        np.testing.assert_allclose(
            np.asarray(e.encode(data[:4])), np.asarray(enc(data[:4])), rtol=1e-6
        )
        with pytest.raises(ValueError, match="submodel"):
            load_model(None, path, train_data=data, submodel="bottleneck")

    def test_main_path_mismatch_raises(self, tmp_path, rng):
        from encodermap_tpu.misc import save_model

        e, _ = self._trained_em(tmp_path, rng)
        with pytest.raises(ValueError, match="main_path"):
            save_model(e, main_path=str(tmp_path / "elsewhere"))

    def test_needs_checkpoint_path(self):
        from encodermap_tpu.misc import load_model

        with pytest.raises(ValueError, match="checkpoint_path"):
            load_model(em.EncoderMap, None)


class TestAddLayerSummaries:
    def test_scopes_and_stats(self, tmp_path, rng):
        from encodermap_tpu.misc.summaries import MetricsWriter, add_layer_summaries

        m = gen_sequential_model(10, Parameters(periodicity=float("inf"), **SMALL))
        w = MetricsWriter(tmp_path / "run")
        add_layer_summaries(w, step=0, params=m.params)
        w.close()
        import json

        rows = [json.loads(l) for l in
                (tmp_path / "run" / "train_metrics.jsonl").read_text().splitlines()]
        names = {k for r in rows for k in r if k != "step"}
        assert any(n.startswith("Encoder/") for n in names)
        assert any(n.startswith("Decoder/") for n in names)
        assert any("/weights/mean" in n for n in names)
        assert any("/biases/std" in n for n in names)
