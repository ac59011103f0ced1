# tests/test_metrics.py
"""User-facing metric classes (reference ``callbacks/metrics.py:250-581``):
the ``EncoderMapBaseMetric`` subclass contract (``emap.add_metric(MyMetric)``
with an ``update(y_true, y_pred)`` method, history key ``"<Name> Metric"``),
the named ``ADCClashMetric``/``ADCRMSDMetric`` classes, and ``rmsd_numpy``."""

import jax.numpy as jnp
import numpy as np
import pytest

import encodermap_tpu as em
from encodermap_tpu.parameters import ADCParameters, Parameters
from encodermap_tpu.train.adc_autoencoder import AngleDihedralCartesianEncoderMap
from encodermap_tpu.train.autoencoder import EncoderMap
from encodermap_tpu.train.metrics import (
    ADCClashMetric,
    ADCRMSDMetric,
    AngleDihedralCartesianEncoderMapBaseMetric,
    EncoderMapBaseMetric,
    rmsd_numpy,
)
from tests.test_adc import _params, synthetic_cvs


@pytest.fixture(scope="module")
def cvs():
    return synthetic_cvs(np.random.default_rng(3), n_frames=120, n_res=6)


class TestBaseMetricContract:
    def test_subclass_in_history(self, tmp_path):
        """The reference's doctest contract (metrics.py:266-278): pass the
        CLASS, get one entry per step under '<Name> Metric'."""

        class MyMetric(EncoderMapBaseMetric):
            def update(self, y_true, y_pred):
                return jnp.asarray(0.0)

        p = Parameters(main_path=str(tmp_path), n_steps=10, steps_per_scan=5,
                       batch_size=16, n_neurons=[8, 2],
                       activation_functions=["", "tanh", ""],
                       periodicity=float("inf"))
        data = np.random.default_rng(0).random((64, 6)).astype(np.float32)
        emap = EncoderMap(p, data, read_only=True)
        emap.add_metric(MyMetric)
        history = emap.train()
        assert "MyMetric Metric" in history
        assert len(history["MyMetric Metric"]) == p.n_steps
        assert np.all(np.asarray(history["MyMetric Metric"]) == 0.0)

    def test_metric_sees_decoded_output(self, tmp_path):
        """y_true is the input batch, y_pred the decoded output."""
        seen_shapes = {}

        class ShapeMetric(EncoderMapBaseMetric):
            def update(self, y_true, y_pred):
                seen_shapes["t"] = tuple(y_true.shape)
                seen_shapes["p"] = tuple(y_pred.shape)
                return jnp.mean(jnp.abs(y_true - y_pred))

        p = Parameters(main_path=str(tmp_path), n_steps=4, steps_per_scan=2,
                       batch_size=8, n_neurons=[8, 2],
                       activation_functions=["", "tanh", ""],
                       periodicity=float("inf"))
        data = np.random.default_rng(1).random((32, 5)).astype(np.float32)
        emap = EncoderMap(p, data, read_only=True)
        emap.add_metric(ShapeMetric)
        history = emap.train()
        assert seen_shapes["t"] == (8, 5)
        assert seen_shapes["p"] == (8, 5)
        assert np.isfinite(history["ShapeMetric Metric"]).all()

    def test_missing_update_raises(self):
        class Empty(EncoderMapBaseMetric):
            pass

        with pytest.raises(Exception, match="update"):
            Empty()

    def test_training_step_mismatch_raises(self):
        class M(EncoderMapBaseMetric):
            def update(self, y_true, y_pred):
                return 0.0

        p = Parameters()
        p.current_training_step = 5
        with pytest.raises(Exception, match="different"):
            M(parameters=p, current_training_step=3)

    def test_config_round_trip(self):
        class M(AngleDihedralCartesianEncoderMapBaseMetric):
            def update(self, y_true, y_pred):
                return 0.0

        m = M(parameters=ADCParameters(batch_size=17))
        m2 = M.from_config(m.get_config())
        assert m2.name == "M Metric"
        assert isinstance(m2.p, ADCParameters)
        assert m2.p.batch_size == 17

    def test_clash_metric_config_round_trips_distance_unit(self):
        # the reference's get_config omits distance_unit (its from_config
        # would crash on the missing required arg); ours must round-trip it
        m = ADCClashMetric(distance_unit="ang", parameters=ADCParameters())
        m2 = ADCClashMetric.from_config(m.get_config())
        assert m2.clash_distance == m.clash_distance == 1.0

    def test_exposed_via_callbacks_subpackage(self):
        assert em.callbacks.EncoderMapBaseMetric is EncoderMapBaseMetric
        assert em.callbacks.ADCClashMetric is ADCClashMetric
        assert em.callbacks.ADCRMSDMetric is ADCRMSDMetric


class TestADCMetrics:
    def test_clash_and_rmsd_in_training(self, cvs, tmp_path):
        p = _params(tmp_path, n_steps=6, steps_per_scan=3,
                    use_backbone_angles=True)
        emap = AngleDihedralCartesianEncoderMap(cvs, p, read_only=True)
        emap.add_metric(ADCClashMetric(distance_unit="nm", parameters=p))
        emap.add_metric(ADCRMSDMetric(parameters=p))
        history = emap.train()
        clashes = np.asarray(history["ADCClashMetric"])
        rmsd = np.asarray(history["ADCRMSDMetric"])
        assert clashes.shape == (6,) and (clashes >= 0).all()
        assert rmsd.shape == (6,) and np.isfinite(rmsd).all() and (rmsd >= 0).all()

    def test_clash_metric_matches_in_graph_tracking(self, cvs, tmp_path):
        """The metric object and the built-in track_clashes compute the same
        quantity (up to the one-step parameter staleness of the aux path) —
        on a 0-step-of-training first batch with the same params they agree
        exactly when evaluated directly."""
        p = _params(tmp_path, n_steps=2, steps_per_scan=2)
        emap = AngleDihedralCartesianEncoderMap(cvs, p, read_only=True)
        batch = tuple(
            jnp.asarray(v[:32]) for v in (
                cvs["central_angles"], cvs["central_dihedrals"],
                cvs["central_cartesians"], cvs["central_distances"],
            )
        )
        m = ADCClashMetric(distance_unit="nm", parameters=p)
        val = float(m.update(*emap._metric_io(emap.state.params, batch)))
        # recompute by hand from the same forward
        from encodermap_tpu.models import adc
        from encodermap_tpu.ops.distances import pairwise_dist

        back = adc.forward(emap.state.params, p, batch, emap.shapes)[3]
        d = pairwise_dist(back, flat=True)
        expected = float(jnp.mean(jnp.sum((d < 0.1).astype(jnp.float32), -1)))
        assert val == pytest.approx(expected, rel=1e-6)

    def test_sidechain_variant_runs(self, cvs, tmp_path):
        p = _params(tmp_path, n_steps=4, steps_per_scan=2,
                    use_backbone_angles=True, use_sidechains=True)
        emap = AngleDihedralCartesianEncoderMap(cvs, p, read_only=True)
        emap.add_metric(ADCClashMetric(distance_unit="nm", parameters=p))
        history = emap.train()
        assert np.isfinite(history["ADCClashMetric"]).all()

    def test_bad_distance_unit_raises(self):
        with pytest.raises(Exception, match="distance_unit"):
            ADCClashMetric(distance_unit="pm")

    def test_add_metric_accepts_builtin_classes(self, cvs, tmp_path):
        """The documented CLASS form ``emap.add_metric(ADCClashMetric)``
        must instantiate with ``parameters=`` by keyword — the built-in
        classes take distance_unit/name as their first positional (the
        reference's positional ``metric(self.p)`` crashes there, wave 28)."""
        p = _params(tmp_path, n_steps=2, steps_per_scan=2,
                    use_backbone_angles=True)
        emap = AngleDihedralCartesianEncoderMap(cvs, p, read_only=True)
        emap.add_metric(ADCClashMetric)
        emap.add_metric(ADCRMSDMetric)
        history = emap.train()
        assert np.isfinite(history["ADCClashMetric"]).all()
        assert np.isfinite(history["ADCRMSDMetric"]).all()

    def test_rmsd_uniform_weights_in_reconstruct_mode(self):
        """reconstruct_sidechains puts ALL-atom coordinates at y_pred[2];
        tiling the N-CA-C mass triplets over that layout misweights every
        sidechain atom, so the metric must fall back to uniform weights
        (documented divergence from the reference's kabsch_tf, wave 28)."""
        from encodermap_tpu.ops.kabsch import rmsd as rmsd_op

        rng = np.random.default_rng(0)
        a = rng.normal(size=(4, 20, 3)).astype(np.float32)
        b = a + rng.normal(scale=0.1, size=a.shape).astype(np.float32)
        p = ADCParameters(reconstruct_sidechains=True)
        m = ADCRMSDMetric(parameters=p)
        got = float(m.update((None, None, a), (None, None, b)))
        expected = float(jnp.mean(rmsd_op(jnp.asarray(a), jnp.asarray(b))))
        assert got == pytest.approx(expected, rel=1e-6)


class TestRmsdNumpy:
    def test_identical_is_zero(self):
        a = np.random.default_rng(0).random((4, 9, 3)).astype(np.float32)
        out = rmsd_numpy(a, a.copy())
        assert out.shape == (4,)
        np.testing.assert_allclose(out, 0.0, atol=1e-5)

    def test_rigid_motion_is_zero(self):
        rng = np.random.default_rng(1)
        a = rng.random((2, 12, 3)).astype(np.float32)
        theta = 0.7
        R = np.array([[np.cos(theta), -np.sin(theta), 0],
                      [np.sin(theta), np.cos(theta), 0],
                      [0, 0, 1]], np.float32)
        b = a @ R.T + np.array([1.0, -2.0, 0.5], np.float32)
        np.testing.assert_allclose(rmsd_numpy(a, b), 0.0, atol=1e-5)

    def test_displacement_detected(self):
        a = np.zeros((1, 6, 3), np.float32)
        a[0, :, 0] = np.arange(6)
        b = a.copy()
        b[0, 0, 1] += 1.0  # move one atom off the line
        assert rmsd_numpy(a, b)[0] > 0.05
