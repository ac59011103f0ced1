# tests/test_losses.py
"""Losses vs analytic NumPy references, mirroring the reference's
``tests/test_losses.py`` (constant-output models make costs predictable)."""

import numpy as np
import pytest
from scipy.spatial.distance import pdist, squareform

import jax.numpy as jnp

import encodermap_tpu.losses as L
from encodermap_tpu.parameters import ADCParameters, Parameters
from tests import reference_impl as ref


@pytest.fixture
def p():
    return Parameters()


@pytest.fixture
def adc_p():
    return ADCParameters()


class TestSigmoidLoss:
    def test_against_scipy(self, rng, p):
        """Non-periodic sigmoid loss against a scipy-pdist-based computation."""
        hi = rng.standard_normal((32, 10)).astype(np.float32)
        lo = rng.standard_normal((32, 2)).astype(np.float32)
        out = float(
            L.sigmoid_loss(
                jnp.asarray(hi), jnp.asarray(lo), p.dist_sig_parameters, float("inf")
            )
        )
        sig_h, a_h, b_h, sig_l, a_l, b_l = p.dist_sig_parameters
        dh = squareform(pdist(hi))
        dl = squareform(pdist(lo))
        expected = np.mean(
            (ref.sigmoid_np(dh, sig_h, a_h, b_h) - ref.sigmoid_np(dl, sig_l, a_l, b_l))
            ** 2
        )
        assert out == pytest.approx(expected, abs=1e-5)

    def test_periodic(self, rng, p):
        hi = rng.uniform(-np.pi, np.pi, (16, 6)).astype(np.float32)
        lo = rng.standard_normal((16, 2)).astype(np.float32)
        out = float(
            L.sigmoid_loss(
                jnp.asarray(hi), jnp.asarray(lo), p.dist_sig_parameters, 2 * np.pi
            )
        )
        sig_h, a_h, b_h, sig_l, a_l, b_l = p.dist_sig_parameters
        dh = ref.pairwise_dist_periodic_np(hi.astype(np.float64), 2 * np.pi)
        dl = squareform(pdist(lo))
        expected = np.mean(
            (ref.sigmoid_np(dh, sig_h, a_h, b_h) - ref.sigmoid_np(dl, sig_l, a_l, b_l))
            ** 2
        )
        assert out == pytest.approx(expected, abs=1e-5)


class TestSimpleLosses:
    def test_center_loss(self, rng, p):
        latent = rng.standard_normal((64, 2)).astype(np.float32)
        out = float(L.center_loss(jnp.asarray(latent), p))
        assert out == pytest.approx(np.mean(latent**2) * p.center_cost_scale, rel=1e-5)

    def test_center_loss_none_scale(self, rng):
        p = Parameters(center_cost_scale=None)
        latent = rng.standard_normal((8, 2)).astype(np.float32)
        assert float(L.center_loss(jnp.asarray(latent), p)) == 0.0

    @pytest.mark.parametrize("variant", ["mean_abs", "mean_square", "mean_norm"])
    def test_auto_loss_variants(self, rng, variant):
        p = Parameters(auto_cost_variant=variant)
        x = rng.uniform(-np.pi, np.pi, (32, 6)).astype(np.float32)
        y = rng.uniform(-np.pi, np.pi, (32, 6)).astype(np.float32)
        out = float(L.auto_loss(jnp.asarray(x), jnp.asarray(y), p))
        d = ref.periodic_distance_np(x.astype(np.float64), y.astype(np.float64))
        if variant == "mean_abs":
            expected = np.abs(d).mean()
        elif variant == "mean_square":
            expected = (d**2).mean()
        else:
            expected = np.linalg.norm(d, axis=1).mean()
        assert out == pytest.approx(expected * p.auto_cost_scale, abs=1e-5)

    def test_regularization_loss(self, rng, p):
        from encodermap_tpu.nn import l2_sum

        params = {
            "encoder": [
                {"kernel": jnp.asarray(rng.standard_normal((4, 8)), jnp.float32),
                 "bias": jnp.zeros(8)},
            ],
            "decoder": [
                {"kernel": jnp.asarray(rng.standard_normal((8, 4)), jnp.float32),
                 "bias": jnp.zeros(4)},
            ],
        }
        out = float(L.regularization_loss(l2_sum(params), p))
        expected = p.l2_reg_constant * (
            np.sum(np.asarray(params["encoder"][0]["kernel"]) ** 2)
            + np.sum(np.asarray(params["decoder"][0]["kernel"]) ** 2)
        )
        assert out == pytest.approx(expected, rel=1e-5)

    def test_distance_loss_scaling(self, rng, p):
        x = rng.uniform(-np.pi, np.pi, (16, 6)).astype(np.float32)
        z = rng.standard_normal((16, 2)).astype(np.float32)
        base = float(
            L.sigmoid_loss(jnp.asarray(x), jnp.asarray(z), p.dist_sig_parameters, p.periodicity)
        )
        scaled = float(L.distance_loss(jnp.asarray(x), jnp.asarray(z), p))
        assert scaled == pytest.approx(base * p.distance_cost_scale, rel=1e-5)


class TestADCLosses:
    @pytest.mark.parametrize(
        "fn,scale_attr",
        [
            (L.dihedral_loss, "dihedral_cost_scale"),
            (L.angle_loss, "angle_cost_scale"),
            (L.side_dihedral_loss, "side_dihedral_cost_scale"),
        ],
    )
    def test_angle_family(self, rng, adc_p, fn, scale_attr):
        x = rng.uniform(-np.pi, np.pi, (16, 9)).astype(np.float32)
        y = rng.uniform(-np.pi, np.pi, (16, 9)).astype(np.float32)
        out = float(fn(jnp.asarray(x), jnp.asarray(y), adc_p))
        d = ref.periodic_distance_np(x.astype(np.float64), y.astype(np.float64))
        scale = getattr(adc_p, scale_attr)
        expected = np.abs(d).mean() * (scale if scale is not None else 0.0)
        assert out == pytest.approx(expected, abs=1e-5)

    def test_cartesian_loss_variants(self, rng, adc_p):
        a = rng.uniform(0, 5, (16, 45)).astype(np.float32)
        b = rng.uniform(0, 5, (16, 45)).astype(np.float32)
        out = float(L.cartesian_loss(jnp.asarray(a), jnp.asarray(b), adc_p))
        expected = np.abs(a - b).mean() / adc_p.cartesian_cost_reference
        assert out == pytest.approx(expected * adc_p.cartesian_cost_scale, abs=1e-5)

    @pytest.mark.parametrize("n", [20, 158])
    def test_cartesian_distance_loss_matrix_equals_flat(self, rng, adc_p, n):
        """The dense-matrix form (used by the ADC step for >= 64 CAs) must
        equal the flat-triu form EXACTLY: row distances scale by sqrt(2)
        and the sqrt(2)-scaled sigma absorbs it (losses.py docstring)."""
        from encodermap_tpu.ops.distances import pairwise_dist

        pts = jnp.asarray(rng.uniform(0, 5, (32, n, 3)).astype(np.float32))
        z = jnp.asarray(rng.standard_normal((32, 2)).astype(np.float32))
        flat = float(
            L.cartesian_distance_loss(pairwise_dist(pts, flat=True), z, adc_p)
        )
        mat = float(
            L.cartesian_distance_loss_matrix(pairwise_dist(pts), z, adc_p)
        )
        assert mat == pytest.approx(flat, rel=1e-6)

    def test_soft_start_schedule(self):
        p = ADCParameters(
            cartesian_cost_scale=10.0, cartesian_cost_scale_soft_start=(100, 200)
        )
        assert float(L.soft_start_scale(p, jnp.asarray(0))) == 0.0
        assert float(L.soft_start_scale(p, jnp.asarray(100))) == 0.0
        assert float(L.soft_start_scale(p, jnp.asarray(150))) == pytest.approx(5.0)
        assert float(L.soft_start_scale(p, jnp.asarray(200))) == pytest.approx(10.0)
        assert float(L.soft_start_scale(p, jnp.asarray(10**6))) == pytest.approx(10.0)

    def test_soft_start_disabled(self):
        p = ADCParameters(cartesian_cost_scale=3.0)
        assert float(L.soft_start_scale(p, jnp.asarray(0))) == pytest.approx(3.0)

    def test_soft_start_instant_switch(self):
        """a == b (instant switch-on) must be a step function, not a 0/0
        NaN exactly at step == a."""
        p = ADCParameters(
            cartesian_cost_scale=10.0,
            cartesian_cost_scale_soft_start=(1000, 1000),
        )
        assert float(L.soft_start_scale(p, jnp.asarray(999))) == 0.0
        assert float(L.soft_start_scale(p, jnp.asarray(1000))) == pytest.approx(10.0)
        assert float(L.soft_start_scale(p, jnp.asarray(1001))) == pytest.approx(10.0)

    def test_cartesian_distance_loss(self, rng, adc_p):
        pwd = rng.uniform(0, 5, (16, 45)).astype(np.float32)
        z = rng.standard_normal((16, 2)).astype(np.float32)
        out = float(L.cartesian_distance_loss(jnp.asarray(pwd), jnp.asarray(z), adc_p))
        base = float(
            L.sigmoid_loss(
                jnp.asarray(pwd), jnp.asarray(z),
                adc_p.cartesian_dist_sig_parameters, float("inf"),
            )
        )
        assert out == pytest.approx(base * adc_p.cartesian_distance_cost_scale, rel=1e-5)
