# tests/test_distances.py
"""Distance kernels vs scipy + the reference's epsilon semantics.

Mirrors the coverage of the reference's ``tests/test_pairwise_distances.py``
and the distance parts of ``tests/test_losses.py``."""

import numpy as np
import pytest
from scipy.spatial.distance import cdist, pdist

import jax
import jax.numpy as jnp

from encodermap_tpu.ops.distances import (
    pairwise_dist,
    pairwise_dist_periodic,
    periodic_distance,
    periodic_distance_np,
    sigmoid,
)
from tests import reference_impl as ref


class TestNumpyOracles:
    def test_pairwise_dist_np_matches_scipy(self, rng):
        """Exercise the numpy pairwise oracle itself (an unexercised
        oracle rots silently)."""
        x = rng.standard_normal((20, 4))
        np.testing.assert_allclose(
            ref.pairwise_dist_np(x), cdist(x, x), atol=1e-12
        )


class TestPairwiseDist:
    def test_matches_scipy_cdist(self, rng):
        x = rng.standard_normal((37, 5)).astype(np.float32)
        out = np.asarray(pairwise_dist(jnp.asarray(x)))[0]
        expected = cdist(x, x)
        np.testing.assert_allclose(out, expected, atol=1e-5)

    def test_flat_matches_scipy_pdist(self, rng):
        x = rng.standard_normal((23, 4)).astype(np.float32)
        out = np.asarray(pairwise_dist(jnp.asarray(x), flat=True))[0]
        expected = pdist(x)
        np.testing.assert_allclose(out, expected, atol=1e-5)

    def test_squared(self, rng):
        x = rng.standard_normal((16, 3)).astype(np.float32)
        out = np.asarray(pairwise_dist(jnp.asarray(x), squared=True))[0]
        np.testing.assert_allclose(out, cdist(x, x) ** 2, atol=1e-4)

    def test_batched(self, rng):
        x = rng.standard_normal((4, 10, 3)).astype(np.float32)
        out = np.asarray(pairwise_dist(jnp.asarray(x)))
        for b in range(4):
            np.testing.assert_allclose(out[b], cdist(x[b], x[b]), atol=1e-5)

    def test_zero_distance_grad_is_finite(self):
        """The epsilon guard must keep gradients finite on the diagonal."""
        x = jnp.asarray(np.array([[0.0, 0.0], [1.0, 1.0], [1.0, 1.0]], np.float32))

        def loss(pts):
            return jnp.sum(pairwise_dist(pts))

        g = jax.grad(loss)(x)
        assert np.all(np.isfinite(np.asarray(g)))


class TestPeriodic:
    def test_periodic_distance_value(self):
        """Reference docstring example: d(1.5, -3.1) = 1.683185 with 2*pi."""
        a = jnp.asarray(np.array([[1.5], [1.5]], np.float32))
        b = jnp.asarray(np.array([[-3.1], [-3.1]], np.float32))
        out = np.asarray(periodic_distance(a, b))
        np.testing.assert_allclose(out, 1.68318531, rtol=1e-5)

    def test_periodic_np_matches_jax(self, rng):
        a = rng.uniform(-np.pi, np.pi, (10, 4)).astype(np.float32)
        b = rng.uniform(-np.pi, np.pi, (10, 4)).astype(np.float32)
        np.testing.assert_allclose(
            periodic_distance_np(a, b),
            np.asarray(periodic_distance(jnp.asarray(a), jnp.asarray(b))),
            atol=1e-6,
        )

    def test_pairwise_periodic_matches_oracle(self, rng):
        x = rng.uniform(-np.pi, np.pi, (19, 6)).astype(np.float32)
        out = np.asarray(pairwise_dist_periodic(jnp.asarray(x), 2 * np.pi))
        expected = ref.pairwise_dist_periodic_np(x.astype(np.float64), 2 * np.pi)
        np.testing.assert_allclose(out, expected, atol=1e-5)

    def test_periodic_grad_finite(self):
        x = jnp.asarray(np.array([[0.1], [0.1], [2.0]], np.float32))

        def loss(pts):
            return jnp.sum(pairwise_dist_periodic(pts, 2 * np.pi))

        g = jax.grad(loss)(x)
        assert np.all(np.isfinite(np.asarray(g)))


class TestSigmoid:
    @pytest.mark.parametrize("params", [(4.5, 12, 6), (1, 2, 6), (7.0, 3, 2)])
    def test_matches_formula(self, params, rng):
        r = rng.uniform(0.01, 10, 100).astype(np.float32)
        out = np.asarray(sigmoid(*params)(jnp.asarray(r)))
        np.testing.assert_allclose(
            out, ref.sigmoid_np(r.astype(np.float64), *params),
            rtol=1e-4, atol=1e-6,
        )

    def test_limits(self):
        f = sigmoid(4.5, 12, 6)
        assert float(f(jnp.asarray(0.0))) == pytest.approx(0.0, abs=1e-7)
        assert float(f(jnp.asarray(1e6))) == pytest.approx(1.0, abs=1e-5)


class TestPeriodicInfHighDim:
    def test_inf_periodicity_high_dim_no_nan(self, rng):
        """pairwise_dist_periodic(inf) must stay finite for d >= 16 (the
        min-image decomposition would produce inf * 0 = NaN; inf routes to
        the elementwise fallback)."""
        from encodermap_tpu.ops.distances import (
            pairwise_dist,
            pairwise_dist_periodic,
        )
        import jax.numpy as jnp

        x = jnp.asarray(rng.standard_normal((8, 32)), jnp.float32)
        d = pairwise_dist_periodic(x, float("inf"))
        assert np.isfinite(np.asarray(d)).all()
        np.testing.assert_allclose(
            np.asarray(d), np.asarray(pairwise_dist(x)[0]) + 1e-12,
            atol=1e-5,
        )
