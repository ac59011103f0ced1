# tests/test_pallas_sigmoid.py
"""Fused Pallas sigmoid loss vs the XLA reference path.

On the CPU test platform the kernel runs in interpreter mode — slow but
exact, validating forward values and the custom-VJP latent gradient."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from encodermap_tpu.ops import pallas_sigmoid as ps
from encodermap_tpu.ops.distances import (
    pairwise_dist,
    pairwise_dist_periodic,
    sigmoid,
)

PARAMS = (4.5, 12, 6, 1, 2, 6)


def _reference_loss(h, l, params, periodicity):
    sig_h, a_h, b_h, sig_l, a_l, b_l = params
    if periodicity == float("inf"):
        dist_h = pairwise_dist(h)
    else:
        dist_h = pairwise_dist_periodic(h, periodicity)
    dist_l = pairwise_dist(l)
    return jnp.mean(
        jnp.square(sigmoid(sig_h, a_h, b_h)(dist_h) -
                   sigmoid(sig_l, a_l, b_l)(dist_l))
    )


def _interp_fwd(h, l, params, periodicity):
    """Run the kernel math (same tile functions) without pallas_call."""
    d_h = ps._dist_h_tile(h, h, periodicity)
    d_l, _ = ps._dist_l_tile(l, l)
    s_h = ps._sig(d_h, *params[:3])
    s_l = ps._sig(d_l, *params[3:])
    return jnp.mean((s_h - s_l) ** 2)


class TestKernelMath:
    @pytest.mark.parametrize("periodicity", [float("inf"), 2 * np.pi])
    def test_tile_math_matches_reference(self, rng, periodicity):
        h = jnp.asarray(rng.uniform(-3, 3, (64, 10)).astype(np.float32))
        l = jnp.asarray(rng.standard_normal((64, 2)).astype(np.float32))
        ref = float(_reference_loss(h, l, PARAMS, periodicity))
        out = float(_interp_fwd(h, l, PARAMS, periodicity))
        assert out == pytest.approx(ref, abs=1e-6)

    def test_bwd_matches_autodiff(self, rng):
        """The hand-derived latent gradient must equal jax.grad of the
        reference loss."""
        h = jnp.asarray(rng.uniform(-3, 3, (48, 8)).astype(np.float32))
        l = jnp.asarray(rng.standard_normal((48, 2)).astype(np.float32))

        ref_grad = jax.grad(
            lambda ll: _reference_loss(h, ll, PARAMS, 2 * np.pi)
        )(l)

        # run the backward kernel math directly
        d_h = ps._dist_h_tile(h, h, 2 * np.pi)
        d_l, zero_mask = ps._dist_l_tile(l, l)
        s_h = ps._sig(d_h, *PARAMS[:3])
        s_l = ps._sig(d_l, *PARAMS[3:])
        sp_l = ps._sig_prime(d_l, *PARAMS[3:])
        n = h.shape[0]
        d_l_safe = jnp.where(d_l == 0.0, 1.0, d_l)
        f = (s_l - s_h) * sp_l / d_l_safe * (1.0 - zero_mask)
        f = f * (4.0 / (n * n))
        row = jnp.sum(f, axis=1, keepdims=True)
        grad = row * l - f @ l

        np.testing.assert_allclose(
            np.asarray(grad), np.asarray(ref_grad), atol=2e-6
        )

    def test_sig_prime_matches_autodiff(self, rng):
        r = jnp.asarray(rng.uniform(0.05, 8.0, (50,)).astype(np.float32))
        auto = jax.vmap(jax.grad(lambda x: ps._sig(x, 1.0, 2.0, 6.0)))(r)
        manual = ps._sig_prime(r, 1.0, 2.0, 6.0)
        np.testing.assert_allclose(
            np.asarray(manual), np.asarray(auto), rtol=2e-4, atol=1e-6
        )


class TestRouting:
    def test_small_batch_uses_reference(self, rng):
        """fused_or_reference at small batch equals the losses-module value
        (parity path preserved)."""
        h = jnp.asarray(rng.uniform(-np.pi, np.pi, (32, 6)).astype(np.float32))
        l = jnp.asarray(rng.standard_normal((32, 2)).astype(np.float32))
        out = float(ps.fused_or_reference(h, l, PARAMS, 2 * np.pi))
        ref = float(_reference_loss(h, l, PARAMS, 2 * np.pi))
        assert out == pytest.approx(ref, abs=1e-7)


class TestRealKernelInterpreted:
    """Execute the ACTUAL pallas kernel (Gram-identity distances, SMEM
    accumulation, grid plumbing) in interpret mode on CPU — previously only
    plain-JAX mirror helpers were tested and a kernel regression would
    first fire in production at B>=16384 on the TPU."""

    def _data(self, B=512, seed=0):
        rng = np.random.default_rng(seed)
        h = jnp.asarray(rng.normal(size=(B, 30)).astype(np.float32))
        l = jnp.asarray(rng.normal(size=(B, 2)).astype(np.float32))
        return h, l

    @pytest.fixture(autouse=True)
    def _interpret(self, monkeypatch):
        from encodermap_tpu.ops import pallas_sigmoid as ps

        monkeypatch.setattr(ps, "_INTERPRET", True)

    @pytest.mark.parametrize("periodicity", [float("inf"), 2 * np.pi])
    def test_forward_matches_xla(self, periodicity):
        from encodermap_tpu import losses as L
        from encodermap_tpu.ops import pallas_sigmoid as ps

        h, l = self._data()
        params = (5.9, 12.0, 4.0, 1.0, 2.0, 4.0)
        val = float(ps.fused_sigmoid_loss(h, l, params, periodicity))
        ref = float(L.sigmoid_loss(h, l, params, periodicity))
        assert abs(val - ref) / abs(ref) < 1e-5

    def test_backward_matches_xla(self):
        from encodermap_tpu import losses as L
        from encodermap_tpu.ops import pallas_sigmoid as ps

        h, l = self._data()
        params = (5.9, 12.0, 4.0, 1.0, 2.0, 4.0)
        g1 = jax.grad(
            lambda x: ps.fused_sigmoid_loss(h, x, params, float("inf"))
        )(l)
        g2 = jax.grad(
            lambda x: L.sigmoid_loss(h, x, params, float("inf"))
        )(l)
        rel = float(jnp.max(jnp.abs(g1 - g2)) / jnp.max(jnp.abs(g2)))
        assert rel < 1e-4

    def test_duplicate_points_zero_masked(self):
        from encodermap_tpu.ops import pallas_sigmoid as ps

        h, l = self._data()
        l = l.at[1].set(l[0])  # duplicate latent point: d=0 pair
        h = h.at[1].set(h[0])
        params = (5.9, 12.0, 4.0, 1.0, 2.0, 4.0)
        val = ps.fused_sigmoid_loss(h, l, params, float("inf"))
        g = jax.grad(
            lambda x: ps.fused_sigmoid_loss(h, x, params, float("inf"))
        )(l)
        assert np.isfinite(float(val))
        assert np.isfinite(np.asarray(g)).all()

    def test_nonuniform_a_b_gradients(self):
        """The wave-5 fused-kernel bug class: a != 2 sigmoid exponents."""
        from encodermap_tpu import losses as L
        from encodermap_tpu.ops import pallas_sigmoid as ps

        h, l = self._data()
        params = (4.5, 6.0, 10.0, 1.0, 3.0, 7.0)
        g1 = jax.grad(
            lambda x: ps.fused_sigmoid_loss(h, x, params, float("inf"))
        )(l)
        g2 = jax.grad(
            lambda x: L.sigmoid_loss(h, x, params, float("inf"))
        )(l)
        rel = float(jnp.max(jnp.abs(g1 - g2)) / jnp.max(jnp.abs(g2)))
        assert rel < 1e-4
