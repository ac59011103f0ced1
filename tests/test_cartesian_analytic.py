# tests/test_cartesian_analytic.py
"""The analytic-VJP cartesian-cost path (``ops.cartesian_analytic``, the
round-4 production route for >= 320 selected atoms) must agree with the
dense-matrix losses it replaces — values AND gradients, every cost variant
— and its hand-written backward must match an f64 finite-difference oracle
(the round-3 kernel-gradient rule: never validate a hand gradient only
against XLA's own f32 autodiff)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from encodermap_tpu import ADCParameters
from encodermap_tpu import losses as L
from encodermap_tpu.ops.cartesian_analytic import (
    cartesian_cost_analytic,
    input_row_gram,
)
from encodermap_tpu.ops.distances import pairwise_dist

VARIANTS = ["mean_abs", "mean_square", "mean_norm"]


def make_coords(B=8, n=70, seed=0):
    rng = np.random.default_rng(seed)
    inp = rng.uniform(0.0, 4.0, (B, n, 3)).astype(np.float32)
    out = (inp + rng.normal(0, 0.15, (B, n, 3))).astype(np.float32)
    latent = rng.normal(0, 1.0, (B, 2)).astype(np.float32)
    return jnp.asarray(inp), jnp.asarray(out), jnp.asarray(latent)


@pytest.mark.parametrize("variant", VARIANTS)
def test_cost_matches_dense_reduction(variant):
    inp, out, _ = make_coords()
    acc = cartesian_cost_analytic(out, inp, variant)
    diff = pairwise_dist(inp) - pairwise_dist(out)
    if variant == "mean_abs":
        ref = jnp.sum(jnp.abs(diff))
    elif variant == "mean_square":
        ref = jnp.sum(jnp.square(diff))
    else:
        ref = jnp.sum(jnp.square(diff), axis=(1, 2))
    np.testing.assert_allclose(np.asarray(acc), np.asarray(ref), rtol=2e-5)


def test_gram_matches_dense_rows():
    inp, _, _ = make_coords()
    rows = pairwise_dist(inp).reshape(inp.shape[0], -1)
    ref = rows @ rows.T
    np.testing.assert_allclose(
        np.asarray(input_row_gram(inp)), np.asarray(ref), rtol=2e-5
    )


@pytest.mark.parametrize("variant", VARIANTS)
def test_losses_analytic_values_and_grads(variant):
    """cartesian_losses_analytic == (cartesian_loss_matrix,
    cartesian_distance_loss_matrix), incl. gradients to the backmapped
    coordinates and the latent."""
    inp, out, latent = make_coords()
    p = ADCParameters(cartesian_cost_variant=variant)

    def analytic(out_xyz, lat):
        c, d = L.cartesian_losses_analytic(inp, out_xyz, lat, p, scale=0.7)
        return c + d

    def dense(out_xyz, lat):
        inp_mat = pairwise_dist(inp)
        out_mat = pairwise_dist(out_xyz)
        return (
            L.cartesian_loss_matrix(inp_mat, out_mat, p, scale=0.7)
            + L.cartesian_distance_loss_matrix(inp_mat, lat, p)
        )

    va, ga = jax.value_and_grad(analytic, argnums=(0, 1))(out, latent)
    vd, gd = jax.value_and_grad(dense, argnums=(0, 1))(out, latent)
    np.testing.assert_allclose(float(va), float(vd), rtol=2e-5)
    for a, d in zip(ga, gd):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(d), rtol=5e-4, atol=1e-6
        )


@pytest.mark.parametrize("variant", VARIANTS)
def test_backward_matches_f64_finite_differences(variant):
    """The hand-written VJP vs central differences of an independent f64
    numpy implementation — a true oracle, not XLA autodiff."""
    B, n = 2, 8
    rng = np.random.default_rng(7)
    inp64 = rng.uniform(0.0, 4.0, (B, n, 3))
    out64 = inp64 + rng.normal(0, 0.2, (B, n, 3))

    def np_loss(out):
        def dmat(x):
            d = np.sqrt(
                ((x[:, :, None, :] - x[:, None, :, :]) ** 2).sum(-1)
            )
            return d

        diff = dmat(inp64) - dmat(out)
        if variant == "mean_abs":
            return np.abs(diff).sum()
        if variant == "mean_square":
            return (diff**2).sum()
        # mean_norm: downstream take per-sample sums; use a fixed
        # cotangent vector to exercise the per-sample backward
        return ((diff**2).sum(axis=(1, 2)) * np.array([1.0, 0.5])).sum()

    h = 1e-6
    fd = np.zeros_like(out64)
    for idx in np.ndindex(out64.shape):
        e = np.zeros_like(out64)
        e[idx] = h
        fd[idx] = (np_loss(out64 + e) - np_loss(out64 - e)) / (2 * h)

    def jax_loss(out_xyz):
        acc = cartesian_cost_analytic(
            out_xyz, jnp.asarray(inp64, jnp.float32), variant
        )
        if variant == "mean_norm":
            return jnp.sum(acc * jnp.asarray([1.0, 0.5]))
        return acc

    got = np.asarray(
        jax.grad(jax_loss)(jnp.asarray(out64, jnp.float32)), np.float64
    )
    scale = np.abs(fd).max()
    assert np.abs(got - fd).max() / scale < 1e-3


def test_coincident_atoms_zero_gradient():
    """d_out == 0 off-diagonal entries take the 0-subgradient convention
    (same as _sqrt_guard) instead of dividing by zero."""
    inp, out, _ = make_coords(n=12)
    out = out.at[:, 3].set(out[:, 5])  # two coincident output atoms

    def f(o):
        return cartesian_cost_analytic(o, inp, "mean_abs")

    g = np.asarray(jax.grad(f)(out))
    assert np.isfinite(g).all()


def test_no_sigmoid_scale_skips_gram():
    inp, out, latent = make_coords()
    p = ADCParameters(cartesian_distance_cost_scale=None)
    cart, cdist = L.cartesian_losses_analytic(inp, out, latent, p, scale=1.0)
    assert float(cdist) == 0.0
    inp_mat = pairwise_dist(inp)
    out_mat = pairwise_dist(out)
    ref = L.cartesian_loss_matrix(inp_mat, out_mat, p, scale=1.0)
    np.testing.assert_allclose(float(cart), float(ref), rtol=2e-5)


class TestEndToEndRouting:
    """The ADC loss assembly produces the same terms whichever side of the
    MIN_ANALYTIC_ATOMS threshold the protein lands on."""

    def _emap(self, n_res=24, F=48):
        import encodermap_tpu as em
        from encodermap_tpu.train.adc_autoencoder import (
            AngleDihedralCartesianEncoderMap,
        )
        from tests.reference_impl import backmap_np

        rng = np.random.default_rng(3)
        n_atoms = 3 * n_res
        angles = rng.uniform(1.6, 2.4, (F, n_atoms - 2)).astype(np.float32)
        dihedrals = rng.uniform(-np.pi, np.pi, (F, n_atoms - 3)).astype(
            np.float32)
        distances = rng.uniform(0.13, 0.155, (F, n_atoms - 1)).astype(
            np.float32)
        cart = backmap_np(distances, angles, dihedrals).astype(np.float32)
        cvs = dict(
            central_angles=angles, central_dihedrals=dihedrals,
            central_cartesians=cart, central_distances=distances,
            side_dihedrals=rng.uniform(
                -np.pi, np.pi, (F, 2 * n_res)).astype(np.float32),
        )
        p = em.ADCParameters(
            batch_size=16, use_backbone_angles=True, use_sidechains=True,
            n_neurons=[16, 16, 2], seed=11,
            cartesian_cost_scale_soft_start=(0, 4),
        )
        emap = AngleDihedralCartesianEncoderMap(cvs, p, read_only=True)
        order = ("central_angles", "central_dihedrals", "central_cartesians",
                 "central_distances", "side_dihedrals")
        batch = tuple(jnp.asarray(cvs[k][:16]) for k in order)
        return emap, batch

    def test_loss_terms_agree_across_threshold(self, monkeypatch):
        emap, batch = self._emap()
        step = jnp.asarray(2, jnp.int32)
        dense = {k: float(v) for k, v in
                 emap._loss_terms(emap.state.params, batch, step).items()}
        # n_res=24 -> 24 CAs < 320: force the analytic route
        monkeypatch.setattr(
            "encodermap_tpu.train.adc_autoencoder.MIN_ANALYTIC_ATOMS", 1
        )
        analytic = {k: float(v) for k, v in
                    emap._loss_terms(emap.state.params, batch, step).items()}
        assert set(dense) == set(analytic)
        for k in dense:
            # the <64-CA flat-pair sigmoid and the gram-derived sigmoid are
            # the same loss through different formulas — looser tolerance
            tol = 1e-4 if k == "cartesian_distance_loss" else 2e-5
            assert dense[k] == pytest.approx(analytic[k], rel=tol, abs=1e-7), k

    def test_train_step_grads_agree_across_threshold(self, monkeypatch):
        emap, batch = self._emap()
        state = emap.state
        step_fn = emap._make_train_step()
        s_dense, m_dense = jax.jit(step_fn)(state, batch)
        monkeypatch.setattr(
            "encodermap_tpu.train.adc_autoencoder.MIN_ANALYTIC_ATOMS", 1
        )
        step_fn2 = emap._make_train_step()
        s_ana, m_ana = jax.jit(step_fn2)(state, batch)
        assert float(m_dense["loss"]) == pytest.approx(
            float(m_ana["loss"]), rel=1e-4)
        for a, b in zip(
            jax.tree_util.tree_leaves(s_dense.params),
            jax.tree_util.tree_leaves(s_ana.params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-3, atol=2e-5
            )

    def test_routing_order(self):
        """blocked (memory fallback) shadows analytic shadows dense."""
        from encodermap_tpu.ops.blocked_cartesian import MIN_BLOCKED_ATOMS
        from encodermap_tpu.ops.cartesian_analytic import MIN_ANALYTIC_ATOMS

        assert MIN_ANALYTIC_ATOMS < MIN_BLOCKED_ATOMS
