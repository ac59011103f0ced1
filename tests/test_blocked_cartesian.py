# tests/test_blocked_cartesian.py
"""The blocked (never-materialize-(B,n,n)) cartesian-cost path must agree
with the dense-matrix losses it replaces past
``ops.blocked_cartesian.MIN_BLOCKED_ATOMS`` — values AND gradients, every
cost variant, padded and unpadded block splits, and end-to-end through the
ADC loss assembly (monkeypatching the threshold so small fixtures route
through the blocked code)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from encodermap_tpu import ADCParameters
from encodermap_tpu import losses as L
from encodermap_tpu.ops.blocked_cartesian import (
    blocked_cartesian_terms,
    sigmoid_from_gram,
)
from encodermap_tpu.ops.distances import pairwise_dist


def make_coords(B=8, n=70, seed=0):
    rng = np.random.default_rng(seed)
    inp = rng.uniform(0.0, 4.0, (B, n, 3)).astype(np.float32)
    out = (inp + rng.normal(0, 0.15, (B, n, 3))).astype(np.float32)
    latent = rng.normal(0, 1.0, (B, 2)).astype(np.float32)
    return jnp.asarray(inp), jnp.asarray(out), jnp.asarray(latent)


@pytest.mark.parametrize("variant", ["mean_abs", "mean_square", "mean_norm"])
@pytest.mark.parametrize("n,block", [(64, 32), (70, 32), (70, 128)])
def test_acc_matches_dense_reduction(variant, n, block):
    """The scan's accumulator equals the dense full-matrix reduction."""
    inp, out, _ = make_coords(n=n)
    acc, _ = blocked_cartesian_terms(
        inp, out, variant=variant, block=block, with_gram=False
    )
    d_in = pairwise_dist(inp)
    d_out = pairwise_dist(out)
    diff = d_in - d_out
    if variant == "mean_abs":
        ref = jnp.sum(jnp.abs(diff))
    elif variant == "mean_square":
        ref = jnp.sum(jnp.square(diff))
    else:
        ref = jnp.sum(jnp.square(diff), axis=(1, 2))
    np.testing.assert_allclose(np.asarray(acc), np.asarray(ref), rtol=2e-5)


def test_gram_matches_dense_rows():
    inp, out, _ = make_coords(n=70)
    _, gram = blocked_cartesian_terms(inp, out, block=32)
    rows = pairwise_dist(inp).reshape(inp.shape[0], -1)
    ref = rows @ rows.T
    np.testing.assert_allclose(np.asarray(gram), np.asarray(ref), rtol=2e-5)


@pytest.mark.parametrize("variant", ["mean_abs", "mean_square", "mean_norm"])
def test_losses_blocked_values_and_grads(variant):
    """cartesian_losses_blocked == (cartesian_loss_matrix,
    cartesian_distance_loss_matrix), including gradients to the backmapped
    coordinates and the latent."""
    inp, out, latent = make_coords(n=70)
    p = ADCParameters(cartesian_cost_variant=variant)

    def blocked(out_xyz, lat):
        c, d = L.cartesian_losses_blocked(inp, out_xyz, lat, p, scale=0.7,
                                          block=32)
        return c + d

    def dense(out_xyz, lat):
        inp_mat = pairwise_dist(inp)
        out_mat = pairwise_dist(out_xyz)
        return (
            L.cartesian_loss_matrix(inp_mat, out_mat, p, scale=0.7)
            + L.cartesian_distance_loss_matrix(inp_mat, lat, p)
        )

    vb, gb = jax.value_and_grad(blocked, argnums=(0, 1))(out, latent)
    vd, gd = jax.value_and_grad(dense, argnums=(0, 1))(out, latent)
    np.testing.assert_allclose(float(vb), float(vd), rtol=2e-5)
    for b, d in zip(gb, gd):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(d), rtol=5e-4, atol=1e-6
        )


def test_sigmoid_from_gram_matches_matrix_loss():
    inp, _, latent = make_coords(n=70)
    p = ADCParameters()
    inp_mat = pairwise_dist(inp)
    ref = L.cartesian_distance_loss_matrix(inp_mat, latent, p)
    rows = inp_mat.reshape(inp.shape[0], -1)
    gram = rows @ rows.T
    from math import sqrt

    sig_h, a_h, b_h, sig_l, a_l, b_l = p.cartesian_dist_sig_parameters
    got = sigmoid_from_gram(
        gram, latent, (sig_h * sqrt(2.0), a_h, b_h, sig_l, a_l, b_l)
    ) * p.cartesian_distance_cost_scale
    np.testing.assert_allclose(float(got), float(ref), rtol=2e-5)


def test_no_sigmoid_scale_skips_gram():
    inp, out, latent = make_coords(n=70)
    p = ADCParameters(cartesian_distance_cost_scale=None)
    cart, cdist = L.cartesian_losses_blocked(inp, out, latent, p, scale=1.0)
    assert float(cdist) == 0.0
    inp_mat = pairwise_dist(inp)
    out_mat = pairwise_dist(out)
    ref = L.cartesian_loss_matrix(inp_mat, out_mat, p, scale=1.0)
    np.testing.assert_allclose(float(cart), float(ref), rtol=2e-5)


class TestEndToEndRouting:
    """The ADC loss assembly produces the same terms whichever side of the
    MIN_BLOCKED_ATOMS threshold the protein lands on."""

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
        # n_res=24 -> 24 CAs < 320: force the blocked route
        monkeypatch.setattr(
            "encodermap_tpu.train.adc_autoencoder.MIN_BLOCKED_ATOMS", 1
        )
        blocked = {k: float(v) for k, v in
                   emap._loss_terms(emap.state.params, batch, step).items()}
        assert set(dense) == set(blocked)
        for k in dense:
            # the <64-CA flat-pair sigmoid and the gram-derived sigmoid are
            # the same loss through different formulas — looser tolerance
            tol = 1e-4 if k == "cartesian_distance_loss" else 2e-5
            assert dense[k] == pytest.approx(blocked[k], rel=tol, abs=1e-7), k

    def test_train_step_grads_agree_across_threshold(self, monkeypatch):
        emap, batch = self._emap()
        state = emap.state
        step_fn = emap._make_train_step()
        s_dense, m_dense = jax.jit(step_fn)(state, batch)
        monkeypatch.setattr(
            "encodermap_tpu.train.adc_autoencoder.MIN_BLOCKED_ATOMS", 1
        )
        step_fn2 = emap._make_train_step()
        s_blk, m_blk = jax.jit(step_fn2)(state, batch)
        assert float(m_dense["loss"]) == pytest.approx(
            float(m_blk["loss"]), rel=1e-4)
        for a, b in zip(
            jax.tree_util.tree_leaves(s_dense.params),
            jax.tree_util.tree_leaves(s_blk.params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-3, atol=2e-5
            )
