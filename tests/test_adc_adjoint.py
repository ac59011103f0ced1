# tests/test_adc_adjoint.py
"""The hand-derived ADC train-step adjoint: analytic gradients vs autodiff
(machine precision) and value parity with the production loss assembly."""

import numpy as np


import jax
import jax.numpy as jnp

from encodermap_tpu.ops import adc_adjoint as PTA


def _problem(rng, n_res=8, B=8, dtype=jnp.float32, hidden=32):
    n_atoms = 3 * n_res
    nA, nD, nS, nDist = n_atoms - 2, n_atoms - 3, 2 * n_res, n_atoms - 1
    iu = np.triu_indices(n_res, k=1)
    hyper = dict(
        periodicity=2 * np.pi,
        dihedral_cost_scale=1.0, dihedral_cost_reference=1.0,
        angle_cost_scale=0.3, angle_cost_reference=1.0,
        side_dihedral_cost_scale=0.5, side_dihedral_cost_reference=1.0,
        cartesian_cost_scale=1.0, cartesian_cost_reference=1.0,
        soft_start=(2, 10), cartesian_distance_cost_scale=1.0,
        cartesian_dist_sig_parameters=(4.5, 12, 6, 1, 2, 6),
        distance_cost_scale=None, dist_sig_parameters=(4.5, 12, 6, 1, 2, 6),
        center_cost_scale=1e-4, l2_reg_constant=1e-3,
        ca_start=1, ca_step=3, pair_iu=iu, learning_rate=1e-3,
    )
    in_dim = 2 * (nA + nD + nS)
    dims = [in_dim, hidden, hidden, 2]
    enc_w = [jnp.asarray(rng.standard_normal((a, b)) * 0.2, dtype)
             for a, b in zip(dims[:-1], dims[1:])]
    enc_b = [jnp.asarray(rng.standard_normal(b) * 0.05, dtype)
             for b in dims[1:]]
    dd = dims[::-1]
    dec_w = [jnp.asarray(rng.standard_normal((a, b)) * 0.2, dtype)
             for a, b in zip(dd[:-1], dd[1:])]
    dec_b = [jnp.asarray(rng.standard_normal(b) * 0.05, dtype)
             for b in dd[1:]]
    data = dict(
        angles=jnp.asarray(rng.uniform(1.6, 2.4, (B, nA)), dtype),
        dihedrals=jnp.asarray(rng.uniform(-np.pi, np.pi, (B, nD)), dtype),
        side=jnp.asarray(rng.uniform(-np.pi, np.pi, (B, nS)), dtype),
        distances=jnp.asarray(rng.uniform(1.3, 1.55, (B, nDist)), dtype),
        ca=jnp.asarray(rng.uniform(0, 3, (B, n_res, 3)), dtype),
    )
    return (enc_w, enc_b, dec_w, dec_b), data, hyper, n_atoms, nD


class TestHandADCStep:
    def test_grads_match_autodiff_f64(self, rng):
        with jax.enable_x64(True):
            net, d, hyper, _, _ = _problem(rng, dtype=jnp.float64)
            enc_w, enc_b, dec_w, dec_b = net
            step = jnp.asarray(5.0)

            def total(flat):
                n = len(enc_w)
                return PTA.hand_adc_step(
                    flat[:n], flat[2 * n:3 * n], flat[n:2 * n], flat[3 * n:],
                    d["angles"], d["dihedrals"], d["ca"], d["distances"],
                    d["side"], step, hyper=hyper,
                )[4]["loss"]

            flat = list(enc_w) + list(dec_w) + list(enc_b) + list(dec_b)
            g_ad = jax.grad(total)(flat)
            gew, geb, gdw, gdb, _ = PTA.hand_adc_step(
                enc_w, enc_b, dec_w, dec_b, d["angles"], d["dihedrals"],
                d["ca"], d["distances"], d["side"], step, hyper=hyper,
            )
            g_hand = list(gew) + list(gdw) + list(geb) + list(gdb)
            for a, b in zip(g_ad, g_hand):
                np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-11)

    def test_values_match_production_losses(self, rng):
        """Every metric equals the production _loss_terms assembly."""
        import encodermap_tpu as em
        from encodermap_tpu.train.adc_autoencoder import (
            AngleDihedralCartesianEncoderMap,
        )
        from tests.reference_impl import backmap_np

        n_res, B = 8, 16
        n_atoms = 3 * n_res
        angles = rng.uniform(1.6, 2.4, (64, n_atoms - 2)).astype(np.float32)
        dihedrals = rng.uniform(-np.pi, np.pi, (64, n_atoms - 3)).astype(
            np.float32)
        distances = rng.uniform(0.13, 0.155, (64, n_atoms - 1)).astype(
            np.float32)
        cart = backmap_np(distances, angles, dihedrals).astype(np.float32)
        sided = rng.uniform(-np.pi, np.pi, (64, 2 * n_res)).astype(np.float32)
        cvs = dict(central_angles=angles, central_dihedrals=dihedrals,
                   central_cartesians=cart, central_distances=distances,
                   side_dihedrals=sided)
        # the oracle hardcodes the CA slice (ca_start=1, ca_step=3) — set
        # the same explicitly (default None now means ALL atoms, as in the
        # reference)
        # distance_cost_scale=1.0 validates the oracle's (periodic)
        # sketch-map distance leg too — it defaults to None in ADC
        p = em.ADCParameters(batch_size=B, use_backbone_angles=True,
                             use_sidechains=True, seed=0,
                             n_neurons=[16, 16, 2],
                             cartesian_pwd_start=1, cartesian_pwd_step=3,
                             distance_cost_scale=1.0,
                             cartesian_cost_scale_soft_start=(2, 10))
        emap = AngleDihedralCartesianEncoderMap(cvs, p, read_only=True)
        batch = tuple(jnp.asarray(a[:B]) for a in emap.train_data)
        terms = emap._loss_terms(emap.state.params, batch,
                                 jnp.asarray(5, jnp.int32))

        params = emap.state.params
        iu = np.triu_indices(n_res, k=1)
        hyper = dict(
            periodicity=p.periodicity,
            dihedral_cost_scale=p.dihedral_cost_scale,
            dihedral_cost_reference=p.dihedral_cost_reference,
            angle_cost_scale=p.angle_cost_scale or 0.0,
            angle_cost_reference=p.angle_cost_reference,
            side_dihedral_cost_scale=p.side_dihedral_cost_scale,
            side_dihedral_cost_reference=p.side_dihedral_cost_reference,
            cartesian_cost_scale=p.cartesian_cost_scale,
            cartesian_cost_reference=p.cartesian_cost_reference,
            soft_start=p.cartesian_cost_scale_soft_start,
            cartesian_distance_cost_scale=p.cartesian_distance_cost_scale,
            cartesian_dist_sig_parameters=p.cartesian_dist_sig_parameters,
            distance_cost_scale=p.distance_cost_scale,
            dist_sig_parameters=p.dist_sig_parameters,
            center_cost_scale=p.center_cost_scale,
            l2_reg_constant=p.l2_reg_constant,
            ca_start=1, ca_step=3, pair_iu=iu,
        )
        *_, metrics = PTA.hand_adc_step(
            [l["kernel"] for l in params["encoder"]],
            [l["bias"] for l in params["encoder"]],
            [l["kernel"] for l in params["decoder"]],
            [l["bias"] for l in params["decoder"]],
            batch[0], batch[1], batch[2][:, 1::3, :], batch[3], batch[4],
            jnp.asarray(5.0), hyper=hyper,
        )
        for k, v in terms.items():
            if k in metrics:
                np.testing.assert_allclose(
                    float(metrics[k]), float(v), rtol=1e-4, atol=1e-7,
                    err_msg=k,
                )
