# tests/test_backmap.py
"""Backmapping kernels vs the sequential float64 oracle.

Mirrors the reference's ``tests/test_dihedral_to_cartesian.py`` and the
random-shape split parity of ``tests/test_backmapping_em1_em2.py:2116``.
The parallel associative-scan formulation must agree with the sequential
rotation loop; additionally the *internal coordinates* of the generated
geometry must equal the requested dihedrals/angles/lengths.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from encodermap_tpu.ops.backmap import (
    backmap,
    chain_in_plane,
    dihedral_to_cartesian_one_way,
    dihedrals_to_cartesian,
    guess_amide_H,
    guess_amide_O,
    merge_cartesians,
    split_and_reverse_cartesians,
    split_and_reverse_dihedrals,
)
from tests import reference_impl as ref


def _random_chain(rng, batch, n_atoms):
    lengths = rng.uniform(0.1, 0.2, (batch, n_atoms - 1))
    angles = rng.uniform(0.5, np.pi - 0.5, (batch, n_atoms - 2))
    return lengths, angles


class TestChainInPlane:
    @pytest.mark.parametrize("n_atoms", [4, 9, 12, 31])
    def test_matches_sequential(self, rng, n_atoms):
        lengths, angles = _random_chain(rng, 3, n_atoms)
        out = np.asarray(
            chain_in_plane(jnp.asarray(lengths, jnp.float32), jnp.asarray(angles, jnp.float32))
        )
        expected = ref.chain_in_plane_np(lengths, angles)
        np.testing.assert_allclose(out, expected, atol=5e-6)

    def test_bond_lengths_and_angles_realized(self, rng):
        """The generated chain must have the requested internal coordinates."""
        lengths, angles = _random_chain(rng, 2, 15)
        out = np.asarray(
            chain_in_plane(jnp.asarray(lengths, jnp.float32), jnp.asarray(angles, jnp.float32))
        ).astype(np.float64)
        got_lengths = np.linalg.norm(np.diff(out, axis=1), axis=-1)
        np.testing.assert_allclose(got_lengths, lengths, atol=1e-5)
        got_angles = ref.angle_from_xyz_np(out[:, :-2], out[:, 1:-1], out[:, 2:])
        np.testing.assert_allclose(got_angles, angles, atol=1e-4)

    def test_broadcast_mean_lengths(self, rng):
        """(1, n_bonds) lengths broadcast over the batch like the reference's
        batch-mean distances."""
        lengths, angles = _random_chain(rng, 4, 10)
        out = np.asarray(
            chain_in_plane(
                jnp.asarray(lengths[:1], jnp.float32), jnp.asarray(angles, jnp.float32)
            )
        )
        assert out.shape == (4, 10, 3)


class TestSplits:
    @pytest.mark.parametrize("n", [4, 5, 6, 9, 453])
    def test_dihedral_split_parity(self, rng, n):
        x = rng.standard_normal((2, n))
        l_j, r_j = split_and_reverse_dihedrals(jnp.asarray(x))
        l_n, r_n = ref.split_and_reverse_dihedrals_np(x)
        np.testing.assert_allclose(np.asarray(l_j), l_n)
        np.testing.assert_allclose(np.asarray(r_j), r_n)

    @pytest.mark.parametrize("n", [7, 8, 9, 456])
    def test_cartesian_split_shares_three_atoms(self, rng, n):
        x = rng.standard_normal((2, n, 3))
        left, right = split_and_reverse_cartesians(jnp.asarray(x))
        left, right = np.asarray(left), np.asarray(right)
        np.testing.assert_allclose(left[:, 0], right[:, 2])
        np.testing.assert_allclose(left[:, 1], right[:, 1])
        np.testing.assert_allclose(left[:, 2], right[:, 0])


class TestDihedralChain:
    @pytest.mark.parametrize("n_di", [1, 2, 5, 20])
    def test_one_way_matches_sequential(self, rng, n_di):
        n_atoms = n_di + 3
        lengths, angles = _random_chain(rng, 2, n_atoms)
        cart = ref.chain_in_plane_np(lengths, angles).astype(np.float32)
        di = rng.uniform(-np.pi, np.pi, (2, n_di)).astype(np.float32)
        out = np.asarray(dihedral_to_cartesian_one_way(jnp.asarray(di), jnp.asarray(cart)))
        expected = ref.dihedral_one_way_np(di, cart)
        np.testing.assert_allclose(out, expected, atol=5e-5)

    @pytest.mark.parametrize("n_atoms", [9, 12, 13])
    def test_both_ways_matches_sequential(self, rng, n_atoms):
        lengths, angles = _random_chain(rng, 2, n_atoms)
        cart = ref.chain_in_plane_np(lengths, angles).astype(np.float32)
        di = rng.uniform(-np.pi, np.pi, (2, n_atoms - 3)).astype(np.float32)
        out = np.asarray(dihedrals_to_cartesian(jnp.asarray(di), jnp.asarray(cart)))
        expected = ref.dihedrals_to_cartesian_np(di, cart)
        np.testing.assert_allclose(out, expected, atol=1e-4)

    def test_long_chain_diubi_size(self, rng):
        """456-atom (diUbi-sized) chain: f32 scan must stay close to the f64
        sequential oracle (it is in fact *more* accurate than a sequential
        f32 loop)."""
        n_atoms = 456
        lengths, angles = _random_chain(rng, 2, n_atoms)
        cart = ref.chain_in_plane_np(lengths, angles).astype(np.float32)
        di = rng.uniform(-np.pi, np.pi, (2, n_atoms - 3)).astype(np.float32)
        out = np.asarray(dihedrals_to_cartesian(jnp.asarray(di), jnp.asarray(cart)))
        expected = ref.dihedrals_to_cartesian_np(di, cart)
        np.testing.assert_allclose(out, expected, atol=5e-4)

    def test_extreme_chain_1000_residues(self, rng):
        """3000-atom chain (1000 residues — far beyond any reference use
        case): the rotation-only quaternion scan + bond cumsum must stay
        accurate where a naive affine-composition scan catastrophically
        cancels in f32 (ops/backmap.py docstring derivation)."""
        n_atoms = 3000
        lengths, angles = _random_chain(rng, 2, n_atoms)
        cart = ref.chain_in_plane_np(lengths, angles).astype(np.float32)
        di = rng.uniform(-np.pi, np.pi, (2, n_atoms - 3)).astype(np.float32)
        out = np.asarray(
            dihedrals_to_cartesian(jnp.asarray(di), jnp.asarray(cart))
        )
        expected = ref.dihedrals_to_cartesian_np(di, cart)
        # absolute positions drift with chain length; bond GEOMETRY must
        # stay exact and positions within ~2e-3 nm even at this scale
        np.testing.assert_allclose(out, expected, atol=2e-3)
        bonds = np.linalg.norm(np.diff(out, axis=1), axis=-1)
        bonds_ref = np.linalg.norm(np.diff(expected, axis=1), axis=-1)
        np.testing.assert_allclose(bonds, bonds_ref, atol=1e-5)


class TestBackmapPipeline:
    def test_matches_oracle(self, rng):
        B, n_atoms = 8, 24
        dist = rng.uniform(0.1, 0.2, (B, n_atoms - 1)).astype(np.float32)
        ang = rng.uniform(0.5, np.pi - 0.5, (B, n_atoms - 2)).astype(np.float32)
        di = rng.uniform(-np.pi, np.pi, (B, n_atoms - 3)).astype(np.float32)
        out = np.asarray(backmap(jnp.asarray(dist), jnp.asarray(ang), jnp.asarray(di)))
        expected = ref.backmap_np(dist, ang, di)
        np.testing.assert_allclose(out, expected, atol=2e-4)

    def test_requested_dihedrals_are_realized(self, rng):
        """Feeding dihedrals through backmap must produce geometry whose
        measured dihedrals equal the requested ones (up to the +pi offset
        semantics of the BackMapLayer)."""
        B, n_atoms = 4, 20
        dist = rng.uniform(0.1, 0.2, (B, n_atoms - 1)).astype(np.float32)
        ang = rng.uniform(1.5, 2.5, (B, n_atoms - 2)).astype(np.float32)
        di = rng.uniform(-np.pi + 0.1, np.pi - 0.1, (B, n_atoms - 3)).astype(np.float32)
        out = np.asarray(
            backmap(jnp.asarray(dist), jnp.asarray(ang), jnp.asarray(di))
        ).astype(np.float64)
        measured = ref.dihedral_from_xyz_np(
            out[:, :-3], out[:, 1:-2], out[:, 2:-1], out[:, 3:]
        )
        # oracle comparison: the same measurement on the oracle's geometry
        oracle = ref.backmap_np(dist, ang, di)
        measured_oracle = ref.dihedral_from_xyz_np(
            oracle[:, :-3], oracle[:, 1:-2], oracle[:, 2:-1], oracle[:, 3:]
        )
        np.testing.assert_allclose(measured, measured_oracle, atol=1e-3)

    def test_negative_distances_replaced(self, rng):
        B, n_atoms = 3, 10
        dist = rng.uniform(0.1, 0.2, (B, n_atoms - 1)).astype(np.float32)
        dist[0, 2] = -0.5
        ang = rng.uniform(0.5, np.pi - 0.5, (B, n_atoms - 2)).astype(np.float32)
        di = rng.uniform(-np.pi, np.pi, (B, n_atoms - 3)).astype(np.float32)
        out = np.asarray(backmap(jnp.asarray(dist), jnp.asarray(ang), jnp.asarray(di)))
        expected = ref.backmap_np(dist, ang, di)
        np.testing.assert_allclose(out, expected, atol=2e-4)
        assert np.all(np.isfinite(out))


class TestSp2Guessing:
    def test_amide_H_O_geometry(self, rng):
        """Guessed H sits 1.10 from N; guessed O sits 1.24 from C."""
        B, n_atoms = 2, 12
        lengths, angles = _random_chain(rng, B, n_atoms)
        cart = jnp.asarray(ref.chain_in_plane_np(lengths, angles), jnp.float32)
        N_idx = list(range(0, n_atoms, 3))
        C_idx = list(range(2, n_atoms - 3, 3))
        H = np.asarray(guess_amide_H(cart, N_idx))
        O = np.asarray(guess_amide_O(cart, C_idx))
        assert H.shape == (B, len(N_idx) - 1, 3)
        assert O.shape == (B, len(C_idx), 3)
        d_H = np.linalg.norm(H - np.asarray(cart)[:, N_idx[1:]], axis=-1)
        d_O = np.linalg.norm(O - np.asarray(cart)[:, C_idx], axis=-1)
        np.testing.assert_allclose(d_H, 1.10, atol=1e-5)
        np.testing.assert_allclose(d_O, 1.24, atol=1e-5)

    def test_merge_cartesians_order(self, rng):
        B, n_central = 2, 9
        central = jnp.asarray(rng.standard_normal((B, n_central, 3)), jnp.float32)
        N_idx = [0, 3, 6]
        C_idx = [2, 5]
        H = guess_amide_H(central, N_idx)
        O = guess_amide_O(central, C_idx)
        merged = np.asarray(merge_cartesians(central, N_idx, C_idx, H, O))
        assert merged.shape == (B, n_central + (len(N_idx) - 1) + len(C_idx), 3)
        # first atom unchanged, H follows its N, O follows its C
        np.testing.assert_allclose(merged[:, 0], np.asarray(central)[:, 0])


class TestAnalyticAdjoint:
    """The hand-derived backward pass of dihedral_to_cartesian_one_way
    (rigid-rotation Jacobians -> suffix sums) must match autodiff through
    the associative scan exactly."""

    @pytest.mark.parametrize("n", [1, 2, 5, 28, 57])
    def test_matches_autodiff(self, n, rng):
        import sys

        import jax

        bm = sys.modules["encodermap_tpu.ops.backmap"]
        B = 3
        d = jnp.asarray(rng.uniform(-np.pi, np.pi, (B, n)), jnp.float32)
        lengths = jnp.asarray(rng.uniform(1.0, 1.6, (B, n + 2)), jnp.float32)
        angles = jnp.asarray(rng.uniform(1.5, 2.4, (B, n + 1)), jnp.float32)
        x = bm.chain_in_plane(lengths, angles)
        w = jnp.asarray(rng.standard_normal((B, n + 3, 3)), jnp.float32)

        f_custom = lambda d, x: jnp.sum(bm._one_way(d, x) * w)
        f_ad = lambda d, x: jnp.sum(bm._one_way_impl(d, x)[0] * w)
        gc = jax.jit(jax.grad(f_custom, argnums=(0, 1)))(d, x)
        ga = jax.jit(jax.grad(f_ad, argnums=(0, 1)))(d, x)
        np.testing.assert_allclose(gc[0], ga[0], rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(gc[1], ga[1], rtol=2e-4, atol=2e-4)

    def test_mxu_suffix_branch_matches_elementwise(self, rng):
        """The TPU-only matmul suffix-sum branch of the adjoint
        (ops/backmap._suffix_sums) must produce the same gradients as the
        exact flip-cumsum form — forced on via the _FORCE_SUFFIX_MM test
        hook so the CPU suite covers the branch (it is also validated
        on-device by scripts/check_backmap_tpu.py)."""
        import sys

        import jax

        bm = sys.modules["encodermap_tpu.ops.backmap"]
        B, n_atoms = 2, 330  # half-chains > _SUFFIX_MM_MIN
        dist = jnp.asarray(rng.uniform(1.0, 1.6, (B, n_atoms - 1)), jnp.float32)
        ang = jnp.asarray(rng.uniform(1.5, 2.4, (B, n_atoms - 2)), jnp.float32)
        dih = jnp.asarray(
            rng.uniform(-np.pi, np.pi, (B, n_atoms - 3)), jnp.float32
        )
        w = jnp.asarray(rng.standard_normal((B, n_atoms, 3)), jnp.float32)

        def g(a, d):
            from encodermap_tpu.ops.backmap import backmap

            return jnp.sum(backmap(dist, a, d) * w)

        base = jax.grad(g, argnums=(0, 1))(ang, dih)
        assert not bm._FORCE_SUFFIX_MM
        bm._FORCE_SUFFIX_MM = True
        try:
            forced = jax.grad(g, argnums=(0, 1))(ang, dih)
        finally:
            bm._FORCE_SUFFIX_MM = False
        # HIGH-precision (3-pass bf16) matmul sums of ~330 terms vs exact
        # cumsums: compare relative to the gradient SCALE — small entries
        # sit on large cancelling intermediates (same criterion as the
        # on-device check, which measured ~1e-5)
        for f, b in zip(forced, base):
            scale = np.abs(np.asarray(b)).max()
            err = np.abs(np.asarray(f) - np.asarray(b)).max() / scale
            assert err < 1e-4, err

    def test_end_to_end_loss_grad(self, rng):
        """Gradient of a cartesian-style loss through the full backmap
        matches autodiff of the scan implementation."""
        import sys

        import jax

        from encodermap_tpu.ops.backmap import backmap
        from encodermap_tpu.ops.distances import pairwise_dist

        bm = sys.modules["encodermap_tpu.ops.backmap"]
        B, n_atoms = 4, 30
        dist = jnp.asarray(rng.uniform(1.0, 1.6, (B, n_atoms - 1)), jnp.float32)
        ang = jnp.asarray(rng.uniform(1.5, 2.4, (B, n_atoms - 2)), jnp.float32)
        dih = jnp.asarray(
            rng.uniform(-np.pi, np.pi, (B, n_atoms - 3)), jnp.float32
        )
        target = jnp.asarray(
            rng.uniform(0, 3, (B, (n_atoms // 3) * (n_atoms // 3 - 1) // 2)),
            jnp.float32,
        )

        def loss(ang, dih, one_way):
            orig = bm.dihedral_to_cartesian_one_way
            bm.dihedral_to_cartesian_one_way = one_way
            try:
                xyz = backmap(dist, ang, dih)
            finally:
                bm.dihedral_to_cartesian_one_way = orig
            ca = xyz[:, 1::3]
            return jnp.mean(jnp.abs(pairwise_dist(ca, flat=True) - target))

        custom = jax.grad(lambda a, d: loss(a, d, bm._one_way), (0, 1))(ang, dih)
        plain = jax.grad(
            lambda a, d: loss(a, d, lambda dd, xx: bm._one_way_impl(dd, xx)[0]),
            (0, 1),
        )(ang, dih)
        np.testing.assert_allclose(custom[0], plain[0], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(custom[1], plain[1], rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("n_atoms", [30, 31, 330, 331])
    def test_batched_halves_matches_two_calls(self, rng, n_atoms):
        """The TPU-only batched-halves branch of dihedrals_to_cartesian (ONE
        _one_way call at 2x batch, shorter half padded) must match the
        default two-call path in value AND gradient — forced on via the
        _FORCE_BATCHED_HALVES hook so the CPU suite covers it. Odd atom
        counts exercise the padding; 330+ also routes the padded right half
        through the MXU suffix-sum branch at a length the left never runs."""
        import sys

        import jax

        from encodermap_tpu.ops.backmap import backmap

        bm = sys.modules["encodermap_tpu.ops.backmap"]
        B = 3
        dist = jnp.asarray(rng.uniform(1.0, 1.6, (B, n_atoms - 1)), jnp.float32)
        ang = jnp.asarray(rng.uniform(1.5, 2.4, (B, n_atoms - 2)), jnp.float32)
        dih = jnp.asarray(
            rng.uniform(-np.pi, np.pi, (B, n_atoms - 3)), jnp.float32
        )
        w = jnp.asarray(rng.standard_normal((B, n_atoms, 3)), jnp.float32)

        def f(a, d):
            return jnp.sum(backmap(dist, a, d) * w)

        assert not bm._FORCE_BATCHED_HALVES
        base_v = f(ang, dih)
        base_g = jax.grad(f, argnums=(0, 1))(ang, dih)
        bm._FORCE_BATCHED_HALVES = True
        try:
            forced_v = f(ang, dih)
            forced_g = jax.grad(f, argnums=(0, 1))(ang, dih)
        finally:
            bm._FORCE_BATCHED_HALVES = False
        np.testing.assert_allclose(forced_v, base_v, rtol=1e-5, atol=1e-5)
        for fg, bg in zip(forced_g, base_g):
            scale = np.abs(np.asarray(bg)).max()
            err = np.abs(np.asarray(fg) - np.asarray(bg)).max() / scale
            assert err < 1e-4, err
        # padded rows never leak NaN/inf through the slice
        assert np.isfinite(np.asarray(forced_g[0])).all()
        assert np.isfinite(np.asarray(forced_g[1])).all()
