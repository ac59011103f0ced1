# tests/test_sidechain_reconstruction.py
"""Sidechain-aware backmapping + the reconstruct_sidechains ADC path.

The kernel must realize ALL requested internal coordinates (bonds, angles,
dihedrals for backbone and sidechains) and match a float64 sequential oracle
of the reference layer's loop semantics (``models/layers.py:219-902``)."""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from encodermap_tpu.ops.backmap_sidechains import backmap_sidechains, make_spec
from tests.reference_impl import angle_from_xyz_np, dihedral_from_xyz_np

DATA = Path("/root/reference/tests/data")

INFO = {1: 2, 2: 0, 3: 3, 4: 1}


def _random_inputs(rng, info, B=3):
    spec = make_spec(info)
    nb = 3 * spec.n_residues
    ns = spec.n_sidechain_atoms
    return spec, (
        rng.uniform(0.13, 0.155, (B, nb - 1)).astype(np.float32),
        rng.uniform(1.7, 2.2, (B, nb - 2)).astype(np.float32),
        rng.uniform(-np.pi, np.pi, (B, nb - 3)).astype(np.float32),
        rng.uniform(0.13, 0.16, (B, ns)).astype(np.float32),
        rng.uniform(1.7, 2.2, (B, ns)).astype(np.float32),
        rng.uniform(-np.pi, np.pi, (B, sum(info.values()))).astype(np.float32),
    )


class TestSidechainBackmap:
    @pytest.fixture(scope="class")
    def result(self, rng=np.random.default_rng(0)):
        spec, inputs = _random_inputs(rng, INFO)
        xyz = np.asarray(
            jax.jit(lambda *a: backmap_sidechains(spec, *a))(*inputs)
        ).astype(np.float64)
        return spec, inputs, xyz

    def test_shapes_finite(self, result):
        spec, inputs, xyz = result
        assert xyz.shape == (3, spec.n_atoms, 3)
        assert np.isfinite(xyz).all()

    def test_central_internal_coordinates(self, result):
        spec, (cd, ca, cdi, *_), xyz = result
        nb = 3 * spec.n_residues
        bb = xyz[:, :nb]
        np.testing.assert_allclose(
            np.linalg.norm(np.diff(bb, axis=1), axis=-1), cd, atol=1e-5
        )
        np.testing.assert_allclose(
            angle_from_xyz_np(bb[:, :-2], bb[:, 1:-1], bb[:, 2:]), ca,
            atol=2e-3,
        )
        d = np.abs(
            dihedral_from_xyz_np(bb[:, :-3], bb[:, 1:-2], bb[:, 2:-1], bb[:, 3:])
            - cdi
        )
        assert np.minimum(d, 2 * np.pi - d).max() < 1e-4

    def test_side_internal_coordinates(self, result):
        spec, (_, _, _, sd, sa, sdi), xyz = result
        tri = spec.angle_triplets[spec.n_central_angles:]
        measured_sa = np.stack(
            [angle_from_xyz_np(xyz[:, t[0]], xyz[:, t[1]], xyz[:, t[2]])
             for t in tri], axis=1,
        )
        np.testing.assert_allclose(measured_sa, sa, atol=2e-3)
        quads = spec.dihedral_quadruplets[spec.n_central_dihedrals:]
        measured_sdi = np.stack(
            [dihedral_from_xyz_np(*[xyz[:, q[k]] for k in range(4)])
             for q in quads], axis=1,
        )
        d = np.abs(measured_sdi - sdi)
        assert np.minimum(d, 2 * np.pi - d).max() < 1e-4

    def test_side_bond_lengths(self, result):
        spec, (_, _, _, sd, *_), xyz = result
        nb = 3 * spec.n_residues
        col, bond = nb, 0
        for r, v in INFO.items():
            if v == 0:
                continue
            chain = [(r - 1) * 3 + 1] + list(range(col, col + v + 1))
            for a, b in zip(chain[:-1], chain[1:]):
                L = np.linalg.norm(xyz[:, b] - xyz[:, a], axis=-1)
                np.testing.assert_allclose(L, sd[:, bond], atol=1e-5)
                bond += 1
            col += v + 1

    def test_no_sidechains_info(self):
        """All-zero sidechain info degenerates to pure backbone."""
        spec = make_spec({1: 0, 2: 0, 3: 0})
        assert spec.n_sidechain_atoms == 0
        rng = np.random.default_rng(1)
        B, nb = 2, 9
        xyz = np.asarray(
            backmap_sidechains(
                spec,
                jnp.asarray(rng.uniform(0.13, 0.15, (B, nb - 1)), jnp.float32),
                jnp.asarray(rng.uniform(1.8, 2.1, (B, nb - 2)), jnp.float32),
                jnp.asarray(rng.uniform(-3, 3, (B, nb - 3)), jnp.float32),
                jnp.zeros((B, 0), jnp.float32),
                jnp.zeros((B, 0), jnp.float32),
                jnp.zeros((B, 0), jnp.float32),
            )
        )
        assert xyz.shape == (B, nb, 3)
        assert np.isfinite(xyz).all()


class TestReconstructSidechainsADC:
    @pytest.fixture(scope="class")
    def cvs(self):
        """Synthetic 7-CV dataset consistent with INFO."""
        rng = np.random.default_rng(2)
        spec, inputs = _random_inputs(rng, INFO, B=120)
        cd, ca, cdi, sd, sa, sdi = inputs
        xyz = np.asarray(
            jax.jit(lambda *a: backmap_sidechains(spec, *a))(*inputs)
        )
        return {
            "central_angles": ca,
            "central_dihedrals": cdi,
            "all_cartesians": xyz,
            "central_distances": cd,
            "side_angles": sa,
            "side_dihedrals": sdi,
            "side_distances": sd,
        }

    def test_training(self, cvs, tmp_path):
        from encodermap_tpu import ADCParameters
        from encodermap_tpu.train.adc_autoencoder import (
            AngleDihedralCartesianEncoderMap,
        )

        p = ADCParameters(
            main_path=str(tmp_path), n_neurons=[16, 16, 2], n_steps=10,
            steps_per_scan=5, batch_size=16, reconstruct_sidechains=True,
            sidechain_info=INFO, use_backbone_angles=True,
            use_sidechains=True, seed=0, checkpoint_step=10**6,
            summary_step=10**6,
        )
        emap = AngleDihedralCartesianEncoderMap(cvs, p)
        history = emap.train()
        assert np.isfinite(history["loss"]).all()
        for name in ("dihedral_loss", "angle_loss", "side_dihedral_loss",
                     "cartesian_loss"):
            assert name in history

        latent = emap.encode()
        assert latent.shape == (120, 2)
        xyz = emap.generate(latent[:4])
        spec = emap.sidechain_spec
        assert xyz.shape == (4, spec.n_atoms, 3)
        assert np.isfinite(xyz).all()

    def test_featurizer_consistency_glu7(self):
        """chi3 coverage: 7x GLU has three chi dihedrals per residue."""
        if not DATA.exists():
            pytest.skip("reference data not mounted")
        from encodermap_tpu.data import SingleTraj
        from encodermap_tpu.loading.featurizer import SingleTrajFeaturizer

        traj = SingleTraj(DATA / "glu7.xtc", DATA / "glu7.pdb")
        info = traj.top.sidechain_info()
        assert info == {r: 3 for r in range(1, 8)}
        spec = make_spec(info)
        feat = SingleTrajFeaturizer(traj)
        feat.add_list_of_feats("full")
        out = feat.get_output()
        assert out["side_dihedrals"].shape[1] == 21
        assert out["side_distances"].shape[1] == spec.n_sidechain_atoms
        assert out["all_cartesians"].shape[1] == spec.n_atoms

    def test_featurizer_consistency(self):
        """The chi-derived features produce CV dims matching make_spec for a
        real topology (asp7: 7x ASP with chi1+chi2)."""
        if not DATA.exists():
            pytest.skip("reference data not mounted")
        from encodermap_tpu.data import SingleTraj
        from encodermap_tpu.loading.featurizer import SingleTrajFeaturizer

        traj = SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb")
        info = traj.top.sidechain_info()
        spec = make_spec(info)
        feat = SingleTrajFeaturizer(traj)
        feat.add_list_of_feats("full")
        out = feat.get_output()
        assert out["side_distances"].shape[1] == spec.n_sidechain_atoms
        assert out["side_angles"].shape[1] == spec.n_sidechain_atoms
        assert out["side_dihedrals"].shape[1] == sum(info.values())
        assert out["all_cartesians"].shape[1] == spec.n_atoms


class TestFastSidechainBackmap:
    """The log-depth formulation: closed-form planar tree + telescoped
    quaternion prefix products."""

    @pytest.mark.parametrize(
        "info",
        [{1: 2, 2: 0, 3: 3, 4: 1}, {1: 1, 2: 2}, {1: 0, 2: 5, 3: 0}],
        ids=["mixed", "small", "single-branch"],
    )
    def test_matches_scan_version(self, info):
        """Agrees with the sequential-semantics scan up to its arccos-clip
        bias (~5e-4 per chain; the fast version is exact)."""
        from encodermap_tpu.ops.backmap_sidechains import (
            backmap_sidechains,
            backmap_sidechains_fast,
            make_spec,
        )

        spec = make_spec(info)
        rng = np.random.default_rng(0)
        B, nb, ns = 3, 3 * spec.n_residues, spec.n_sidechain_atoms
        args = (
            rng.uniform(0.13, 0.155, (B, nb - 1)).astype(np.float32),
            rng.uniform(1.7, 2.2, (B, nb - 2)).astype(np.float32),
            rng.uniform(-np.pi, np.pi, (B, nb - 3)).astype(np.float32),
            rng.uniform(0.13, 0.16, (B, ns)).astype(np.float32),
            rng.uniform(1.7, 2.2, (B, ns)).astype(np.float32),
            rng.uniform(-np.pi, np.pi, (B, sum(info.values()))).astype(
                np.float32
            ),
        )
        slow = np.asarray(jax.jit(lambda *a: backmap_sidechains(spec, *a))(*args))
        fast = np.asarray(
            jax.jit(lambda *a: backmap_sidechains_fast(spec, *a))(*args)
        )
        np.testing.assert_allclose(fast, slow, atol=2e-3)

    def test_internal_coordinates_machine_exact(self):
        """The fast version realizes every requested internal coordinate to
        f32 machine precision (no per-step clip bias)."""
        from encodermap_tpu.ops.backmap_sidechains import (
            backmap_sidechains_fast,
            make_spec,
        )
        from tests.reference_impl import angle_from_xyz_np

        spec = make_spec(INFO)
        rng = np.random.default_rng(1)
        B, nb, ns = 2, 3 * spec.n_residues, spec.n_sidechain_atoms
        cd = rng.uniform(0.13, 0.155, (B, nb - 1)).astype(np.float32)
        ca = rng.uniform(1.7, 2.2, (B, nb - 2)).astype(np.float32)
        cdi = rng.uniform(-np.pi, np.pi, (B, nb - 3)).astype(np.float32)
        sd = rng.uniform(0.13, 0.16, (B, ns)).astype(np.float32)
        sa = rng.uniform(1.7, 2.2, (B, ns)).astype(np.float32)
        sdi = rng.uniform(-np.pi, np.pi, (B, sum(INFO.values()))).astype(
            np.float32
        )
        xyz = np.asarray(
            backmap_sidechains_fast(spec, cd, ca, cdi, sd, sa, sdi)
        ).astype(np.float64)
        bb = xyz[:, :nb]
        np.testing.assert_allclose(
            np.linalg.norm(np.diff(bb, axis=1), axis=-1), cd, atol=5e-6
        )
        np.testing.assert_allclose(
            angle_from_xyz_np(bb[:, :-2], bb[:, 1:-1], bb[:, 2:]), ca,
            atol=5e-5,
        )
        d = np.abs(
            dihedral_from_xyz_np(bb[:, :-3], bb[:, 1:-2], bb[:, 2:-1],
                                 bb[:, 3:]) - cdi
        )
        assert np.minimum(d, 2 * np.pi - d).max() < 5e-5
