# tests/test_generate_validation.py
"""Scientific validation of generated structures: secondary structure of
``generate()`` output must match the training ensemble — the analog of the
reference's DSSP check on rebuilt structures
(``/root/reference/tests/test_backmapping_em1_em2.py:364-411``)."""

import types
from pathlib import Path

import numpy as np
import pytest

DATA = Path("/root/reference/tests/data")


@pytest.mark.slow
@pytest.mark.skipif(not DATA.exists(), reason="reference test data not mounted")
class TestGeneratedSecondaryStructure:
    @pytest.fixture(scope="class")
    def trained(self, tmp_path_factory):
        """1am7 lysozyme (158 res, ~42% helix) trained through the full
        soft-start ramp (calibrated with the HID-chi-corrected 307-wide
        side_dihedrals: loss -> ~1.34 at 900 steps, seed 0; generated
        helix 0.402 / sheet 0.100 vs input 0.416 / 0.038)."""
        import encodermap_tpu as em
        from encodermap_tpu.train.adc_autoencoder import (
            AngleDihedralCartesianEncoderMap,
        )

        traj = em.load(DATA / "1am7_corrected.xtc", DATA / "1am7_protein.pdb")
        trajs = em.TrajEnsemble([traj])
        trajs.load_CVs("all")
        p = em.ADCParameters(
            cartesian_pwd_start=1, cartesian_pwd_step=3,  # CA atoms
            main_path=str(tmp_path_factory.mktemp("dssp")), batch_size=32,
            n_steps=900, steps_per_scan=100, use_backbone_angles=True,
            use_sidechains=True, n_neurons=[64, 64, 2], seed=0,
            checkpoint_step=10**6, summary_step=10**6,
            cartesian_cost_scale_soft_start=(50, 200),
        )
        emap = AngleDihedralCartesianEncoderMap(trajs, p, read_only=True)
        emap.train()
        return traj, trajs, emap

    def test_dssp_of_generated_matches_input(self, trained):
        """Helix/sheet fractions of 16 generated conformations (decoded
        dihedrals applied to the real topology) stay close to the input
        ensemble's."""
        from encodermap_tpu.ops.dssp import compute_dssp

        traj, trajs, emap = trained
        ss_in = compute_dssp(traj)
        helix_in = (ss_in == "H").mean()
        sheet_in = (ss_in == "E").mean()
        assert helix_in > 0.3  # lysozyme is helical; sanity of the oracle

        latent = emap.encode()
        xyz = emap.generate(latent[:16], backend="topology", top=traj)
        fake = types.SimpleNamespace(xyz=xyz, top=traj.top)
        ss_gen = compute_dssp(fake)
        helix_gen = (ss_gen == "H").mean()
        sheet_gen = (ss_gen == "E").mean()
        # calibrated slack: measured gen 0.402 / input 0.416 helix,
        # gen 0.100 / input 0.038 sheet at 900 steps
        assert abs(helix_gen - helix_in) < 0.15, (helix_gen, helix_in)
        assert abs(sheet_gen - sheet_in) < 0.10, (sheet_gen, sheet_in)

    def test_true_dihedrals_roundtrip_preserves_dssp(self, trained):
        """Ground-truth leg (decoder-independent): backmapping the INPUT
        dihedrals onto the topology preserves the secondary structure —
        validates the backmap+DSSP pipeline itself."""
        from encodermap_tpu.misc.backmapping_offline import backmap_topology
        from encodermap_tpu.ops.dssp import compute_dssp

        traj, trajs, emap = trained
        t = traj.top
        chain = t.central_atom_indices()
        quads = np.stack(
            [chain[:-3], chain[1:-2], chain[2:-1], chain[3:]], axis=1
        )
        di = trajs.CVs["central_dihedrals"][:8]
        xyz = backmap_topology(t, traj.xyz[0], di, dihedral_indices=quads)
        ss = compute_dssp(types.SimpleNamespace(xyz=xyz, top=t))
        ss_in = compute_dssp(traj)
        # measured: 0.428 vs 0.416 helix (ring-locked prolines and the
        # planar-omega idealization shift a few residues)
        assert abs((ss == "H").mean() - (ss_in == "H").mean()) < 0.10
        assert abs((ss == "E").mean() - (ss_in == "E").mean()) < 0.10

    def test_ramachandran_of_generated_matches_input(self, trained):
        """phi/psi distributions of generated structures (computed by OUR
        dihedral kernel from the generated xyz — closing the
        generate -> featurize loop) must occupy the same Ramachandran
        region as the input ensemble."""
        import jax.numpy as jnp

        from encodermap_tpu.ops.geometry import compute_dihedrals

        traj, trajs, emap = trained
        t = traj.top
        latent = emap.encode()
        xyz = emap.generate(latent[:16], backend="topology", top=traj)

        def phi_psi(xyz_arr):
            phi = np.asarray(compute_dihedrals(
                jnp.asarray(xyz_arr, jnp.float32), t.indices_phi
            ))
            psi = np.asarray(compute_dihedrals(
                jnp.asarray(xyz_arr, jnp.float32), t.indices_psi
            ))
            return phi, psi

        phi_g, psi_g = phi_psi(xyz)
        phi_i, psi_i = phi_psi(traj.xyz)
        # fraction of residues in the alpha-helical basin
        # (phi in [-120, -30], psi in [-80, 10] degrees)
        def helical_frac(phi, psi):
            h = (
                (phi > np.deg2rad(-120)) & (phi < np.deg2rad(-30))
                & (psi > np.deg2rad(-80)) & (psi < np.deg2rad(10))
            )
            return h.mean()

        f_in = helical_frac(phi_i, psi_i)
        f_gen = helical_frac(phi_g, psi_g)
        assert f_in > 0.3  # lysozyme: mostly helical
        assert abs(f_gen - f_in) < 0.15, (f_gen, f_in)

    def test_generated_backbones_physically_sane(self, trained):
        """Scan-backend generate(): bond lengths in the physical range and
        no hard clashes between sequence-distant backbone atoms."""
        from encodermap_tpu.ops.distances import pairwise_dist

        traj, trajs, emap = trained
        latent = emap.encode()
        xyz = emap.generate(latent[:16])
        assert np.isfinite(xyz).all()
        bonds = np.linalg.norm(np.diff(xyz, axis=1), axis=-1)
        assert 0.1 < bonds.mean() < 0.2
        dmat = np.asarray(pairwise_dist(xyz))
        n = dmat.shape[1]
        iu = np.triu_indices(n, k=6)
        # sequence-distant atoms must not interpenetrate (< 0.5 Angstrom)
        frac_clash = (dmat[:, iu[0], iu[1]] < 0.05).mean()
        assert frac_clash < 0.001, frac_clash
