# tests/test_dssp.py
"""Native Kabsch-Sander DSSP (the reference delegates to mdtraj's C
extension; ours is self-contained). Validated against the published DSSP
assignment of ubiquitin (1UBQ) and ideal Ala10 helix/extended structures."""

from pathlib import Path

import numpy as np
import pytest

from encodermap_tpu.ops.dssp import compute_dssp

DATA = Path("/root/reference/tests/data")

needs_data = pytest.mark.skipif(not DATA.exists(), reason="no reference data")


@pytest.fixture(scope="module")
def ubq():
    from encodermap_tpu.data import SingleTraj

    return SingleTraj(DATA / "1UBQ.pdb")


@needs_data
class TestDSSP:
    def test_ideal_helix(self):
        from encodermap_tpu.data import SingleTraj

        d = compute_dssp(SingleTraj(DATA / "Ala10_helix.pdb"))
        assert (d[0, 1:-1] == "H").all()

    def test_extended_chain_is_coil(self):
        from encodermap_tpu.data import SingleTraj

        d = compute_dssp(SingleTraj(DATA / "Ala10_straight.pdb"))
        assert (d[0] == "C").all()

    def test_ubiquitin_simplified(self, ubq):
        """1UBQ: alpha helix 23-34, beta strands ~2-7 / 12-16 / 41-45 /
        66-71 (1-based; PDB/DSSP canonical assignment)."""
        d = compute_dssp(ubq, simplified=True)
        s = d[0]
        assert (s[22:34] == "H").all()  # the single long alpha helix
        for strand in (slice(1, 7), slice(11, 16), slice(40, 45),
                       slice(65, 71)):
            assert (s[strand] == "E").all(), f"strand {strand} -> {s[strand]}"
        # waters are not protein
        assert (s[76:] == "NA").all()

    def test_ubiquitin_full_alphabet(self, ubq):
        d = compute_dssp(ubq, simplified=False)
        s = d[0]
        assert set(s) <= {"H", "B", "E", "G", "I", "T", "S", " ", "NA"}
        # 1UBQ has 3/10 helices at 38-40 and 57-59
        assert (s[37:40] == "G").all()
        assert (s[56:59] == "G").all()

    def test_multi_frame(self):
        from encodermap_tpu.data import SingleTraj

        traj = SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb")[:5]
        d = compute_dssp(traj)
        assert d.shape == (5, traj.top.n_residues)
        assert set(np.unique(d)) <= {"H", "E", "C", "NA"}

    def test_plot_dssp(self, ubq, tmp_path):
        from encodermap_tpu.plot import plot_dssp

        out = plot_dssp(ubq, save_path=tmp_path / "dssp.png")
        assert Path(out).exists() and Path(out).stat().st_size > 0


class TestBackmapDSSPSanity:
    """Backmapped structures have recognizable secondary structure — the
    analog of the reference's DSSP sanity check on rebuilt conformations
    (``tests/test_backmapping_em1_em2.py:364``). Ideal alpha-helix internal
    coordinates (phi=-57, psi=-47, omega=180) through the associative-scan
    backmap + sp2 oxygen guessing must produce a DSSP-assigned helix."""

    def test_ideal_helix_roundtrip(self):
        from types import SimpleNamespace

        import jax.numpy as jnp

        from encodermap_tpu.data.topology import Topology
        from encodermap_tpu.ops.backmap import backmap, guess_amide_O

        R = 20
        dist = np.tile([1.46, 1.52, 1.33], R)[: 3 * R - 1][None]
        ang = np.tile(np.radians([111, 117, 121]), R)[: 3 * R - 2][None]
        phi, psi, omega = np.radians([-57, -47, 180])
        dih = np.tile([psi, omega, phi], R)[: 3 * R - 3][None]
        xyz = np.asarray(
            backmap(
                jnp.asarray(dist, jnp.float32),
                jnp.asarray(ang, jnp.float32),
                jnp.asarray(dih, jnp.float32),
            )
        )
        C_idx = list(range(2, 3 * R, 3))
        O = np.asarray(guess_amide_O(jnp.asarray(xyz), C_idx))

        full = np.zeros((1, 4 * R, 3), np.float32)
        top = Topology()
        for r in range(R):
            res = top.add_residue("ALA", r + 1, 0)
            for k, nm in enumerate(("N", "CA", "C")):
                top.add_atom(nm, nm[0], res)
                full[:, 4 * r + k] = xyz[:, 3 * r + k]
            top.add_atom("O", "O", res)
            full[:, 4 * r + 3] = O[:, r]
        traj = SimpleNamespace(xyz=full / 10.0, top=top)  # Angstrom -> nm

        d = compute_dssp(traj)
        assert (d[0, 1:-1] == "H").all(), "".join(d[0])


@needs_data
class TestDigitizeDSSP:
    def test_fractions_and_image(self, ubq):
        from encodermap_tpu.plot import digitize_dssp, dssp_fractions

        d = compute_dssp(ubq)
        fr = dssp_fractions(d)
        assert fr.shape == (1, 3)
        np.testing.assert_allclose(fr.sum(1), 1.0, atol=1e-9)
        # 1UBQ: mixed alpha/beta protein
        assert 0.1 < fr[0, 0] < 0.5 and 0.2 < fr[0, 1] < 0.7

        lowd = np.random.default_rng(0).standard_normal((1, 2))
        img = digitize_dssp(lowd, d, bins=10)
        assert img.shape == (10, 10, 3)
        assert img.min() >= 0 and img.max() <= 1


@needs_data
class TestRotateToHelix:
    def test_straight_chain_becomes_helix(self):
        """Cross-module integration: traj_rotate sets alpha-helical phi/psi
        on the straight Ala10 chain and DSSP recognizes the helix (the
        rotation machinery, sp2 oxygen positions from the PDB, and the
        secondary-structure assignment all agree)."""
        from types import SimpleNamespace

        from encodermap_tpu.data import SingleTraj
        from encodermap_tpu.misc.backmapping_offline import traj_rotate

        t = SingleTraj(DATA / "Ala10_straight.pdb")
        idx = np.vstack([t.top.indices_phi, t.top.indices_psi])
        targets = np.concatenate([
            np.full(len(t.top.indices_phi), np.radians(-57)),
            np.full(len(t.top.indices_psi), np.radians(-47)),
        ])[None, :].astype(np.float32)
        xyz = traj_rotate(t, targets, idx)
        rotated = SimpleNamespace(xyz=xyz, top=t.top)
        assert (compute_dssp(t)[0] == "C").all()
        d = compute_dssp(rotated)[0]
        assert (d[1:-1] == "H").all(), "".join(d)
