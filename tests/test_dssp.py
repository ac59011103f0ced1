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
