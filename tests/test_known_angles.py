# tests/test_known_angles.py
"""Feature kernels vs the reference's constructed ground-truth dataset
(``tests/data/known_angles*.h5``: a 4-atom molecule whose angles and
dihedrals take known exact values — reference ``test_featurizer.py:1519``)."""

from pathlib import Path

import numpy as np
import pytest

DATA = Path("/root/reference/tests/data")
needs_data = pytest.mark.skipif(not DATA.exists(), reason="no reference data")


@needs_data
class TestKnownAngles:
    @pytest.fixture(scope="class")
    def traj(self):
        from encodermap_tpu.data import SingleTraj

        return SingleTraj(DATA / "known_angles.h5")

    def test_angles_deg(self, traj):
        from encodermap_tpu.loading.featurizer import SingleTrajFeaturizer

        f = SingleTrajFeaturizer(traj)
        f.add_angles([[0, 1, 2], [1, 2, 3]], deg=True)
        out = f.get_output()["AngleFeature"]
        assert out.shape == (6, 2)
        # reference ground truth: first angle is 90 deg in every frame; the
        # second only in frames 0, 1, 3
        ninety = np.array([[True, True], [True, True], [True, False],
                           [True, True], [True, False], [True, False]])
        np.testing.assert_allclose(out[:, 0], 90.0, atol=1e-3)
        assert np.array_equal(np.isclose(out, 90.0, atol=1e-3), ninety)

    def test_dihedrals_deg(self, traj):
        from encodermap_tpu.loading.featurizer import SingleTrajFeaturizer

        f = SingleTrajFeaturizer(traj)
        f.add_dihedrals([[0, 1, 2, 3]], deg=True)
        out = f.get_output()["DihedralFeature"][:, 0]
        expected = [180.0, 0.0, 153.0, 180.0, 117.0, 90.0]
        np.testing.assert_allclose(np.abs(np.round(out, 0)), expected,
                                   atol=0.5)

    def test_ensemble_split_files_match(self):
        """The two split files stack to the same values as the single file
        (reference ``test_add_angles`` feat2 path)."""
        from encodermap_tpu.data import SingleTraj, TrajEnsemble
        from encodermap_tpu.loading.featurizer import SingleTrajFeaturizer

        full = SingleTraj(DATA / "known_angles.h5")
        f = SingleTrajFeaturizer(full)
        f.add_angles([[0, 1, 2], [1, 2, 3]], deg=True)
        ref = f.get_output()["AngleFeature"]

        parts = []
        for name in ("known_angles_1.h5", "known_angles_2.h5"):
            t = SingleTraj(DATA / name)
            ff = SingleTrajFeaturizer(t)
            ff.add_angles([[0, 1, 2], [1, 2, 3]], deg=True)
            parts.append(ff.get_output()["AngleFeature"])
        np.testing.assert_allclose(np.vstack(parts), ref, atol=1e-4)


@needs_data
class TestAla10GroundTruth:
    """The reference's hard-coded Ala10 helix backbone angles
    (``tests/test_angles.py:64-104``): 28 known values through MolData."""

    def test_ala10_angles(self):
        from encodermap_tpu import MolData
        from encodermap_tpu.data import SingleTraj

        traj = SingleTraj(DATA / "Ala10_helix.pdb")
        md = MolData(traj)
        expected = np.array([
            1.9216446, 2.0355537, 2.128159, 1.9212531, 2.0357149,
            2.1278918, 1.9220486, 2.0346954, 2.1269655, 1.9218233,
            2.0352163, 2.1275373, 1.9212493, 2.035614, 2.128058,
            1.9211367, 2.0354483, 2.128482, 1.9212018, 2.034529,
            2.1266387, 1.9220015, 2.034642, 2.1270595, 1.9208968,
            2.0354831, 2.127831, 1.9212908,
        ], np.float32)
        assert md.angles.shape == (1, 28)
        np.testing.assert_allclose(md.angles[0], expected, atol=2e-5)
