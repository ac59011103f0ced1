# tests/test_long_training.py
"""Long-training determinism references.

The analog of the reference's ``tests/long_training.py:23-28``: seeded
multi-thousand-step trainings on fixture data with stored loss-curve
snapshots. Any future kernel change that silently drifts the numerics
(precision regressions, loss reorderings, optimizer changes) fails these
asserts long before it would show up in short smoke tests.

Regenerate the stored references after an *intentional* numerics change:

    python -m tests.test_long_training regen
"""

from pathlib import Path

import numpy as np
import pytest

REF_FILE = Path(__file__).parent / "data" / "long_training_refs.npz"
DATA = Path("/root/reference/tests/data")

# subsample stride for the stored curves
STRIDE = 50


def _run_encodermap() -> np.ndarray:
    """10000 seeded steps of EncoderMap on the deterministic cube set
    (matching the reference's multi-thousand-step stored references,
    ``/root/reference/tests/long_training.py:23-28``)."""
    import encodermap_tpu as em

    data, _ = em.create_n_cube(3, points_along_edge=100, seed=42)
    p = em.Parameters(
        periodicity=float("inf"), n_neurons=[64, 64, 2], batch_size=128,
        n_steps=10000, steps_per_scan=500, seed=7,
    )
    emap = em.EncoderMap(p, data.astype(np.float32), read_only=True)
    h = emap.train()
    return np.asarray(h["loss"], np.float32)[::STRIDE]


def _run_adc() -> np.ndarray:
    """1500 seeded ADC steps on real asp7 CVs (featurized from the fixture
    XTC — featurization itself is validated bit-exactly elsewhere),
    including the soft-start cartesian ramp."""
    import encodermap_tpu as em
    from encodermap_tpu.train.adc_autoencoder import (
        AngleDihedralCartesianEncoderMap,
    )

    traj = em.load(DATA / "asp7.xtc", DATA / "asp7.pdb")
    trajs = em.TrajEnsemble([traj])
    trajs.load_CVs("all")
    p = em.ADCParameters(
        cartesian_pwd_start=1, cartesian_pwd_step=3,  # CA atoms
        batch_size=64, n_steps=1500, steps_per_scan=500,
        use_backbone_angles=True, use_sidechains=True,
        n_neurons=[64, 64, 2], seed=11,
        cartesian_cost_scale_soft_start=(200, 800),
    )
    emap = AngleDihedralCartesianEncoderMap(trajs, p, read_only=True)
    h = emap.train()
    return np.asarray(h["loss"], np.float32)[::STRIDE]


def _run_adc_lysozyme() -> np.ndarray:
    """Lysozyme-scale (1am7, 158 residues) seeded ADC curve — the
    real-system analog of the reference's diUbi HPC references
    (``/root/reference/tests/long_training.py:23-28``): 800 steps through
    the full soft-start ramp at production chain length."""
    import encodermap_tpu as em
    from encodermap_tpu.train.adc_autoencoder import (
        AngleDihedralCartesianEncoderMap,
    )

    traj = em.load(DATA / "1am7_corrected.xtc", DATA / "1am7_protein.pdb")
    trajs = em.TrajEnsemble([traj])
    trajs.load_CVs("all")
    p = em.ADCParameters(
        cartesian_pwd_start=1, cartesian_pwd_step=3,  # CA atoms
        batch_size=32, n_steps=800, steps_per_scan=400,
        use_backbone_angles=True, use_sidechains=True,
        n_neurons=[64, 64, 2], seed=13,
        cartesian_cost_scale_soft_start=(100, 400),
    )
    emap = AngleDihedralCartesianEncoderMap(trajs, p, read_only=True)
    h = emap.train()
    return np.asarray(h["loss"], np.float32)[::STRIDE]


@pytest.mark.slow
@pytest.mark.skipif(not DATA.exists(), reason="reference test data not mounted")
class TestLongTrainingDeterminism:
    def test_reference_file_exists(self):
        assert REF_FILE.exists(), (
            "stored loss references missing; run "
            "`python -m tests.test_long_training regen`"
        )

    def test_encodermap_loss_curve(self):
        ref = np.load(REF_FILE)["encodermap_loss"]
        cur = _run_encodermap()
        assert cur.shape == ref.shape
        np.testing.assert_allclose(cur, ref, rtol=1e-3, atol=1e-4)

    def test_adc_loss_curve(self):
        ref = np.load(REF_FILE)["adc_loss"]
        cur = _run_adc()
        assert cur.shape == ref.shape
        np.testing.assert_allclose(cur, ref, rtol=1e-3, atol=1e-4)

    def test_adc_lysozyme_loss_curve(self):
        ref = np.load(REF_FILE)["adc_lysozyme_loss"]
        cur = _run_adc_lysozyme()
        assert cur.shape == ref.shape
        np.testing.assert_allclose(cur, ref, rtol=1e-3, atol=1e-4)


def regen() -> None:
    REF_FILE.parent.mkdir(parents=True, exist_ok=True)
    em_loss = _run_encodermap()
    adc_loss = _run_adc()
    lys_loss = _run_adc_lysozyme()
    np.savez(REF_FILE, encodermap_loss=em_loss, adc_loss=adc_loss,
             adc_lysozyme_loss=lys_loss)
    print(f"wrote {REF_FILE}: encodermap {em_loss[:3]} ... {em_loss[-1]:.4f}, "
          f"adc {adc_loss[:3]} ... {adc_loss[-1]:.4f}, "
          f"adc_lysozyme {lys_loss[:3]} ... {lys_loss[-1]:.4f}")


if __name__ == "__main__":
    import sys

    # references must be generated in the SAME environment the pytest suite
    # runs in — conftest's forced CPU AND the 8-virtual-device flag (the
    # device-count changes XLA CPU thread partitioning, which changes
    # reduction order enough to chaotically diverge the lysozyme curve)
    import os

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        regen()
    else:
        print(__doc__)
