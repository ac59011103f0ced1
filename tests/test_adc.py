# tests/test_adc.py
"""AngleDihedralCartesianEncoderMap end-to-end on synthetic + real CVs.

Mirrors the ADC coverage of the reference's ``tests/test_autoencoder.py``:
loss assembly, training decreases the loss, use_backbone_angles/sidechain
variants, soft-start schedule in train state, decode/generate shapes."""

import numpy as np
import pytest

from encodermap_tpu import ADCParameters
from encodermap_tpu.train.adc_autoencoder import AngleDihedralCartesianEncoderMap


def synthetic_cvs(rng, n_frames=300, n_res=8):
    """Synthetic internal-coordinate dataset of a 3*n_res central chain."""
    n_atoms = 3 * n_res
    angles = rng.uniform(1.6, 2.4, (n_frames, n_atoms - 2)).astype(np.float32)
    dihedrals = rng.uniform(-np.pi, np.pi, (n_frames, n_atoms - 3)).astype(
        np.float32
    )
    distances = rng.uniform(0.13, 0.155, (n_frames, n_atoms - 1)).astype(
        np.float32
    )
    from tests.reference_impl import backmap_np

    cart = backmap_np(distances, angles, dihedrals).astype(np.float32)
    side = rng.uniform(-np.pi, np.pi, (n_frames, 2 * n_res)).astype(np.float32)
    return {
        "central_angles": angles,
        "central_dihedrals": dihedrals,
        "central_cartesians": cart,
        "central_distances": distances,
        "side_dihedrals": side,
    }


def _params(tmp_path, **kw):
    d = dict(
        main_path=str(tmp_path),
        n_neurons=[16, 16, 2],
        n_steps=20,
        steps_per_scan=10,
        batch_size=32,
        checkpoint_step=10000,
        summary_step=100,
        seed=1,
    )
    d.update(kw)
    return ADCParameters(**d)


@pytest.fixture(scope="module")
def cvs():
    return synthetic_cvs(np.random.default_rng(0))


class TestADCTraining:
    def test_dihedrals_only(self, cvs, tmp_path):
        p = _params(tmp_path)
        emap = AngleDihedralCartesianEncoderMap(cvs, p)
        history = emap.train()
        assert np.isfinite(history["loss"]).all()
        for name in (
            "dihedral_loss", "angle_loss", "cartesian_loss", "distance_loss",
            "cartesian_distance_loss", "center_loss", "regularization_loss",
        ):
            assert name in history
        assert history["loss"][-5:].mean() < history["loss"][:5].mean()

    def test_backbone_angles(self, cvs, tmp_path):
        p = _params(tmp_path, use_backbone_angles=True)
        emap = AngleDihedralCartesianEncoderMap(cvs, p)
        history = emap.train()
        assert np.isfinite(history["loss"]).all()

    def test_sidechains(self, cvs, tmp_path):
        p = _params(tmp_path, use_backbone_angles=True, use_sidechains=True)
        emap = AngleDihedralCartesianEncoderMap(cvs, p)
        history = emap.train()
        assert "side_dihedral_loss" in history
        assert np.isfinite(history["loss"]).all()

    def test_soft_start_scale_in_history(self, cvs, tmp_path):
        p = _params(
            tmp_path, n_steps=30, steps_per_scan=10,
            cartesian_cost_scale=10.0, cartesian_cost_scale_soft_start=(10, 20),
        )
        emap = AngleDihedralCartesianEncoderMap(cvs, p)
        history = emap.train()
        scales = history["cartesian_cost_scale"]
        assert scales[0] == 0.0
        assert scales[-1] == pytest.approx(10.0)
        assert 0.0 < scales[15] < 10.0

    def test_track_metrics(self, cvs, tmp_path):
        p = _params(tmp_path, n_steps=5, steps_per_scan=5,
                    track_clashes=True, track_RMSD=True)
        emap = AngleDihedralCartesianEncoderMap(cvs, p)
        history = emap.train()
        assert "clashes" in history
        assert "rmsd" in history
        assert np.isfinite(history["rmsd"]).all()


class TestADCInference:
    def test_encode_decode_generate(self, cvs, tmp_path):
        p = _params(tmp_path, n_steps=5, steps_per_scan=5,
                    use_backbone_angles=True, use_sidechains=True)
        emap = AngleDihedralCartesianEncoderMap(cvs, p)
        emap.train()
        latent = emap.encode()
        assert latent.shape == (len(cvs["central_angles"]), 2)

        out = emap.decode(latent[:7])
        assert out[0].shape == (7, cvs["central_angles"].shape[1])
        assert out[1].shape == (7, cvs["central_dihedrals"].shape[1])
        assert out[2].shape == (7, cvs["side_dihedrals"].shape[1])

        xyz = emap.generate(latent[:3])
        assert xyz.shape == (3, cvs["central_cartesians"].shape[1], 3)
        assert np.isfinite(xyz).all()

    def test_mean_angles_when_not_trained(self, cvs, tmp_path):
        p = _params(tmp_path, n_steps=2, steps_per_scan=2)
        emap = AngleDihedralCartesianEncoderMap(cvs, p)
        emap.train()
        angles, dihedrals = emap.decode(np.zeros((4, 2), np.float32))
        expected = cvs["central_angles"].mean(0)
        np.testing.assert_allclose(angles[0], expected, atol=1e-5)

    def test_train_for_references(self, cvs, tmp_path):
        p = _params(tmp_path, n_steps=2, steps_per_scan=2)
        emap = AngleDihedralCartesianEncoderMap(cvs, p)
        refs = emap.train_for_references(maxiter=3)
        assert set(refs) == {"angle_cost", "dihedral_cost", "cartesian_cost"}
        assert all(v > 0 for v in refs.values())
        assert emap.p.cartesian_cost_reference == refs["cartesian_cost"]


class TestADCCheckpoint:
    def test_roundtrip(self, cvs, tmp_path):
        p = _params(tmp_path, n_steps=10, steps_per_scan=10)
        emap = AngleDihedralCartesianEncoderMap(cvs, p)
        emap.train()
        latent = emap.encode()

        emap2 = AngleDihedralCartesianEncoderMap.from_checkpoint(
            cvs, tmp_path
        )
        np.testing.assert_allclose(latent, emap2.encode(), atol=1e-6)
        assert int(emap2.state.step) == 10

    def test_resume_mid_soft_start(self, cvs, tmp_path):
        """save -> load -> train-more with the checkpoint landing in the
        MIDDLE of the soft-start cartesian ramp: the reloaded run must
        continue the schedule exactly where the uninterrupted run is (the
        schedule is a pure function of the checkpointed global step)."""
        soft = dict(cartesian_cost_scale=10.0,
                    cartesian_cost_scale_soft_start=(5, 25))

        # uninterrupted 30-step run as the oracle
        p_full = _params(tmp_path / "full", n_steps=30, steps_per_scan=5,
                         **soft)
        full = AngleDihedralCartesianEncoderMap(cvs, p_full)
        h_full = full.train()

        # 15 steps (mid-ramp), checkpoint, reload, train to 30
        p_a = _params(tmp_path / "resume", n_steps=15, steps_per_scan=5,
                      **soft)
        a = AngleDihedralCartesianEncoderMap(cvs, p_a)
        h_a = a.train()
        assert 0.0 < h_a["cartesian_cost_scale"][-1] < 10.0  # mid-ramp

        b = AngleDihedralCartesianEncoderMap.from_checkpoint(
            cvs, tmp_path / "resume"
        )
        assert int(b.state.step) == 15
        b.p.n_steps = 30
        h_b = b.train()
        assert int(b.state.step) == 30
        scales = np.concatenate(
            [h_a["cartesian_cost_scale"], h_b["cartesian_cost_scale"]]
        )
        np.testing.assert_allclose(
            scales, h_full["cartesian_cost_scale"], atol=1e-6
        )
        # identical data/seed/schedule -> identical loss curve across the
        # save/load boundary (optimizer state incl. Adam moments restored)
        np.testing.assert_allclose(
            np.concatenate([h_a["loss"], h_b["loss"]]), h_full["loss"],
            rtol=1e-5, atol=1e-6,
        )
