# tests/test_loss_classes.py
"""The experimental @testing-gated loss-class family (reference
``loss_functions/loss_classes.py:75-349``)."""

import numpy as np
import pytest

import encodermap_tpu as em
from encodermap_tpu import losses as L


class TestGate:
    def test_instantiation_gated(self, monkeypatch):
        from encodermap_tpu.loss_classes import DihedralLoss

        monkeypatch.delenv("ENCODERMAP_TESTING", raising=False)
        with pytest.raises(Exception, match="ENCODERMAP_TESTING"):
            DihedralLoss()

    def test_function_gate(self, monkeypatch):
        from encodermap_tpu.loss_classes import testing

        @testing
        def f():
            return 42

        monkeypatch.delenv("ENCODERMAP_TESTING", raising=False)
        with pytest.raises(Exception, match="ENCODERMAP_TESTING"):
            f()
        monkeypatch.setenv("ENCODERMAP_TESTING", "True")
        assert f() == 42


class TestLossClasses:
    @pytest.fixture(autouse=True)
    def _enable(self, monkeypatch):
        monkeypatch.setenv("ENCODERMAP_TESTING", "True")

    def test_call_matches_pure_function(self):
        from encodermap_tpu.loss_classes import AngleLoss, DihedralLoss

        rng = np.random.default_rng(0)
        a = rng.uniform(-np.pi, np.pi, (8, 12)).astype(np.float32)
        b = rng.uniform(-np.pi, np.pi, (8, 12)).astype(np.float32)
        p = em.ADCParameters()
        assert float(DihedralLoss(p)(a, b)) == pytest.approx(
            float(L.dihedral_loss(a, b, p))
        )
        assert float(AngleLoss(p)(a, b)) == pytest.approx(
            float(L.angle_loss(a, b, p))
        )

    def test_config_roundtrip(self):
        from encodermap_tpu.loss_classes import DihedralLoss

        p = em.ADCParameters(dihedral_cost_scale=3.5)
        loss = DihedralLoss(p)
        cfg = loss.get_config()
        clone = DihedralLoss.from_config(cfg)
        assert isinstance(clone.p, em.ADCParameters)
        assert clone.p.dihedral_cost_scale == 3.5
        # from_config must not mutate the caller's dict: a stored config
        # can build several instances
        clone2 = DihedralLoss.from_config(cfg)
        assert clone2.p.dihedral_cost_scale == 3.5

    def test_attach_guards(self):
        """attach() rejects model families whose batch layout it does not
        understand instead of silently pairing wrong arrays."""
        from encodermap_tpu.loss_classes import SideDihedralLoss

        class FakeEmap:
            p = em.ADCParameters(use_sidechains=False)

        with pytest.raises(ValueError, match="use_sidechains"):
            SideDihedralLoss(FakeEmap.p).attach(FakeEmap())

        class FakeScEmap:
            p = em.ADCParameters(
                reconstruct_sidechains=True, sidechain_info={1: 2}
            )

        with pytest.raises(ValueError, match="reconstruct_sidechains"):
            SideDihedralLoss(FakeScEmap.p).attach(FakeScEmap())

    def test_attach_reports_term_equal_to_builtin(self):
        """attach() registers the class as a custom loss; its per-step value
        equals the built-in dihedral term computed with the same params."""
        from encodermap_tpu.loss_classes import DihedralLoss
        from encodermap_tpu.train.adc_autoencoder import (
            AngleDihedralCartesianEncoderMap,
        )
        from tests.reference_impl import backmap_np

        rng = np.random.default_rng(0)
        n_res, F = 5, 64
        na = 3 * n_res
        angles = rng.uniform(1.6, 2.4, (F, na - 2)).astype(np.float32)
        dihedrals = rng.uniform(-np.pi, np.pi, (F, na - 3)).astype(np.float32)
        distances = rng.uniform(0.13, 0.155, (F, na - 1)).astype(np.float32)
        cart = backmap_np(distances, angles, dihedrals).astype(np.float32)
        side = rng.uniform(-np.pi, np.pi, (F, 2 * n_res)).astype(np.float32)
        cvs = {
            "central_angles": angles, "central_dihedrals": dihedrals,
            "central_cartesians": cart, "central_distances": distances,
            "side_dihedrals": side,
        }
        p = em.ADCParameters(
            batch_size=16, n_steps=2, steps_per_scan=1,
            use_backbone_angles=True, use_sidechains=True,
            n_neurons=[8, 8, 2], seed=0,
        )
        emap = AngleDihedralCartesianEncoderMap(cvs, p, read_only=True)
        DihedralLoss(p).attach(emap)
        h = emap.train()
        np.testing.assert_allclose(
            h["dihedral_loss_class"], h["dihedral_loss"], rtol=1e-6
        )
