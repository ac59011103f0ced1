# tests/test_reference_parity.py
"""Numerical parity against the ACTUAL reference implementation.

The reference's pure-math modules (``misc/distances.py`` and
``encodermap_tf1/misc.py``) import with only numpy+tensorflow, so we load
them straight from the read-only mount and use them as oracles — the
EncoderMap-TPU kernels must reproduce their values within 1e-5, the
BASELINE.md loss-parity target. (This mirrors the reference's own
TF1-vs-TF2 determinism suite, ``tests/test_tf1_tf2_deterministic.py``.)
"""

import importlib.util
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

REF = Path("/root/reference/encodermap")


def _load(name: str, rel: str):
    spec = importlib.util.spec_from_file_location(name, REF / rel)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_distances():
    if not REF.exists():
        pytest.skip("reference not mounted")
    tf = pytest.importorskip("tensorflow")  # noqa: F841
    return _load("ref_distances", "misc/distances.py")


@pytest.fixture(scope="module")
def ref_tf1_misc():
    if not REF.exists():
        pytest.skip("reference not mounted")
    pytest.importorskip("tensorflow")
    return _load("ref_tf1_misc", "encodermap_tf1/misc.py")


class TestDistanceParity:
    def test_pairwise_dist(self, ref_distances, rng):
        from encodermap_tpu.ops.distances import pairwise_dist

        x = rng.standard_normal((64, 10)).astype(np.float32)
        ref = np.asarray(ref_distances.pairwise_dist(x))
        ours = np.asarray(pairwise_dist(jnp.asarray(x)))
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_pairwise_dist_flat(self, ref_distances, rng):
        from encodermap_tpu.ops.distances import pairwise_dist

        x = rng.standard_normal((32, 4)).astype(np.float32)
        ref = np.asarray(ref_distances.pairwise_dist(x, flat=True))
        ours = np.asarray(pairwise_dist(jnp.asarray(x), flat=True))
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_pairwise_dist_periodic(self, ref_distances, rng):
        from encodermap_tpu.ops.distances import pairwise_dist_periodic

        x = rng.uniform(-np.pi, np.pi, (48, 8)).astype(np.float32)
        ref = np.asarray(ref_distances.pairwise_dist_periodic(x, 2 * np.pi))
        ours = np.asarray(pairwise_dist_periodic(jnp.asarray(x), 2 * np.pi))
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_periodic_distance(self, ref_distances, rng):
        from encodermap_tpu.ops.distances import periodic_distance

        a = rng.uniform(-np.pi, np.pi, (20, 5)).astype(np.float32)
        b = rng.uniform(-np.pi, np.pi, (20, 5)).astype(np.float32)
        ref = np.asarray(ref_distances.periodic_distance(
            jnp_to_tf(a), jnp_to_tf(b)
        ))
        ours = np.asarray(periodic_distance(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    @pytest.mark.parametrize("params", [(4.5, 12, 6), (1, 2, 6)])
    def test_sigmoid(self, ref_distances, rng, params):
        from encodermap_tpu.ops.distances import sigmoid

        r = rng.uniform(0.01, 10, 200).astype(np.float32)
        ref = np.asarray(ref_distances.sigmoid(*params)(r.astype(np.float64)))
        ours = np.asarray(sigmoid(*params)(jnp.asarray(r)))
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)


class TestLossParity:
    def test_full_sigmoid_loss_vs_tf1_distance_cost(self, ref_tf1_misc, rng):
        """The complete sketch-map cost (periodic high-D vs latent) against
        the reference's TF ``distance_cost`` with default sigmoid params."""
        from encodermap_tpu.losses import sigmoid_loss

        params = (4.5, 12, 6, 1, 2, 6)
        h = rng.uniform(-np.pi, np.pi, (128, 12)).astype(np.float32)
        l = rng.standard_normal((128, 2)).astype(np.float32)
        ref = float(
            np.asarray(
                ref_tf1_misc.distance_cost(h, l, *params, 2 * np.pi)
            )
        )
        ours = float(sigmoid_loss(jnp.asarray(h), jnp.asarray(l), params,
                                  2 * np.pi))
        assert ours == pytest.approx(ref, abs=1e-5)

    def test_nonperiodic_loss(self, ref_tf1_misc, rng):
        from encodermap_tpu.losses import sigmoid_loss

        params = (4.5, 12, 6, 1, 2, 6)
        h = rng.standard_normal((96, 20)).astype(np.float32)
        l = rng.standard_normal((96, 2)).astype(np.float32)
        ref = float(
            np.asarray(
                ref_tf1_misc.distance_cost(h, l, *params, float("inf"))
            )
        )
        ours = float(
            sigmoid_loss(jnp.asarray(h), jnp.asarray(l), params, float("inf"))
        )
        assert ours == pytest.approx(ref, abs=1e-5)


    def test_cartesian_distance_loss_matrix_vs_reference_at_lysozyme_scale(
        self, ref_tf1_misc, ref_distances, rng
    ):
        """The production ADC path's matrix-form CA-pair sigmoid cost
        (dense rows + sqrt(2)-scaled sigma, routed in for >= 64 CAs) must
        reproduce the REFERENCE's flat-pair pipeline — reference
        pairwise_dist(flat=True) feeding the TF distance cost — at the
        158-CA scale where the matrix form is actually used."""
        from encodermap_tpu import ADCParameters
        from encodermap_tpu.losses import cartesian_distance_loss_matrix
        from encodermap_tpu.ops.distances import pairwise_dist

        p = ADCParameters()
        pos = rng.uniform(0, 6, (64, 158, 3)).astype(np.float32)
        latent = rng.standard_normal((64, 2)).astype(np.float32)

        h_ref = np.asarray(ref_distances.pairwise_dist(pos, flat=True))
        ref = float(
            np.asarray(
                ref_tf1_misc.distance_cost(
                    h_ref, latent, *p.cartesian_dist_sig_parameters,
                    float("inf"),
                )
            )
        )
        ours = float(
            cartesian_distance_loss_matrix(
                pairwise_dist(jnp.asarray(pos)), jnp.asarray(latent), p
            )
        ) / p.cartesian_distance_cost_scale
        assert ours == pytest.approx(ref, abs=1e-5)


def jnp_to_tf(x):
    import tensorflow as tf

    return tf.convert_to_tensor(x)
