# tests/test_deterministic_parity.py
"""Deterministic full-model parity: identical weights in TF vs JAX.

The analog of the reference's TF1-vs-TF2 harness
(``tests/test_tf1_tf2_deterministic.py``): build a TF/Keras MLP autoencoder
with the reference's architecture semantics, copy OUR model's weights into
it, evaluate the complete EncoderMap loss stack on both sides using the
reference's own distance/sigmoid math (imported from the read-only mount)
— every loss must agree within 1e-5.
"""

import importlib.util
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = Path("/root/reference/encodermap")


@pytest.fixture(scope="module")
def tf():
    return pytest.importorskip("tensorflow")


@pytest.fixture(scope="module")
def ref_distances():
    if not REF.exists():
        pytest.skip("reference not mounted")
    spec = importlib.util.spec_from_file_location(
        "ref_distances", REF / "misc/distances.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _build_tf_twin(tf, params, p):
    """A TF function applying the same MLP with OUR weights: periodic
    sin/cos fold-in, tanh stack, atan2 fold-out — the reference
    SequentialModel's encoder()/decoder() semantics (``models.py:3331-3359``).
    """
    from encodermap_tpu.models.sequential import layer_stack

    enc_layers, dec_layers, _ = layer_stack(p, input_dim=p_input_dim(params, p))
    enc_acts = [a for _, a in enc_layers]
    dec_acts = [a for _, a in dec_layers]

    def apply_stack(x, layers, acts):
        for lp, act in zip(layers, acts):
            x = tf.matmul(x, np.asarray(lp["kernel"])) + np.asarray(lp["bias"])
            if act == "tanh":
                x = tf.tanh(x)
            elif act == "relu":
                x = tf.nn.relu(x)
        return x

    def encode(x):
        if p.periodicity < float("inf"):
            if p.periodicity != 2 * np.pi:
                x = x / p.periodicity * 2 * np.pi
            x = tf.concat([tf.sin(x), tf.cos(x)], 1)
        return apply_stack(x, params["encoder"], enc_acts)

    def decode(z):
        x = apply_stack(z, params["decoder"], dec_acts)
        if p.periodicity < float("inf"):
            s, c = tf.split(x, 2, 1)
            x = tf.atan2(s, c)
            if p.periodicity != 2 * np.pi:
                x = x / (2 * np.pi) * p.periodicity
        return x

    return encode, decode


def p_input_dim(params, p):
    eff = params["encoder"][0]["kernel"].shape[0]
    return eff // 2 if p.periodicity < float("inf") else eff


class TestDeterministicParity:
    @pytest.mark.parametrize("periodic", [False, True])
    def test_full_loss_stack(self, tf, ref_distances, rng, periodic):
        from encodermap_tpu import EncoderMap, Parameters

        p = Parameters(
            main_path="/tmp/parity_run",
            periodicity=(2 * np.pi) if periodic else float("inf"),
            n_neurons=[32, 32, 2],
            seed=11,
        )
        if periodic:
            data = rng.uniform(-np.pi, np.pi, (96, 8)).astype(np.float32)
        else:
            data = rng.standard_normal((96, 8)).astype(np.float32)
        emap = EncoderMap(p, data, read_only=True)
        params = jax.device_get(emap.state.params)

        # ---- our side
        batch = jnp.asarray(data)
        ours = {
            k: float(v)
            for k, v in emap._loss_terms(emap.state.params, batch).items()
        }

        # ---- TF twin with the same weights + the REFERENCE's loss math
        encode, decode = _build_tf_twin(tf, params, p)
        x = tf.convert_to_tensor(data)
        latent = encode(x)
        out = decode(latent)

        # auto loss (mean_abs periodic distance, reference loss_functions)
        d = ref_distances.periodic_distance(
            tf.cast(x, tf.float32), tf.cast(out, tf.float32), p.periodicity
        )
        auto_tf = float(tf.reduce_mean(tf.abs(d))) * p.auto_cost_scale

        # center loss
        center_tf = float(tf.reduce_mean(tf.square(latent))) * p.center_cost_scale

        # regularization: l2 constant * sum of squared kernels
        reg_tf = p.l2_reg_constant * sum(
            float(np.sum(np.asarray(lp["kernel"]) ** 2))
            for stack in ("encoder", "decoder")
            for lp in params[stack]
        )

        # sigmoid distance loss via the reference's sigmoid + pairwise dists
        sig_h, a_h, b_h, sig_l, a_l, b_l = p.dist_sig_parameters
        if p.periodicity == float("inf"):
            dist_h = ref_distances.pairwise_dist(x)
        else:
            dist_h = ref_distances.pairwise_dist_periodic(x, p.periodicity)
        dist_l = ref_distances.pairwise_dist(latent)
        s_h = ref_distances.sigmoid(sig_h, a_h, b_h)(dist_h)
        s_l = ref_distances.sigmoid(sig_l, a_l, b_l)(dist_l)
        distance_tf = float(
            tf.reduce_mean(tf.square(s_h - s_l))
        ) * p.distance_cost_scale

        assert ours["auto_loss"] == pytest.approx(auto_tf, abs=1e-5)
        assert ours["center_loss"] == pytest.approx(center_tf, abs=1e-7)
        assert ours["regularization_loss"] == pytest.approx(reg_tf, rel=1e-5)
        assert ours["distance_loss"] == pytest.approx(distance_tf, abs=1e-4), (
            ours["distance_loss"], distance_tf,
        )

    def test_forward_outputs_match(self, tf, rng):
        """Encoder/decoder outputs themselves agree elementwise (needs
        only the TF twin, not the reference mount)."""
        from encodermap_tpu import EncoderMap, Parameters
        from encodermap_tpu.models import sequential as seq

        p = Parameters(
            main_path="/tmp/parity_run2", periodicity=2 * np.pi,
            n_neurons=[16, 16, 2], seed=3,
        )
        data = rng.uniform(-np.pi, np.pi, (32, 6)).astype(np.float32)
        emap = EncoderMap(p, data, read_only=True)
        params = jax.device_get(emap.state.params)
        encode, decode = _build_tf_twin(tf, params, p)

        ours_latent = np.asarray(
            seq.encode(emap.state.params, p, jnp.asarray(data))
        )
        tf_latent = np.asarray(encode(tf.convert_to_tensor(data)))
        np.testing.assert_allclose(ours_latent, tf_latent, atol=2e-6)

        ours_out = np.asarray(
            seq.decode(emap.state.params, p, jnp.asarray(ours_latent))
        )
        tf_out = np.asarray(decode(tf.convert_to_tensor(tf_latent)))
        np.testing.assert_allclose(ours_out, tf_out, atol=2e-5)
