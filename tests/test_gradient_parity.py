# tests/test_gradient_parity.py
"""Gradient-level parity vs the reference's own loss math.

Value parity (test_deterministic_parity.py) proves the forward program;
this file proves the BACKWARD: ``jax.grad`` of our jitted loss stack must
match ``tf.GradientTape`` through a TF twin that uses the reference's own
distance/sigmoid functions (imported from the read-only mount) and OUR
weights as ``tf.Variable``s. This is the test class that would have caught
the fused-kernel sigmoid-derivative coefficient bug (grads 2-4x off for
a != 2 while all default-parameter value tests passed) — so the sigmoid
parameters are RANDOMIZED here, not left at defaults.

Reference math: ``encodermap/misc/distances.py`` (sigmoid/pairwise_dist/
pairwise_dist_periodic/periodic_distance), loss assembly
``encodermap/loss_functions/loss_functions.py:300-500``.
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
        "ref_distances_grad", REF / "misc/distances.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _tf_twin_variables(tf, params):
    """OUR weights as tf.Variables (so GradientTape can reach them),
    preserving the encoder/decoder pytree structure."""
    tf_params = {
        stack: [
            {
                "kernel": tf.Variable(np.asarray(lp["kernel"])),
                "bias": tf.Variable(np.asarray(lp["bias"])),
            }
            for lp in params[stack]
        ]
        for stack in ("encoder", "decoder")
    }
    flat = [
        v
        for stack in ("encoder", "decoder")
        for lp in tf_params[stack]
        for v in (lp["kernel"], lp["bias"])
    ]
    return tf_params, flat


def _tf_forward(tf, tf_params, p, acts, x):
    """The reference SequentialModel's encoder()/decoder() semantics
    (``models.py:3331-3359``) on tf.Variables."""
    enc_acts, dec_acts = acts

    def apply_stack(x, layers, acts):
        for lp, act in zip(layers, acts):
            x = tf.matmul(x, lp["kernel"]) + lp["bias"]
            if act == "tanh":
                x = tf.tanh(x)
            elif act == "relu":
                x = tf.nn.relu(x)
        return x

    if p.periodicity < float("inf"):
        xin = x
        if p.periodicity != 2 * np.pi:
            xin = xin / p.periodicity * 2 * np.pi
        xin = tf.concat([tf.sin(xin), tf.cos(xin)], 1)
    else:
        xin = x
    latent = apply_stack(xin, tf_params["encoder"], enc_acts)
    out = apply_stack(latent, tf_params["decoder"], dec_acts)
    if p.periodicity < float("inf"):
        s, c = tf.split(out, 2, 1)
        out = tf.atan2(s, c)
        if p.periodicity != 2 * np.pi:
            out = out / (2 * np.pi) * p.periodicity
    return latent, out


def _tf_total_loss(tf, ref_distances, p, x, latent, out, tf_params):
    """The reference's EncoderMap loss stack assembled from its own
    distance/sigmoid modules (``loss_functions.py:300-500``)."""
    d = ref_distances.periodic_distance(
        tf.cast(x, tf.float32), tf.cast(out, tf.float32), p.periodicity
    )
    auto = tf.reduce_mean(tf.abs(d)) * p.auto_cost_scale
    center = tf.reduce_mean(tf.square(latent)) * p.center_cost_scale
    reg = p.l2_reg_constant * tf.add_n(
        [
            tf.reduce_sum(tf.square(lp["kernel"]))
            for stack in ("encoder", "decoder")
            for lp in tf_params[stack]
        ]
    )
    sig_h, a_h, b_h, sig_l, a_l, b_l = p.dist_sig_parameters
    if p.periodicity == float("inf"):
        dist_h = ref_distances.pairwise_dist(x)
    else:
        dist_h = ref_distances.pairwise_dist_periodic(x, p.periodicity)
    dist_l = ref_distances.pairwise_dist(latent)
    s_h = ref_distances.sigmoid(sig_h, a_h, b_h)(dist_h)
    s_l = ref_distances.sigmoid(sig_l, a_l, b_l)(dist_l)
    distance = tf.reduce_mean(tf.square(s_h - s_l)) * p.distance_cost_scale
    return auto + center + reg + distance


def _flatten_jax_grads(params):
    flat = []
    for stack in ("encoder", "decoder"):
        for lp in params[stack]:
            flat.append(np.asarray(lp["kernel"]))
            flat.append(np.asarray(lp["bias"]))
    return flat


def _assert_grads_close(ours, theirs, rtol):
    """Per-leaf comparison scaled by the leaf's own grad magnitude — an
    absolute elementwise tolerance would vacuously pass on small-grad
    leaves and be impossibly strict on large ones."""
    assert len(ours) == len(theirs)
    for i, (g_j, g_t) in enumerate(zip(ours, theirs)):
        g_j, g_t = np.asarray(g_j), np.asarray(g_t)
        # a sigmoid exponent a < 1 has a divergent derivative at r = 0, so
        # the diagonal NaNs — in BOTH frameworks. Parity = same NaN mask,
        # finite entries close.
        nan_j, nan_t = np.isnan(g_j), np.isnan(g_t)
        assert (nan_j == nan_t).all(), f"leaf {i}: NaN masks differ"
        g_j, g_t = g_j[~nan_j], g_t[~nan_t]
        scale = max(np.abs(g_t).max(), 1e-8) if g_t.size else 1.0
        err = np.abs(g_j - g_t).max() / scale if g_t.size else 0.0
        assert err < rtol, (
            f"leaf {i}: max rel-to-leaf-scale grad error {err:.2e} "
            f"(scale {scale:.3e})"
        )


CONFIGS = [
    # (periodic, dist_sig_parameters, n_neurons, activations, seed)
    (False, (4.5, 12, 6, 1, 2, 6), [32, 32, 2], None, 0),      # defaults
    (True, (4.5, 12, 6, 1, 2, 6), [32, 32, 2], None, 1),
    (False, (3.1, 7.0, 4.0, 0.8, 1.3, 9.0), [16, 24, 2], None, 2),  # a != 2
    (True, (6.2, 3.0, 2.5, 1.7, 4.0, 3.0), [24, 2],
     ["", "tanh", ""], 3),
    (False, (1.0, 2.0, 2.0, 1.0, 2.0, 2.0), [8, 8, 8, 2],
     ["", "tanh", "tanh", "tanh", ""], 4),  # a == b
]


class TestGradientParity:
    @pytest.mark.parametrize("periodic,sig,neurons,acts,seed", CONFIGS)
    def test_full_loss_grad_wrt_params(
        self, tf, ref_distances, periodic, sig, neurons, acts, seed
    ):
        from encodermap_tpu import EncoderMap, Parameters
        from encodermap_tpu.models.sequential import layer_stack

        kw = {} if acts is None else {"activation_functions": list(acts)}
        p = Parameters(
            main_path=f"/tmp/grad_parity_{seed}",
            periodicity=(2 * np.pi) if periodic else float("inf"),
            n_neurons=list(neurons),
            dist_sig_parameters=sig,
            seed=100 + seed,
            **kw,
        )
        rng = np.random.default_rng(seed)
        if periodic:
            data = rng.uniform(-np.pi, np.pi, (64, 8)).astype(np.float32)
        else:
            data = rng.standard_normal((64, 8)).astype(np.float32)
        emap = EncoderMap(p, data, read_only=True)
        params = jax.device_get(emap.state.params)
        batch = jnp.asarray(data)

        # ---- our gradient: jax.grad of the summed jitted loss terms
        def total(prm):
            terms = emap._loss_terms(prm, batch)
            return sum(
                v for k, v in terms.items() if k not in emap._metrics_only
            )

        ours = _flatten_jax_grads(jax.grad(total)(emap.state.params))

        # ---- reference gradient: GradientTape through the TF twin
        input_dim = data.shape[1]
        enc_layers, dec_layers, _ = layer_stack(p, input_dim=input_dim)
        acts = ([a for _, a in enc_layers], [a for _, a in dec_layers])
        tf_params, flat_vars = _tf_twin_variables(tf, params)
        x = tf.convert_to_tensor(data)
        with tf.GradientTape() as tape:
            latent, out = _tf_forward(tf, tf_params, p, acts, x)
            loss = _tf_total_loss(
                tf, ref_distances, p, x, latent, out, tf_params
            )
        theirs = tape.gradient(loss, flat_vars)

        # f32 forward + two independent AD systems: 1e-3 of the leaf's own
        # max-grad is far below the 2-4x error class this test targets.
        _assert_grads_close(ours, theirs, rtol=1e-3)

    def test_sigmoid_loss_grad_wrt_inputs(self, tf, ref_distances):
        """d(sigmoid_loss)/d(highd, latent) directly — the quantity the
        fused-kernel bug corrupted — across an (a, b) grid."""
        from encodermap_tpu import Parameters
        from encodermap_tpu import losses as L

        rng = np.random.default_rng(7)
        highd = rng.standard_normal((48, 10)).astype(np.float32)
        latent = rng.standard_normal((48, 2)).astype(np.float32)

        for a_h, b_h, a_l, b_l in [
            (12.0, 6.0, 2.0, 6.0),
            (5.0, 3.0, 1.5, 2.0),
            (2.0, 2.0, 2.0, 2.0),
            (9.0, 1.5, 0.7, 4.0),
        ]:
            p = Parameters(
                main_path="/tmp/grad_parity_sig",
                periodicity=float("inf"),
                dist_sig_parameters=(4.5, a_h, b_h, 1.0, a_l, b_l),
            )

            g_h, g_l = jax.grad(
                lambda h, l: L.distance_loss(h, l, p), argnums=(0, 1)
            )(jnp.asarray(highd), jnp.asarray(latent))

            xh = tf.Variable(highd)
            xl = tf.Variable(latent)
            with tf.GradientTape() as tape:
                s_h = ref_distances.sigmoid(4.5, a_h, b_h)(
                    ref_distances.pairwise_dist(xh)
                )
                s_l = ref_distances.sigmoid(1.0, a_l, b_l)(
                    ref_distances.pairwise_dist(xl)
                )
                loss = (
                    tf.reduce_mean(tf.square(s_h - s_l))
                    * p.distance_cost_scale
                )
            t_h, t_l = tape.gradient(loss, [xh, xl])

            _assert_grads_close(
                [np.asarray(g_h), np.asarray(g_l)], [t_h, t_l], rtol=1e-3
            )
