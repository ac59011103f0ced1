# tests/test_sharding.py
"""Multi-device sharding on the virtual 8-CPU mesh: dp batch parallelism,
tp tensor parallelism, and the full sharded train step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from encodermap_tpu import EncoderMap, Parameters
from encodermap_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
    shard_params_tp,
)


@pytest.fixture(scope="module")
def devices_ok():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")


class TestMesh:
    def test_make_mesh_shapes(self, devices_ok):
        mesh = make_mesh(n_devices=8, tp=2)
        assert mesh.shape == {"dp": 4, "tp": 2}
        mesh = make_mesh(n_devices=8)
        assert mesh.shape == {"dp": 8, "tp": 1}

    def test_shard_batch(self, devices_ok, rng):
        mesh = make_mesh(n_devices=8)
        x = rng.standard_normal((64, 6)).astype(np.float32)
        sharded = shard_batch(x, mesh)
        assert sharded.sharding.spec == P("dp")

    def test_sharded_train_step_matches_single_device(self, devices_ok, rng):
        """The dp-sharded train step must produce the same loss and updated
        params as the unsharded one (GSPMD only changes layout)."""
        data = rng.standard_normal((128, 6)).astype(np.float32)
        p = Parameters(
            periodicity=float("inf"), n_neurons=[16, 16, 2], batch_size=32,
            n_steps=1, steps_per_scan=1, seed=5,
        )
        emap = EncoderMap(p, data, read_only=True)
        step = emap._make_train_step()
        batch = jnp.asarray(data[:32])

        ref_state, ref_metrics = jax.jit(step)(emap.state, batch)

        mesh = make_mesh(n_devices=8, tp=2)
        params = shard_params_tp(emap.state.params, mesh)
        state = emap.state.replace(
            params=params, opt_state=emap.optimizer.init(params)
        )
        sharded_batch = shard_batch(batch, mesh)
        with mesh:
            out_state, out_metrics = jax.jit(step)(state, sharded_batch)

        assert float(out_metrics["loss"]) == pytest.approx(
            float(ref_metrics["loss"]), rel=1e-5
        )
        ref_k = np.asarray(ref_state.params["encoder"][0]["kernel"])
        out_k = np.asarray(out_state.params["encoder"][0]["kernel"])
        np.testing.assert_allclose(out_k, ref_k, atol=1e-5)

    def test_replicate(self, devices_ok, rng):
        mesh = make_mesh(n_devices=8)
        tree = {"a": jnp.ones((4, 4))}
        rep = replicate(tree, mesh)
        assert rep["a"].sharding.spec == P()


class TestGraftEntry:
    def test_entry_compiles(self):
        import __graft_entry__ as ge

        fn, args = ge.entry()
        outputs = jax.jit(fn)(*args)
        # ADC forward: (..., back_cartesians, inp_pair, out_pair, latent)
        latent = outputs[-1]
        back = outputs[3]
        assert latent.shape == (256, 2)
        assert back.shape == (256, 60, 3)
        assert np.isfinite(np.asarray(back)).all()

    def test_dryrun_multichip(self, devices_ok, capsys):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)
        assert "dryrun_multichip OK" in capsys.readouterr().out
