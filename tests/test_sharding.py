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


class TestDistributedHelpers:
    """Multi-host runtime helpers (single-process semantics testable here;
    the pod path shares the same code through
    jax.make_array_from_process_local_data)."""

    def test_initialize_noop_single_process(self):
        from encodermap_tpu.parallel import initialize

        initialize()  # no coordinator in env -> must be a silent no-op
        initialize()  # idempotent
        assert jax.process_count() == 1

    def test_is_primary_and_gate(self):
        from encodermap_tpu.parallel import is_primary, primary_only

        assert is_primary()
        calls = []

        @primary_only
        def write(x):
            calls.append(x)
            return x

        assert write(3) == 3
        assert calls == [3]

    def test_process_local_slice_partitions(self):
        from encodermap_tpu.parallel import process_local_slice

        s = process_local_slice(103)
        assert s == slice(0, 103)  # single process owns everything

    def test_host_local_batch(self):
        from encodermap_tpu.parallel import global_mesh, host_local_batch

        mesh = global_mesh(tp=1)
        rng = np.random.default_rng(0)
        x = rng.standard_normal((16, 5)).astype(np.float32)
        y = rng.standard_normal((16,)).astype(np.float32)
        gx, gy = host_local_batch((x, y), mesh)
        assert gx.shape == (16, 5)
        assert len(gx.sharding.device_set) == len(jax.devices())
        np.testing.assert_array_equal(np.asarray(gx), x)
        np.testing.assert_array_equal(np.asarray(gy), y)

    def test_metrics_writer_primary_gating(self, tmp_path, monkeypatch):
        """A non-primary process writes nothing at all."""
        import encodermap_tpu.misc.summaries as summaries

        monkeypatch.setattr(
            "encodermap_tpu.parallel.distributed.is_primary", lambda: False
        )
        w = summaries.MetricsWriter(tmp_path / "secondary")
        w.write_scalars(0, {"loss": 1.0})
        w.close()
        assert not (tmp_path / "secondary").exists()

        monkeypatch.undo()
        w = summaries.MetricsWriter(tmp_path / "primary")
        w.write_scalars(0, {"loss": 1.0})
        w.close()
        assert (tmp_path / "primary" / "train_metrics.jsonl").exists()


class TestMeshShapeParameter:
    """p.mesh_shape drives data-parallel training end-to-end (the config
    surface for the dp x tp scale-out path)."""

    def test_encodermap_trains_on_mesh(self, tmp_path, devices_ok):
        import encodermap_tpu as em

        data, _ = em.create_n_cube(3, points_along_edge=40, seed=0)
        p = em.Parameters(
            main_path=str(tmp_path), periodicity=float("inf"),
            n_neurons=[16, 16, 2], n_steps=10, steps_per_scan=5,
            batch_size=32, seed=0, mesh_shape={"dp": 8},
        )
        emap = em.EncoderMap(p, data.astype(np.float32))
        assert emap.mesh is not None
        assert emap._maybe_fused_trainer(5) is None  # mesh -> general path
        dev = emap._device_data()
        assert len(dev.sharding.device_set) == 8
        h = emap.train()
        assert np.isfinite(h["loss"]).all()

    def _adc_cvs(self, rng, n_res=4, F=64, side=True):
        from tests.reference_impl import backmap_np

        n_atoms = 3 * n_res
        angles = rng.uniform(1.6, 2.4, (F, n_atoms - 2)).astype(np.float32)
        dihedrals = rng.uniform(-np.pi, np.pi, (F, n_atoms - 3)).astype(
            np.float32)
        distances = rng.uniform(0.13, 0.155, (F, n_atoms - 1)).astype(
            np.float32)
        cart = backmap_np(distances, angles, dihedrals).astype(np.float32)
        cvs = dict(central_angles=angles, central_dihedrals=dihedrals,
                   central_cartesians=cart, central_distances=distances)
        if side:
            cvs["side_dihedrals"] = rng.uniform(
                -np.pi, np.pi, (F, 2 * n_res)).astype(np.float32)
        return cvs

    def test_sharded_adc_step_matches_single_device(self, devices_ok, rng):
        """The flagship ADC train step — scan backmap, all 8 losses,
        soft-start — on a dp=4 x tp=2 mesh must reproduce the single-device
        loss and updated params (GSPMD only changes layout). This is the
        SURVEY 2.8 composition proof: batch dp sharding over the
        associative-scan backmapping chain."""
        import encodermap_tpu as em
        from encodermap_tpu.train.adc_autoencoder import (
            AngleDihedralCartesianEncoderMap,
        )

        cvs = self._adc_cvs(rng)
        p = em.ADCParameters(
            batch_size=32, use_backbone_angles=True, use_sidechains=True,
            n_neurons=[16, 16, 2], seed=7,
            cartesian_cost_scale_soft_start=(0, 4),
        )
        emap = AngleDihedralCartesianEncoderMap(cvs, p, read_only=True)
        step = emap._make_train_step()
        order = ("central_angles", "central_dihedrals", "central_cartesians",
                 "central_distances", "side_dihedrals")
        batch = tuple(jnp.asarray(cvs[k][:32]) for k in order)

        ref_state, ref_metrics = jax.jit(step)(emap.state, batch)

        mesh = make_mesh(n_devices=8, tp=2)
        params = shard_params_tp(emap.state.params, mesh)
        state = emap.state.replace(
            params=params, opt_state=emap.optimizer.init(params)
        )
        sharded_batch = shard_batch(batch, mesh)
        with mesh:
            out_state, out_metrics = jax.jit(step)(state, sharded_batch)

        for k in ref_metrics:
            assert float(out_metrics[k]) == pytest.approx(
                float(ref_metrics[k]), rel=1e-5, abs=1e-7
            ), k
        for ref_l, out_l in zip(
            ref_state.params["encoder"] + ref_state.params["decoder"],
            out_state.params["encoder"] + out_state.params["decoder"],
        ):
            np.testing.assert_allclose(
                np.asarray(out_l["kernel"]), np.asarray(ref_l["kernel"]),
                atol=1e-5,
            )

    def test_sharded_adc_step_analytic_route(self, devices_ok, rng,
                                             monkeypatch):
        """Same proof for the >=320-atom analytic cartesian route
        (ops/cartesian_analytic): its input-row Gram is a cross-shard
        (B, n^2) x (n^2, B) contraction over the dp axis and the
        custom-VJP backward must transpose correctly under GSPMD."""
        import encodermap_tpu as em
        from encodermap_tpu.train.adc_autoencoder import (
            AngleDihedralCartesianEncoderMap,
        )

        monkeypatch.setattr(
            "encodermap_tpu.train.adc_autoencoder.MIN_ANALYTIC_ATOMS", 1
        )
        cvs = self._adc_cvs(rng)
        p = em.ADCParameters(
            batch_size=32, use_backbone_angles=True, use_sidechains=True,
            n_neurons=[16, 16, 2], seed=7,
            cartesian_cost_scale_soft_start=(0, 4),
        )
        emap = AngleDihedralCartesianEncoderMap(cvs, p, read_only=True)
        step = emap._make_train_step()
        order = ("central_angles", "central_dihedrals", "central_cartesians",
                 "central_distances", "side_dihedrals")
        batch = tuple(jnp.asarray(cvs[k][:32]) for k in order)

        ref_state, ref_metrics = jax.jit(step)(emap.state, batch)

        mesh = make_mesh(n_devices=8, tp=2)
        params = shard_params_tp(emap.state.params, mesh)
        state = emap.state.replace(
            params=params, opt_state=emap.optimizer.init(params)
        )
        sharded_batch = shard_batch(batch, mesh)
        with mesh:
            out_state, out_metrics = jax.jit(step)(state, sharded_batch)

        for k in ref_metrics:
            assert float(out_metrics[k]) == pytest.approx(
                float(ref_metrics[k]), rel=1e-5, abs=1e-7
            ), k
        for ref_l, out_l in zip(
            ref_state.params["encoder"] + ref_state.params["decoder"],
            out_state.params["encoder"] + out_state.params["decoder"],
        ):
            np.testing.assert_allclose(
                np.asarray(out_l["kernel"]), np.asarray(ref_l["kernel"]),
                atol=1e-5,
            )

    def test_sharded_adc_mean_angles_cross_shard(self, devices_ok, rng):
        """use_backbone_angles=False routes the MeanAngles batch mean — a
        cross-shard reduction over the dp axis — into the backmap chain; the
        sharded loss must still match single-device."""
        import encodermap_tpu as em
        from encodermap_tpu.train.adc_autoencoder import (
            AngleDihedralCartesianEncoderMap,
        )

        cvs = self._adc_cvs(rng, side=False)
        p = em.ADCParameters(
            batch_size=32, use_backbone_angles=False, use_sidechains=False,
            n_neurons=[16, 16, 2], seed=3,
        )
        emap = AngleDihedralCartesianEncoderMap(cvs, p, read_only=True)
        step = emap._make_train_step()
        order = ("central_angles", "central_dihedrals", "central_cartesians",
                 "central_distances")
        batch = tuple(jnp.asarray(cvs[k][:32]) for k in order)

        ref_state, ref_metrics = jax.jit(step)(emap.state, batch)

        mesh = make_mesh(n_devices=8)  # pure dp: every reduction crosses shards
        state = emap.state.replace(
            params=jax.tree_util.tree_map(
                lambda x: jax.device_put(x, NamedSharding(mesh, P())),
                emap.state.params,
            )
        )
        sharded_batch = shard_batch(batch, mesh)
        with mesh:
            out_state, out_metrics = jax.jit(step)(state, sharded_batch)

        assert float(out_metrics["loss"]) == pytest.approx(
            float(ref_metrics["loss"]), rel=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out_state.params["encoder"][0]["kernel"]),
            np.asarray(ref_state.params["encoder"][0]["kernel"]),
            atol=1e-5,
        )

    def test_sharded_sidechain_reconstruction_step(self, devices_ok):
        """The 7-input reconstruct_sidechains model (three-phase sidechain
        backmap scan) also reproduces single-device loss/params when
        dp-sharded."""
        import jax as _jax

        import encodermap_tpu as em
        from encodermap_tpu.ops.backmap_sidechains import backmap_sidechains
        from encodermap_tpu.train.adc_autoencoder import (
            AngleDihedralCartesianEncoderMap,
        )
        from tests.test_sidechain_reconstruction import INFO, _random_inputs

        rng = np.random.default_rng(4)
        spec, inputs = _random_inputs(rng, INFO, B=32)
        cd, ca, cdi, sd, sa, sdi = inputs
        xyz = np.asarray(
            _jax.jit(lambda *a: backmap_sidechains(spec, *a))(*inputs)
        )
        cvs = {
            "central_angles": ca, "central_dihedrals": cdi,
            "all_cartesians": xyz, "central_distances": cd,
            "side_angles": sa, "side_dihedrals": sdi, "side_distances": sd,
        }
        p = em.ADCParameters(
            n_neurons=[16, 16, 2], batch_size=32,
            reconstruct_sidechains=True, sidechain_info=INFO,
            use_backbone_angles=True, use_sidechains=True, seed=0,
        )
        emap = AngleDihedralCartesianEncoderMap(cvs, p, read_only=True)
        step = emap._make_train_step()
        order = ("central_angles", "central_dihedrals", "all_cartesians",
                 "central_distances", "side_angles", "side_dihedrals",
                 "side_distances")
        batch = tuple(jnp.asarray(cvs[k][:32]) for k in order)

        ref_state, ref_metrics = jax.jit(step)(emap.state, batch)

        mesh = make_mesh(n_devices=8)
        state = emap.state.replace(
            params=jax.tree_util.tree_map(
                lambda x: jax.device_put(x, NamedSharding(mesh, P())),
                emap.state.params,
            )
        )
        with mesh:
            out_state, out_metrics = jax.jit(step)(
                state, shard_batch(batch, mesh)
            )
        assert float(out_metrics["loss"]) == pytest.approx(
            float(ref_metrics["loss"]), rel=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out_state.params["decoder"][0]["kernel"]),
            np.asarray(ref_state.params["decoder"][0]["kernel"]),
            atol=1e-5,
        )

    def test_sharded_adc_scan_trainer(self, devices_ok, rng, tmp_path):
        """End-to-end: ADCParameters(mesh_shape=...) drives the scan trainer
        (on-device batch sampling + multi-step lax.scan) over the mesh."""
        import encodermap_tpu as em
        from encodermap_tpu.train.adc_autoencoder import (
            AngleDihedralCartesianEncoderMap,
        )

        cvs = self._adc_cvs(rng)
        p = em.ADCParameters(
            main_path=str(tmp_path), batch_size=16, use_backbone_angles=True,
            use_sidechains=True, n_neurons=[16, 16, 2], seed=0,
            n_steps=6, steps_per_scan=3, mesh_shape={"dp": 4, "tp": 2},
            summary_step=100,
        )
        emap = AngleDihedralCartesianEncoderMap(cvs, p)
        assert emap.mesh is not None
        h = emap.train()
        assert len(h["loss"]) == 6
        assert np.isfinite(h["loss"]).all()

    def test_adc_device_data_sharded(self, devices_ok, rng):
        import encodermap_tpu as em
        from encodermap_tpu.train.adc_autoencoder import (
            AngleDihedralCartesianEncoderMap,
        )
        from tests.reference_impl import backmap_np

        n_res, F = 4, 64
        n_atoms = 3 * n_res
        angles = rng.uniform(1.6, 2.4, (F, n_atoms - 2)).astype(np.float32)
        dihedrals = rng.uniform(-np.pi, np.pi, (F, n_atoms - 3)).astype(
            np.float32)
        distances = rng.uniform(0.13, 0.155, (F, n_atoms - 1)).astype(
            np.float32)
        cart = backmap_np(distances, angles, dihedrals).astype(np.float32)
        cvs = dict(central_angles=angles, central_dihedrals=dihedrals,
                   central_cartesians=cart, central_distances=distances)
        p = em.ADCParameters(batch_size=16, use_backbone_angles=True,
                             use_sidechains=False, n_neurons=[8, 8, 2],
                             mesh_shape={"dp": 8}, seed=0)
        emap = AngleDihedralCartesianEncoderMap(cvs, p, read_only=True)
        dev = emap._device_data()
        assert len(dev[0].sharding.device_set) == 8
