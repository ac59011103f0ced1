# tests/test_multimer.py
"""Multimer training (VERDICT r4 #2): the homogeneous-transformation
decoder branch — per-protein chains rebuilt independently, proteins 2..N
placed by decoder-predicted 4x4 transforms.

Reference: ``models/models.py:836-953`` (encoder pairwise input, decoder
transform split, BackMapLayerTransformations routing) and
``models/layers.py:990-1092`` (the layer itself);
``models/models.py:1198-1260`` (input-shape validation).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from encodermap_tpu.models import adc
from encodermap_tpu.ops.backmap import backmap as backmap_op
from encodermap_tpu.ops.backmap import backmap_multimer
from encodermap_tpu.parameters import ADCParameters


@pytest.fixture
def rng():
    return np.random.default_rng(42)


LENGTHS = [4, 5]  # residues per protein


def _internal_coords(rng, B, lengths):
    """Random but physical-ish per-protein internal coordinates,
    concatenated protein-by-protein (the multimer CV layout)."""
    distances, angles, dihedrals = [], [], []
    for L in lengths:
        n = 3 * L
        distances.append(rng.uniform(0.12, 0.16, (B, n - 1)))
        angles.append(rng.uniform(1.7, 2.4, (B, n - 2)))
        dihedrals.append(rng.uniform(-np.pi, np.pi, (B, n - 3)))
    return (
        np.concatenate(distances, 1).astype(np.float32),
        np.concatenate(angles, 1).astype(np.float32),
        np.concatenate(dihedrals, 1).astype(np.float32),
    )


def _random_homogeneous(rng, B, n):
    """(B, n, 4, 4) row-vector-convention rigid transforms."""
    mats = np.zeros((B, n, 4, 4), np.float64)
    for b in range(B):
        for i in range(n):
            # random rotation via QR
            q, r = np.linalg.qr(rng.normal(size=(3, 3)))
            q *= np.sign(np.diag(r))
            if np.linalg.det(q) < 0:
                q[:, 0] *= -1
            mats[b, i, :3, :3] = q.T  # row-vector: [xyz] @ M
            mats[b, i, 3, :3] = rng.uniform(-2, 2, 3)
            mats[b, i, 3, 3] = 1.0
    return mats


class TestBackmapMultimerOracle:
    def test_matches_per_protein_compose_and_transform_f64(self, rng):
        """Value validation against an f64 oracle: each protein rebuilt by
        the (independently f64-oracle-tested) monomer backmap op in f64,
        then transformed with numpy f64 homogeneous matrices."""
        B = 6
        d, a, t = _internal_coords(rng, B, LENGTHS)
        mats = _random_homogeneous(rng, B, len(LENGTHS) - 1)

        out = np.asarray(backmap_multimer(
            LENGTHS, jnp.asarray(d), jnp.asarray(a), jnp.asarray(t),
            jnp.asarray(mats, jnp.float32),
        ))
        assert out.shape == (B, sum(3 * L for L in LENGTHS), 3)

        # oracle in f64 (enable_x64 scope so the monomer op really runs f64)
        d0 = a0 = t0 = at0 = 0
        for i, L in enumerate(LENGTHS):
            nd, na, nt, nat = 3 * L - 1, 3 * L - 2, 3 * L - 3, 3 * L
            with jax.enable_x64():
                xyz = np.asarray(backmap_op(
                    jnp.asarray(d[:, d0:d0 + nd], jnp.float64),
                    jnp.asarray(a[:, a0:a0 + na], jnp.float64),
                    jnp.asarray(t[:, t0:t0 + nt], jnp.float64),
                ))
            assert xyz.dtype == np.float64
            if i > 0:
                homo = np.concatenate(
                    [xyz, np.ones(xyz.shape[:-1] + (1,))], axis=-1
                )
                xyz = np.einsum("bnj,bjk->bnk", homo, mats[:, i - 1])[..., :3]
            np.testing.assert_allclose(
                out[:, at0:at0 + nat], xyz, atol=2e-5,
            )
            d0 += nd
            a0 += na
            t0 += nt
            at0 += nat

    def test_identity_transform_is_pure_concat(self, rng):
        """With identity matrices the multimer op must equal the monomer op
        applied per protein slice, concatenated."""
        B = 4
        d, a, t = _internal_coords(rng, B, LENGTHS)
        eye = np.broadcast_to(
            np.eye(4, dtype=np.float32), (B, len(LENGTHS) - 1, 4, 4)
        ).copy()
        out = np.asarray(backmap_multimer(
            LENGTHS, jnp.asarray(d), jnp.asarray(a), jnp.asarray(t),
            jnp.asarray(eye),
        ))
        d0 = a0 = t0 = at0 = 0
        for L in LENGTHS:
            nd, na, nt, nat = 3 * L - 1, 3 * L - 2, 3 * L - 3, 3 * L
            ref = np.asarray(backmap_op(
                jnp.asarray(d[:, d0:d0 + nd]), jnp.asarray(a[:, a0:a0 + na]),
                jnp.asarray(t[:, t0:t0 + nt]),
            ))
            np.testing.assert_allclose(out[:, at0:at0 + nat], ref, atol=1e-6)
            d0 += nd
            a0 += na
            t0 += nt
            at0 += nat


def _dimer_cvs(rng, F=128, lengths=LENGTHS):
    """Self-consistent synthetic multimer dataset: cartesians come from
    backmapping the internal coordinates, protein i offset by a fixed
    rigid transform so the relative placement is learnable."""
    d, a, t = _internal_coords(rng, F, lengths)
    mats = _random_homogeneous(np.random.default_rng(0), 1, len(lengths) - 1)
    mats = np.broadcast_to(mats, (F,) + mats.shape[1:]).astype(np.float32)
    cart = np.asarray(backmap_multimer(
        lengths, jnp.asarray(d), jnp.asarray(a), jnp.asarray(t),
        jnp.asarray(mats),
    ))
    n_side = 6
    side = rng.uniform(-np.pi, np.pi, (F, n_side)).astype(np.float32)
    return {
        "central_angles": a,
        "central_dihedrals": t,
        "central_cartesians": cart,
        "central_distances": d,
        "side_dihedrals": side,
    }


def _multimer_params(tmp_path=None, **kw):
    kw.setdefault("multimer_training", "homogeneous_transformation")
    kw.setdefault("multimer_lengths", LENGTHS)
    kw.setdefault("use_backbone_angles", True)
    kw.setdefault("use_sidechains", True)
    kw.setdefault("n_neurons", [32, 32, 2])
    kw.setdefault("seed", 1)
    if tmp_path is not None:
        kw.setdefault("main_path", str(tmp_path))
    return ADCParameters(**kw)


class TestMultimerModel:
    def test_model_factory_validates_config(self, rng):
        """gen_functional_model must surface invalid multimer configs as
        validate_multimer's clear ValueError, not as an opaque
        decode-parts IndexError later (wave 28 — the trainer validated,
        the factory did not)."""
        p = _multimer_params(use_sidechains=False)
        cvs = _dimer_cvs(rng, F=4)
        shapes = (
            (cvs["central_angles"].shape[1],),
            (cvs["central_dihedrals"].shape[1],),
            (cvs["central_cartesians"].shape[1], 3),
            (cvs["central_distances"].shape[1],),
        )
        with pytest.raises(ValueError, match="use_sidechains"):
            adc.gen_functional_model(shapes, p)

    def test_encoder_sees_pairwise_block(self, rng):
        p = _multimer_params()
        cvs = _dimer_cvs(rng, F=8)
        shapes = adc.ADCShapes.from_data(
            cvs["central_angles"], cvs["central_dihedrals"],
            cvs["central_cartesians"], cvs["central_distances"],
            cvs["side_dihedrals"],
        )
        n_at = shapes.n_cartesians
        base = 2 * (shapes.n_angles + shapes.n_dihedrals
                    + shapes.n_side_dihedrals)
        assert adc._encoder_in_dim(p, shapes) == base + n_at * (n_at - 1) // 2

    def test_decode_returns_transforms(self, rng):
        p = _multimer_params()
        cvs = _dimer_cvs(rng, F=8)
        shapes = adc.ADCShapes.from_data(
            cvs["central_angles"], cvs["central_dihedrals"],
            cvs["central_cartesians"], cvs["central_distances"],
            cvs["side_dihedrals"],
        )
        params = adc.init_params(jax.random.PRNGKey(0), p, shapes)
        splits = adc.decoder_splits(p, shapes)
        assert splits[-1] == (len(LENGTHS) - 1) * 16
        latent = jnp.zeros((3, 2))
        decoded = adc.decode(params, p, latent, shapes)
        assert len(decoded) == 4
        assert decoded[3].shape == (3, len(LENGTHS) - 1, 4, 4)

    def test_forward_places_both_proteins(self, rng):
        p = _multimer_params()
        cvs = _dimer_cvs(rng, F=8)
        shapes = adc.ADCShapes.from_data(
            cvs["central_angles"], cvs["central_dihedrals"],
            cvs["central_cartesians"], cvs["central_distances"],
            cvs["side_dihedrals"],
        )
        params = adc.init_params(jax.random.PRNGKey(0), p, shapes)
        batch = tuple(
            jnp.asarray(cvs[k]) for k in (
                "central_angles", "central_dihedrals", "central_cartesians",
                "central_distances", "side_dihedrals",
            )
        )
        outs = adc.forward(params, p, batch, shapes)
        back = outs[3]
        assert back.shape == (8, sum(3 * L for L in LENGTHS), 3)
        assert np.isfinite(np.asarray(back)).all()

    def test_end_to_end_training_loss_decreases(self, rng, tmp_path):
        import encodermap_tpu as em

        cvs = _dimer_cvs(rng, F=256)
        p = _multimer_params(
            tmp_path, n_steps=60, steps_per_scan=30, batch_size=64,
            cartesian_cost_scale_soft_start=(5, 20),
        )
        emap = em.AngleDihedralCartesianEncoderMap(cvs, p)
        hist = emap.train()
        assert hist["loss"][-1] < hist["loss"][0]
        assert np.isfinite(hist["loss"]).all()
        # generate: fused decode + multimer backmap
        lat = emap.encode()[:4]
        xyz = emap.generate(lat)
        assert xyz.shape == (4, sum(3 * L for L in LENGTHS), 3)
        assert np.isfinite(xyz).all()
        # decode exposes the transform matrices like the reference's
        # 4-output decoder
        outs = emap.decode(lat)
        assert len(outs) == 4
        assert outs[3].shape == (4, len(LENGTHS) - 1, 4, 4)

    def test_dict_topology_class_lengths(self):
        p = _multimer_params(
            multimer_lengths={"topA": LENGTHS, "topB": list(LENGTHS)},
            multimer_topology_classes=["topA", "topB"],
        )
        assert adc.multimer_lengths_list(p) == LENGTHS

    def test_dict_lengths_must_agree(self):
        p = _multimer_params(
            multimer_lengths={"topA": [4, 5], "topB": [4, 6]},
        )
        with pytest.raises(ValueError, match="same number of residues"):
            adc.multimer_lengths_list(p)


class TestMultimerValidation:
    """No silently-ignored multimer parameter remains (VERDICT r4 Weak #3)."""

    def test_unknown_mode_raises(self):
        p = _multimer_params(multimer_training="something_else")
        with pytest.raises(ValueError, match="homogeneous_transformation"):
            adc.multimer_lengths_list(p)

    def test_missing_lengths_raises(self):
        p = _multimer_params(multimer_lengths=None)
        with pytest.raises(ValueError, match="multimer_lengths"):
            adc.multimer_lengths_list(p)

    def test_requires_sidechains(self, rng):
        import encodermap_tpu as em

        cvs = _dimer_cvs(rng, F=8)
        del cvs["side_dihedrals"]
        p = _multimer_params(use_sidechains=False)
        with pytest.raises(ValueError, match="use_sidechains"):
            em.AngleDihedralCartesianEncoderMap(cvs, p, read_only=True)

    def test_requires_backbone_angles(self, rng):
        import encodermap_tpu as em

        cvs = _dimer_cvs(rng, F=8)
        p = _multimer_params(use_backbone_angles=False)
        with pytest.raises(ValueError, match="use_backbone_angles"):
            em.AngleDihedralCartesianEncoderMap(cvs, p, read_only=True)

    def test_shape_mismatch_raises(self, rng):
        import encodermap_tpu as em

        cvs = _dimer_cvs(rng, F=8)
        p = _multimer_params(multimer_lengths=[4, 6])  # data is [4, 5]
        with pytest.raises(ValueError, match="concatenated internal"):
            em.AngleDihedralCartesianEncoderMap(cvs, p, read_only=True)

    def test_sparse_data_raises(self, rng):
        import encodermap_tpu as em

        cvs = _dimer_cvs(rng, F=8)
        cvs["side_dihedrals"] = cvs["side_dihedrals"].copy()
        cvs["side_dihedrals"][0, 0] = np.nan
        p = _multimer_params()
        with pytest.raises(ValueError, match="sparse"):
            em.AngleDihedralCartesianEncoderMap(cvs, p, read_only=True)

    def test_reconstruct_sidechains_raises(self, rng):
        import encodermap_tpu as em

        cvs = _dimer_cvs(rng, F=8)
        p = _multimer_params(reconstruct_sidechains=True)
        with pytest.raises(ValueError, match="mutually exclusive"):
            em.AngleDihedralCartesianEncoderMap(cvs, p, read_only=True)


class TestMultimerSharded:
    def test_sharded_multimer_step_matches_single_device(self, rng):
        """The multimer train step (pairwise encoder input, transform
        decoder split, per-protein backmap + homogeneous placement) on a
        dp=4 x tp=2 mesh reproduces the single-device metrics and params."""
        import encodermap_tpu as em
        from encodermap_tpu.parallel.mesh import (
            make_mesh, shard_batch, shard_params_tp,
        )

        cvs = _dimer_cvs(rng, F=64)
        p = _multimer_params(
            batch_size=32, cartesian_cost_scale_soft_start=(0, 4),
        )
        emap = em.AngleDihedralCartesianEncoderMap(cvs, p, read_only=True)
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
            # atol 1e-4: the pairwise block widens the first encoder
            # contraction to ~3.5k columns, so GSPMD's resharded summation
            # order carries slightly more noise than the monomer tests
            np.testing.assert_allclose(
                np.asarray(out_l["kernel"]), np.asarray(ref_l["kernel"]),
                atol=1e-4,
            )
