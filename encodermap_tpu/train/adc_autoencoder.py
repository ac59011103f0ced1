# encodermap_tpu/train/adc_autoencoder.py
"""AngleDihedralCartesianEncoderMap: internal-coordinate training with
in-graph backmapping.

Mirrors the reference class
(``/root/reference/encodermap/autoencoder/autoencoder.py:1403-2576``):
5 CVs (central_angles, central_dihedrals, central_cartesians,
central_distances, side_dihedrals), the 7/8-loss assembly of
``models/models.py:2260-2459``, the soft-start cartesian schedule,
``train_for_references`` cost normalization, and
``encode/decode/generate/save/from_checkpoint``.

TPU-native: one jitted XLA program per train step (including the
associative-scan backmapping), scan-chunked stepping, device-resident CVs.
Accepts either a ``TrajEnsemble`` (its ``.CVs`` dict is used) or a plain dict
of numpy arrays keyed by CV name.
"""

from __future__ import annotations

from math import pi
from pathlib import Path
from typing import Any, Mapping, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from .. import losses as L
from ..misc.saving import (
    load_checkpoint,
    load_checkpoint_rng,
    load_pytree_into,
    save_checkpoint,
)
from ..misc.summaries import MetricsWriter
from ..models import adc
from ..ops.backmap import backmap as backmap_op
from ..ops.blocked_cartesian import MIN_BLOCKED_ATOMS
from ..ops.cartesian_analytic import MIN_ANALYTIC_ATOMS
from ..ops.distances import pairwise_dist
from ..ops.kabsch import rmsd as rmsd_op
from ..parameters import ADCParameters
from .autoencoder import TrainerExtensions, _tree_to_jax
from .callbacks import Callback, CheckpointSaver, NaNInterrupt, ProgressBar
from .core import TrainState, make_optimizer

__all__ = ["AngleDihedralCartesianEncoderMap"]

Array = jax.Array

CV_ORDER = (
    "central_angles",
    "central_dihedrals",
    "central_cartesians",
    "central_distances",
    "side_dihedrals",
)


def _needed_cv_names(p: ADCParameters) -> list[str]:
    """The CV names this parameter set trains on, in model input order."""
    if p.reconstruct_sidechains:
        return [
            "central_angles", "central_dihedrals", "all_cartesians",
            "central_distances", "side_angles", "side_dihedrals",
            "side_distances",
        ]
    needed = list(CV_ORDER[:4])
    if p.use_sidechains:
        needed.append("side_dihedrals")
    return needed


def _extract_cvs(trajs: Any, p: ADCParameters) -> tuple[np.ndarray, ...]:
    """Pull the 5 CV arrays out of a TrajEnsemble-like object or a mapping."""
    if isinstance(trajs, Mapping):
        cvs = trajs
    elif hasattr(trajs, "CVs"):
        cvs = trajs.CVs
    else:
        raise TypeError(
            f"Expected a TrajEnsemble or a dict of CV arrays, got {type(trajs)}"
        )
    needed = _needed_cv_names(p)
    missing = [k for k in needed if k not in cvs]
    if missing:
        raise ValueError(
            f"CVs {missing} not found. Load them with trajs.load_CVs(...) or "
            f"provide them in the dict."
        )
    out = []
    for k in needed:
        arr = np.asarray(cvs[k], np.float32)
        if k in ("central_cartesians", "all_cartesians") and arr.ndim == 2:
            arr = arr.reshape(len(arr), -1, 3)
        out.append(arr)
    return tuple(out)


class AngleDihedralCartesianEncoderMap(TrainerExtensions):
    """Train on backbone internal coordinates; generate new conformations by
    decoding + in-graph backmapping."""

    def __init__(
        self,
        trajs: Any = None,
        parameters: Optional[ADCParameters] = None,
        model_params: Optional[dict] = None,
        read_only: bool = False,
        dataset: Optional[tuple] = None,
        learning_rate_schedule=None,
    ) -> None:
        """``learning_rate_schedule``: optional callable ``step -> lr``
        (any optax schedule) replacing the constant ``p.learning_rate``;
        not serialized — pass it again on ``from_checkpoint``."""
        self.p = parameters if parameters is not None else ADCParameters()
        if (self.p.multimer_training is not None
                and self.p.reconstruct_sidechains):
            # before CV extraction: the reconstruct path needs 7 CVs and
            # would otherwise fail with a misleading missing-CV error
            raise ValueError(
                "multimer training and reconstruct_sidechains are "
                "mutually exclusive (reference models.py:1108-1111)"
            )
        self._lr_schedule = learning_rate_schedule
        self.read_only = read_only
        self._validate_model_api("functional")
        self.trajs = trajs
        self._metrics_writer: Optional[MetricsWriter] = None
        self.history: dict[str, list] = {}
        self.callbacks: list[Callback] = []

        if dataset is not None:
            self.train_data = tuple(np.asarray(d, np.float32) for d in dataset)
        else:
            self.train_data = _extract_cvs(trajs, self.p)
        if self.p.reconstruct_sidechains:
            self.shapes = adc.ADCSidechainShapes.from_data(*self.train_data)
            info = self.p.sidechain_info
            if info is None and hasattr(trajs, "trajs"):
                info = trajs.trajs[0].top.sidechain_info()
                self.p.sidechain_info = info
            if info is None:
                raise ValueError(
                    "reconstruct_sidechains=True needs p.sidechain_info "
                    "(residue -> n sidechain dihedrals) or a TrajEnsemble "
                    "with topologies"
                )
            from ..ops.backmap_sidechains import make_spec

            self.sidechain_spec = make_spec(
                {int(k): int(v) for k, v in info.items()}
            )
        else:
            (angles, dihedrals, cartesians, distances) = self.train_data[:4]
            side = self.train_data[4] if len(self.train_data) == 5 else None
            self.shapes = adc.ADCShapes.from_data(
                angles, dihedrals, cartesians, distances, side
            )
        # NaNs mark missing values from mixed-topology ensemble alignment ->
        # masked-dense "sparse" mode with per-input densifiers (the reference
        # reroutes these into tf.sparse tensors, ``autoencoder.py:796-800``)
        self.sparse = any(np.isnan(a).any() for a in self.train_data)
        if self.p.multimer_training is not None:
            adc.validate_multimer(self.p, self.shapes, sparse=self.sparse)
        if self.sparse and self.p.reconstruct_sidechains:
            # no densifiers exist on the sidechain-reconstruction path —
            # NaNs would flow into every loss and "diverge" at step 1
            raise ValueError(
                "reconstruct_sidechains=True does not support NaN-padded "
                "(mixed-topology sparse) CVs: the sidechain model has no "
                "densifier layers. Train per-topology, or drop "
                "reconstruct_sidechains."
            )

        if not read_only:
            Path(self.p.main_path).mkdir(parents=True, exist_ok=True)
            self.p.save(Path(self.p.main_path) / "parameters.json")

        seed = self.p.seed if self.p.seed is not None else 0
        key = jax.random.PRNGKey(seed)
        k_model, k_train = jax.random.split(key)
        if model_params is None:
            if self.p.reconstruct_sidechains:
                model_params = adc.init_sidechain_params(
                    k_model, self.p, self.shapes
                )
            else:
                model_params = adc.init_params(
                    k_model, self.p, self.shapes, sparse=self.sparse
                )
        self.optimizer = make_optimizer(
            self._lr_schedule if self._lr_schedule is not None
            else self.p.learning_rate
        )
        self.state = TrainState.create(
            model_params, self.optimizer, k_train,
            step=self.p.current_training_step,
        )
        self._trainer = None
        self.custom_losses: list = []
        self.custom_metrics: list = []
        self._maybe_write_summary()

    # the soft-start scale is logged every step but never summed
    _metrics_only = ("cartesian_cost_scale",)
    # bench/ablation scripts drive the ADC trainer manually while holding
    # emap.state — donation would delete those buffers under them
    _donate_state = False

    # ------------------------------------------------------------------ losses
    def _loss_terms(
        self, params: dict, batch: tuple, step: Array
    ) -> dict[str, Array]:
        """The reference's get_loss assembly (``models.py:2260-2459``)."""
        return self._loss_terms_aux(params, batch, step)[0]

    def _loss_and_aux(self, params, batch, step):
        return self._loss_terms_aux(params, batch, step)

    def _loss_terms_aux(
        self, params: dict, batch: tuple, step: Array
    ) -> tuple[dict[str, Array], tuple]:
        """Loss terms + ``(back_cartesians, target_cartesians)`` aux so the
        clash/RMSD metrics reuse this forward instead of rerunning the whole
        model (XLA dead-code-eliminates the aux when tracking is off)."""
        p = self.p
        if p.reconstruct_sidechains:
            return self._loss_terms_sidechains(params, batch, step)
        if self.sparse:
            dens_params = params
            if not p.trainable_dense_to_sparse:
                dens_params = dict(params)
                dens_params["densifiers"] = jax.lax.stop_gradient(
                    params["densifiers"]
                )
            batch = adc.densify_inputs(dens_params, p, batch)
        inp_angles, inp_dihedrals, inp_cartesians, inp_distances = batch[:4]
        inp_side = batch[4] if len(batch) == 5 else None

        (out_angles, out_dihedrals, out_side, back_cartesians,
         inp_pair, out_pair, latent) = adc.forward(params, p, batch, self.shapes)

        # encoder input for the distance/center costs: the concatenation of
        # the *raw* trained groups (``loss_functions.py:279-281``)
        groups = [inp_dihedrals]
        if p.use_backbone_angles:
            groups = [inp_angles, inp_dihedrals]
        if p.use_sidechains:
            groups = groups + [inp_side]
        enc_inp = jnp.concatenate(groups, axis=1) if len(groups) > 1 else groups[0]

        scale = L.soft_start_scale(p, step)
        # cartesian cost from FULL distance matrices: identical pair values,
        # but the backward through the backmapped coordinates is a dense
        # reduction instead of a triu-index scatter (~2 ms at 158 residues
        # on TPU; see losses.cartesian_loss_matrix). Past MIN_ANALYTIC_ATOMS
        # autodiff's (B, n, n) residuals (sign / 1/d — 268 MB each at
        # n = 512) dominate and both cartesian costs switch to hand-written
        # VJPs that recompute the matrices inside fused reductions
        # (losses.cartesian_losses_analytic); past MIN_BLOCKED_ATOMS memory
        # forces the blocked remat scan (slower, O(B*R*n) peak). A Pallas
        # tile kernel and the blocked scan both lost ON SPEED at every
        # scale measured — docs/mosaic_findings.md, docs/perf_r4.md.
        inp_sel = adc._ca_slice(p, inp_cartesians)
        out_sel = adc._ca_slice(p, back_cartesians)
        n_sel = inp_sel.shape[1]
        if n_sel >= MIN_BLOCKED_ATOMS:
            cart_loss, cdist_loss = L.cartesian_losses_blocked(
                inp_sel, out_sel, latent, p, scale=scale
            )
        elif n_sel >= MIN_ANALYTIC_ATOMS:
            cart_loss, cdist_loss = L.cartesian_losses_analytic(
                inp_sel, out_sel, latent, p, scale=scale
            )
        else:
            inp_mat = pairwise_dist(inp_sel)
            out_mat = pairwise_dist(out_sel)
            cart_loss = L.cartesian_loss_matrix(inp_mat, out_mat, p,
                                                scale=scale)
            # matrix form: same value as the flat-pair loss, but reuses
            # inp_mat instead of the triu coordinate gather (which was
            # ~40% of the 158-res step; docs/adc_ablation_r3.json) —
            # inp_pair/out_pair then go dead and XLA eliminates them.
            # Below ~64 CAs the gather is cheap and the matrix doubles the
            # Gram width, so small proteins keep the flat form.
            cdist_loss = (
                L.cartesian_distance_loss_matrix(inp_mat, latent, p)
                if n_sel >= 64
                else L.cartesian_distance_loss(inp_pair, latent, p)
            )
        terms = {
            "dihedral_loss": L.dihedral_loss(inp_dihedrals, out_dihedrals, p),
            "angle_loss": L.angle_loss(inp_angles, out_angles, p),
            "cartesian_loss": cart_loss,
            "distance_loss": L.distance_loss(enc_inp, latent, p),
            "cartesian_distance_loss": cdist_loss,
            "center_loss": L.center_loss(latent, p),
            "regularization_loss": L.regularization_loss(
                adc.regularization_sum(params), p
            ),
        }
        if p.use_sidechains:
            terms["side_dihedral_loss"] = L.side_dihedral_loss(
                inp_side, out_side, p
            )
        terms["cartesian_cost_scale"] = scale
        return terms, (back_cartesians, inp_cartesians)

    def _loss_terms_sidechains(
        self, params: dict, batch: tuple, step: Array
    ) -> tuple[dict[str, Array], tuple]:
        """Loss assembly for reconstruct_sidechains mode: adds the side-angle
        cost and feeds 4 periodic groups to the distance/center costs
        (reference ``models.py:2306-2459`` reconstruct branches)."""
        p = self.p
        (inp_ca, inp_cdi, inp_all_cart, inp_cd, inp_sa, inp_sdi,
         inp_sd) = batch
        (out_ca, out_cdi, out_sa, out_sdi, back, inp_pair, out_pair,
         latent) = adc.forward_sidechains(
            params, p, batch, self.shapes, self.sidechain_spec
        )
        # DELIBERATE DIVERGENCE from the reference: its distance_loss_func
        # truncates the reconstruct-mode 4-tuple to y_true[:3]
        # (loss_functions.py:279-281), silently dropping side_dihedrals
        # from the sigmoid cost even though the encoder consumes them —
        # contradicting its own "needs to be adjusted based on what the
        # encoder takes" comment (models.py:2389-2391). The sketch-map
        # cost compares the encoder's INPUT space with the latent, so all
        # four encoder inputs belong in it.
        enc_inp = jnp.concatenate([inp_ca, inp_cdi, inp_sa, inp_sdi], axis=1)
        scale = L.soft_start_scale(p, step)
        # dense-matrix cartesian cost: scatter-free backward (see
        # _loss_terms); analytic VJPs past MIN_ANALYTIC_ATOMS, blocked
        # remat scan past MIN_BLOCKED_ATOMS (memory)
        pwd_idx = adc.sidechain_pwd_indices(p, self.sidechain_spec)
        inp_sel = inp_all_cart[:, pwd_idx]
        out_sel = back[:, pwd_idx]
        if len(pwd_idx) >= MIN_BLOCKED_ATOMS:
            cart_loss, cdist_loss = L.cartesian_losses_blocked(
                inp_sel, out_sel, latent, p, scale=scale
            )
        elif len(pwd_idx) >= MIN_ANALYTIC_ATOMS:
            cart_loss, cdist_loss = L.cartesian_losses_analytic(
                inp_sel, out_sel, latent, p, scale=scale
            )
        else:
            inp_mat = pairwise_dist(inp_sel)
            out_mat = pairwise_dist(out_sel)
            cart_loss = L.cartesian_loss_matrix(inp_mat, out_mat, p,
                                                scale=scale)
            # matrix form above ~64 atoms — see _loss_terms
            cdist_loss = (
                L.cartesian_distance_loss_matrix(inp_mat, latent, p)
                if inp_mat.shape[-1] >= 64
                else L.cartesian_distance_loss(inp_pair, latent, p)
            )
        terms = {
            "dihedral_loss": L.dihedral_loss(inp_cdi, out_cdi, p),
            "angle_loss": L.angle_loss(inp_ca, out_ca, p)
            + L.angle_loss(inp_sa, out_sa, p),
            "side_dihedral_loss": L.side_dihedral_loss(inp_sdi, out_sdi, p),
            "cartesian_loss": cart_loss,
            "distance_loss": L.distance_loss(enc_inp, latent, p),
            "cartesian_distance_loss": cdist_loss,
            "center_loss": L.center_loss(latent, p),
            "regularization_loss": L.regularization_loss(
                adc.regularization_sum(params), p
            ),
            "cartesian_cost_scale": scale,
        }
        return terms, (back, inp_all_cart)

    def _metric_io(self, params, batch):
        """``(y_true, y_pred)`` for metric *objects*
        (:mod:`encodermap_tpu.train.metrics`): ``y_true`` is the input tuple
        and ``y_pred`` puts the backmapped cartesians at index 2 for EVERY
        ADC variant (see the module docstring there for the deliberate
        divergence from the reference's shifted output list)."""
        p = self.p
        if p.reconstruct_sidechains:
            (out_ca, out_cdi, out_sa, out_sdi, back, inp_pair, out_pair,
             _latent) = adc.forward_sidechains(
                params, p, batch, self.shapes, self.sidechain_spec
            )
            return batch, (out_ca, out_cdi, back, out_sa, out_sdi,
                           inp_pair, out_pair)
        if self.sparse:
            batch = adc.densify_inputs(params, p, batch)
        (out_angles, out_dihedrals, out_side, back, inp_pair, out_pair,
         _latent) = adc.forward(params, p, batch, self.shapes)
        y_pred = (out_angles, out_dihedrals, back, inp_pair, out_pair)
        if out_side is not None:
            y_pred = y_pred + (out_side,)
        return batch, y_pred

    def _aux_metric_terms(self, aux: tuple, batch: tuple) -> dict[str, Array]:
        """Optional clash / RMSD metrics (``callbacks/metrics.py:470-581``),
        computed from the loss forward's backmapped coordinates (one-step-
        stale parameters — immaterial for a tracked metric, and it avoids a
        second full forward incl. the backmap scan per step)."""
        p = self.p
        out = {}
        if not (p.track_clashes or p.track_RMSD):
            return out
        back_cartesians, target_cartesians = aux
        if p.track_clashes:
            d = pairwise_dist(back_cartesians, flat=True)
            # coordinates are nm; the reference's ADCClashMetric uses a
            # 0.1 nm (1 A) clash distance (callbacks/metrics.py:470-581)
            out["clashes"] = jnp.mean(
                jnp.sum(d < 0.1, axis=-1).astype(jnp.float32)
            )
        if p.track_RMSD:
            out["rmsd"] = jnp.mean(
                rmsd_op(back_cartesians, target_cartesians)
            )
        return out

    # ------------------------------------------------------------------ training
    def set_train_data(self, trajs: Any) -> None:
        """Replace the training data from a TrajEnsemble or CV dict/tuple
        (reference ``autoencoder.py:1973``); CV widths must stay compatible
        with the built model."""
        if isinstance(trajs, (tuple, list)):
            new = tuple(np.asarray(d, np.float32) for d in trajs)
        else:
            new = _extract_cvs(trajs, self.p)
        if len(new) != len(self.train_data):
            raise ValueError(
                f"new data has {len(new)} CV arrays, model trains on "
                f"{len(self.train_data)}"
            )
        for name, old, arr in zip(_needed_cv_names(self.p),
                                  self.train_data, new):
            if old.shape[1:] != arr.shape[1:]:
                raise ValueError(
                    f"new {name} shape {arr.shape[1:]} does not match the "
                    f"model's {old.shape[1:]}"
                )
        new_sparse = any(np.isnan(a).any() for a in new)
        if new_sparse and "densifiers" not in self.state.params:
            # a dense-built model has no densifiers: the NaNs would flow
            # straight into the losses
            raise ValueError(
                "the new data holds NaNs (sparse mode) but this model was "
                "built dense (no densifiers). Rebuild the model on the "
                "NaN-padded data."
            )
        if new_sparse != self.sparse:
            self._trainer = None  # cached steps were traced with old sparse
        self.sparse = new_sparse
        if not isinstance(trajs, (tuple, list)):
            self.trajs = trajs
        self.train_data = new

    @staticmethod
    def get_train_data_from_trajs(trajs: Any, p: "ADCParameters") -> tuple:
        """The CV tuple (angles, dihedrals, cartesians, distances[,
        side_dihedrals...]) the model trains on (reference
        ``autoencoder.py:2032``)."""
        return _extract_cvs(trajs, p)

    def _device_data(self) -> tuple:
        # NaNs stay: the densifiers zero-fill inside the graph (sparse mode);
        # dense mode has no NaNs by construction.
        data = tuple(jnp.asarray(d) for d in self.train_data)
        mesh = self.mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sh = NamedSharding(mesh, P("dp"))
            data = tuple(jax.device_put(d, sh) for d in data)
        return data

    def train_streaming(self, source, n_steps: Optional[int] = None) -> dict:
        """Out-of-core ADC training from a host superbatch source (tuples of
        the 5/7 CV stacks), replacing the reference's HDF5-generator
        streaming (``info_all.py:3080-3154``).

        ``source`` may also be a path to an HDF5 file — either a flat
        ``CVs/`` group or an ensemble file written by
        :meth:`TrajEnsemble.save` — in which case batches are sampled
        lazily from disk and the CVs never fully materialize in RAM::

            trajs.load_CVs("all"); trajs.save("ens.h5")
            emap = AngleDihedralCartesianEncoderMap.from_ensemble_h5(
                "ens.h5", p)
            emap.train_streaming("ens.h5")
        """
        from .core import HDF5BatchSource, run_streaming

        owned = None
        if isinstance(source, (str, Path)):
            source = owned = HDF5BatchSource(
                source, _needed_cv_names(self.p), self.p.batch_size,
                self.p.steps_per_scan,
                seed=self.p.seed if self.p.seed is not None else 0,
            )
        n = self._streaming_budget(n_steps)
        if n <= 0:
            if owned is not None:
                owned.close()
            return self.history
        try:
            history = run_streaming(self, source, n,
                                    sharding=self._streaming_sharding())
        finally:
            if owned is not None:
                owned.close()
        # _finish_streaming honors _streaming_nan_stop — the previous
        # unconditional persist here saved NaN-diverged checkpoints
        # (wave 30)
        return self._finish_streaming(history)

    def train_for_references(self, subsample: int = 100, maxiter: int = 500
                             ) -> dict[str, float]:
        """Normalize angle/dihedral/cartesian costs against a dummy model
        that always predicts the dataset mean
        (reference: ``autoencoder.py:1816-1938``)."""
        p_ref = ADCParameters(
            cartesian_cost_scale=1, angle_cost_scale=1, dihedral_cost_scale=1
        )
        angles, dihedrals, cartesians, distances = self.train_data[:4]
        if self.p.reconstruct_sidechains:
            # train_data[2] is the ALL-atom cartesians in this mode, but
            # the dummy model backmaps the central chain only — the
            # reference normalizes against central_cartesians
            # (autoencoder.py:1835); mismatched widths crashed the
            # cartesian loss at trace time (wave 33)
            cvs = None
            if isinstance(self.trajs, Mapping):
                cvs = self.trajs
            elif hasattr(self.trajs, "CVs"):
                cvs = self.trajs.CVs
            if cvs is None or "central_cartesians" not in cvs:
                raise ValueError(
                    "train_for_references with reconstruct_sidechains "
                    "needs the 'central_cartesians' CV (the reference "
                    "normalizes on the central chain, autoencoder.py:"
                    "1835); load it with trajs.load_CVs('all')"
                )
            cartesians = np.asarray(cvs["central_cartesians"], np.float32)
            if cartesians.ndim == 2:
                cartesians = cartesians.reshape(len(cartesians), -1, 3)
        n = len(angles)
        nsteps = min(maxiter, max(1, n // self.p.batch_size))

        # nanmean: sparse (mixed-topology) ensembles NaN-pad missing columns
        mean_angles = jnp.asarray(np.nanmean(angles, 0, keepdims=True))
        mean_dihedrals = jnp.asarray(np.nanmean(dihedrals, 0, keepdims=True))
        mean_lengths = jnp.asarray(np.nanmean(distances, 0, keepdims=True))
        multimer_lengths = adc.multimer_lengths_list(self.p)
        if multimer_lengths:
            # per-protein concatenated internals: ONE chain_in_plane over
            # the concatenation trips its bond-count assertion — rebuild
            # each protein and place the others at identity (the dummy
            # model has no transform predictions) (wave 33)
            from ..ops.backmap import backmap_multimer

            eye = jnp.broadcast_to(
                jnp.eye(4, dtype=jnp.float32),
                (1, len(multimer_lengths) - 1, 4, 4),
            )
            gen_cartesians = backmap_multimer(
                multimer_lengths, mean_lengths, mean_angles,
                mean_dihedrals, eye,
            )
        else:
            gen_cartesians = backmap_op(
                mean_lengths,
                mean_angles,
                mean_dihedrals,
            )
        gen_pd = adc.cartesian_pwd_slice(self.p, gen_cartesians)

        @jax.jit
        def refs(batch_angles, batch_dihedrals, batch_cartesians):
            B = batch_angles.shape[0]
            tiled_ang = jnp.broadcast_to(mean_angles, (B,) + mean_angles.shape[1:])
            tiled_di = jnp.broadcast_to(
                mean_dihedrals, (B,) + mean_dihedrals.shape[1:]
            )
            a = L.angle_loss(batch_angles, tiled_ang, p_ref)
            d = L.dihedral_loss(batch_dihedrals, tiled_di, p_ref)
            pd = adc.cartesian_pwd_slice(self.p, batch_cartesians)
            gen = jnp.broadcast_to(gen_pd, (B,) + gen_pd.shape[1:]).reshape(
                B, -1
            )
            c = L.cartesian_loss(pd, gen, p_ref, scale=1.0)
            return a, d, c

        rng = np.random.default_rng(self.p.seed if self.p.seed is not None else 0)
        acc = {"angle_cost": [], "dihedral_cost": [], "cartesian_cost": []}
        if self.sparse:
            # missing entries get the dataset mean: they contribute zero to
            # the cost vs the mean-predicting dummy model instead of NaN.
            # `subsample` thins the fill-mean pass exactly where the
            # reference thins its sparse-tensor build (autoencoder.py:1853)
            stride = max(1, int(subsample))
            fills = [np.nanmean(x[::stride], 0)
                     for x in (angles, dihedrals, cartesians)]
        for _ in range(nsteps):
            idx = rng.integers(0, n, self.p.batch_size)
            batch = (angles[idx], dihedrals[idx], cartesians[idx])
            if self.sparse:
                batch = tuple(
                    np.where(np.isnan(b), f, b) for b, f in zip(batch, fills)
                )
            a, d, c = refs(*(jnp.asarray(b) for b in batch))
            acc["angle_cost"].append(float(a))
            acc["dihedral_cost"].append(float(d))
            acc["cartesian_cost"].append(float(c))
        means = {k: float(np.mean(v)) for k, v in acc.items()}
        print(f"After {nsteps} steps setting cost references: {means}.")
        self.p.angle_cost_reference = means["angle_cost"]
        self.p.dihedral_cost_reference = means["dihedral_cost"]
        self.p.cartesian_cost_reference = means["cartesian_cost"]
        if not self.read_only:
            self.p.save(Path(self.p.main_path) / "parameters.json")
        return means

    # ------------------------------------------------------------------ inference
    def encode(self, data: Optional[Any] = None) -> np.ndarray:
        """Latent projection of (angles, dihedrals[, side_dihedrals]) tuples,
        a stacked feature matrix, or the training CVs."""
        if data is None:
            data = self.train_data
        if isinstance(data, Mapping):  # CV dicts, like the constructor takes
            data = _extract_cvs(data, self.p)
        if isinstance(data, np.ndarray):
            data = self._split_stacked(data)
        arrs = tuple(np.asarray(d, np.float32) for d in data)

        def _encode(params, inputs):
            if self.p.reconstruct_sidechains:
                return adc.encode_sidechains(params, self.p, inputs)
            if self.sparse:
                inputs = adc.densify_inputs(params, self.p, inputs)
            return adc.encode(params, self.p, inputs)

        # self.sparse can flip via set_train_data -> it is part of the key
        jfn = self._cached_jit(f"encode_sparse={self.sparse}", _encode)
        arrs = self._as_model_inputs(arrs)
        # chunked like the base class's _batched_apply: a million-frame
        # ensemble must not ride to the device as one giant program
        B = int(arrs[0].shape[0])
        mb = 8192
        outs = []
        for i in range(0, max(B, 1), mb):
            chunk = tuple(jnp.asarray(a[i : i + mb]) for a in arrs)
            outs.append(np.asarray(jfn(self.state.params, chunk)))
        return outs[0] if len(outs) == 1 else np.concatenate(outs, axis=0)

    def _as_model_inputs(self, arrs: tuple) -> tuple:
        """Map a user tuple onto the model's input slots.

        encode() documents ``(angles, dihedrals[, side_dihedrals])`` —
        but the model reads side_dihedrals from slot 4 (cartesians and
        distances occupy 2-3), so short tuples must be placed, not just
        zero-padded on the right."""
        full = 7 if self.p.reconstruct_sidechains else 5
        if self.p.multimer_training is not None and (
            len(arrs) != full or arrs[2].shape[1] == 0
        ):
            # the multimer encoder consumes a pairwise-distance block of
            # the REAL input cartesians (models/adc.py::encode); a short
            # tuple or stacked matrix has no cartesians to build it from,
            # and a zero-width placeholder would produce a wrong-width
            # encoder input (opaque shape error downstream). Raise clearly.
            raise ValueError(
                "multimer models build the encoder's pairwise-distance "
                "block from the input cartesians; encode() needs the full "
                "5-CV tuple (angles, dihedrals, cartesians, distances, "
                "side_dihedrals) or a CV dict with central_cartesians — "
                "short tuples / stacked feature matrices are not enough"
            )
        if len(arrs) == full:
            return arrs
        B = arrs[0].shape[0]
        z = jnp.zeros((B, 0), jnp.float32)
        if self.p.reconstruct_sidechains:
            if len(arrs) == 4:  # (central_angles, central_dihedrals,
                ca, cdi, sa, sdi = arrs  # side_angles, side_dihedrals)
                return (ca, cdi, z, z, sa, sdi, z)
            raise ValueError(
                f"encode() for reconstruct_sidechains models takes the "
                f"4-tuple (central_angles, central_dihedrals, side_angles, "
                f"side_dihedrals) or the full 7-CV tuple; got {len(arrs)} "
                f"arrays"
            )
        if len(arrs) == 4:  # full CV tuple of a use_sidechains=False model
            if self.p.use_sidechains:
                # zero-padding the side slot would feed the encoder an
                # input 2*n_side_dihedrals columns too narrow and die in
                # a raw dot-shape error (wave 33)
                raise ValueError(
                    "this model trains on side_dihedrals — pass the full "
                    "5-CV tuple (angles, dihedrals, cartesians, "
                    "distances, side_dihedrals) or (angles, dihedrals, "
                    "side_dihedrals)"
                )
            return arrs + (z,)
        if len(arrs) == 3:  # (angles, dihedrals, side_dihedrals)
            return (arrs[0], arrs[1], z, z, arrs[2])
        if len(arrs) == 2:
            if self.p.use_sidechains:
                raise ValueError(
                    "this model trains on side_dihedrals — pass (angles, "
                    "dihedrals, side_dihedrals)"
                )
            return (arrs[0], arrs[1], z, z, z)
        raise ValueError(
            f"encode() takes (angles, dihedrals[, side_dihedrals]) or the "
            f"full 5-CV tuple; got {len(arrs)} arrays"
        )

    def _split_stacked(self, data: np.ndarray) -> tuple:
        """Split a stacked (angles|dihedrals|side) matrix by the known dims."""
        s = self.shapes
        cols = []
        if self.p.use_backbone_angles:
            cols.append(s.n_angles)
        cols.append(s.n_dihedrals)
        if self.p.use_sidechains:
            cols.append(s.n_side_dihedrals)
        assert data.shape[1] == sum(cols), (data.shape, cols)
        parts = list(np.split(data, np.cumsum(cols)[:-1], axis=1))
        if not self.p.use_backbone_angles:
            # angles aren't trained: supply a placeholder in slot 0
            parts.insert(0, np.zeros((len(data), s.n_angles), np.float32))
        a, d = parts[0], parts[1]
        if self.p.use_sidechains:
            return (a, d, np.zeros((len(a), 0)), np.zeros((len(a), 0)),
                    parts[2])
        return (a, d)

    def decode(self, latent: np.ndarray) -> tuple:
        """Decode latent -> (angles, dihedrals[, side_dihedrals]); mean
        angles are substituted when angles aren't trained
        (``autoencoder.py:2502``)."""
        latent = jnp.asarray(np.asarray(latent, np.float32))
        if self.p.reconstruct_sidechains:
            fn = self._cached_jit(
                "decode_sidechains",
                lambda params, z: adc.decode_sidechains(
                    params, self.p, z, self.shapes
                ),
            )
            return tuple(np.asarray(o) for o in fn(self.state.params, latent))
        fn = self._cached_jit(
            "decode",
            lambda params, z: adc.decode(params, self.p, z, self.shapes),
        )
        decoded = fn(self.state.params, latent)
        out_angles, out_dihedrals, out_side = decoded[:3]
        if out_angles is None:
            # nanmean: sparse ensembles NaN-pad missing columns
            mean = np.nanmean(self.train_data[0], 0, keepdims=True)
            out_angles = np.broadcast_to(mean, (len(latent), mean.shape[1]))
        outs = (np.asarray(out_angles), np.asarray(out_dihedrals))
        if out_side is not None:
            outs = outs + (np.asarray(out_side),)
        if len(decoded) == 4:
            # multimer: the (B, n_proteins-1, 4, 4) homogeneous transforms
            # are part of the decoder output (reference models.py:1544)
            outs = outs + (np.asarray(decoded[3]),)
        return outs

    def generate(
        self, points: np.ndarray, backend: str = "scan", top: Any = None,
        progbar: Any = None,
    ) -> Any:
        """Decode latent points and backmap to 3-D coordinates.

        ``backend="scan"`` uses the in-graph associative-scan backmapping
        with the training set's mean bond lengths — the on-chip equivalent of
        the reference's in-graph path. ``backend="topology"`` rotates a real
        topology's bonds to the decoded dihedrals (the reference's
        ``mdtraj_backmapping`` path) — pass ``top`` as a SingleTraj.

        The reference's backend names are accepted too
        (``autoencoder/autoencoder.py:2466-2571``): ``backend="mdtraj"``
        and ``backend="mdanalysis"`` both run the offline
        :func:`~encodermap_tpu.misc.backmapping_offline.mdtraj_backmapping`
        sweep against a real topology, with the reference's ``top``
        resolution (None → the ensemble's single topology, int → the
        ``top``-th trajectory, str → a topology file path or a
        ``common_str`` of the ensemble). Since neither mdtraj nor
        MDAnalysis ships in this framework, both return
        ``(n_points, n_atoms, 3)`` coordinates rather than a
        ``Trajectory``/``Universe`` object (documented divergence).

        Returns ``(n_points, n_atoms, 3)`` coordinates (full-topology atom
        count for the topology-based backends).
        """
        del progbar  # accepted for reference signature compatibility
        if backend not in ("scan", "topology", "mdtraj", "mdanalysis"):
            # same exception type as the reference (autoencoder.py:2568)
            raise TypeError(
                f"backend must be 'scan', 'topology', 'mdtraj' or "
                f"'mdanalysis', but you provided {backend!r}"
            )
        if backend in ("mdtraj", "mdanalysis"):
            from ..misc.backmapping_offline import mdtraj_backmapping

            trajs = getattr(self, "trajs", None)
            if trajs is not None and not hasattr(trajs, "top"):
                # CV-dict-constructed models carry the raw dict in
                # self.trajs; there is no topology to rebuild against
                trajs = None
            if trajs is None and top is None:
                raise ValueError(
                    f"backend={backend!r} rebuilds against a real topology, "
                    "but this model was constructed from CV arrays (no "
                    "TrajEnsemble); pass `top` as a topology file path or "
                    "a SingleTraj."
                )
            if top is None and trajs is not None and len(trajs.top) > 1:
                raise ValueError(
                    f"The ensemble has {len(trajs.top)} topologies; pass "
                    "`top` as an int (trajectory index), a topology file "
                    "path, or one of the ensemble's common_str to pick "
                    "which to rebuild."
                )
            if (
                isinstance(top, str)
                and trajs is not None
                and top in getattr(trajs, "common_str", ())
            ):
                # the reference resolves common_str before file paths
                # (autoencoder.py:2546-2548): seed from that sub-ensemble
                trajs = trajs.trajs_by_common_str[top][0]
                top = None
            decoded = self.decode(np.asarray(points, np.float32))
            if isinstance(decoded, np.ndarray):
                dihedrals, side = decoded, None
            elif len(decoded) == 2:
                dihedrals, side = decoded[1], None
            elif self.p.reconstruct_sidechains:
                # decode() returns (central_angles, central_dihedrals,
                # side_ANGLES, side_dihedrals) in this mode — index 2 is
                # angles; feeding them as chi targets tripped the
                # quadruplet-count assertion (wave 33)
                dihedrals, side = decoded[1], decoded[3]
            else:
                dihedrals, side = decoded[1], decoded[2]
            return mdtraj_backmapping(
                top=top, dihedrals=dihedrals, sidechain_dihedrals=side,
                trajs=trajs,
            )
        if backend == "topology":
            assert top is not None, 'backend="topology" needs a `top` traj'
            from ..misc.backmapping_offline import backmap_topology

            decoded = self.decode(np.asarray(points, np.float32))
            out_dihedrals = decoded[1]
            # decoder emits PSI/OMEGA/PHI per chain window; map onto the
            # topology's phi/psi quadruplets (omega stays near its mean)
            t = top.top if hasattr(top, "top") else top
            chain = t.central_atom_indices()
            quads = np.stack(
                [chain[:-3], chain[1:-2], chain[2:-1], chain[3:]], axis=1
            )
            base = top.xyz[0] if hasattr(top, "xyz") else None
            return backmap_topology(
                t, base, out_dihedrals, dihedral_indices=quads
            )
        # decode + backmap run as ONE jitted program: no intermediate
        # device->host->device round-trip of the decoded angles (which on
        # the remote-TPU tunnel costs a dispatch + two transfers per call)
        points = jnp.asarray(np.asarray(points, np.float32))
        if self.p.reconstruct_sidechains:
            from ..ops.backmap_sidechains import backmap_sidechains_fast

            def _gen_sc(params, z, cd, sd):
                out_ca, out_cdi, out_sa, out_sdi = adc.decode_sidechains(
                    params, self.p, z, self.shapes
                )
                B = z.shape[0]
                return backmap_sidechains_fast(
                    self.sidechain_spec,
                    jnp.broadcast_to(cd, (B, cd.shape[1])),
                    out_ca, out_cdi,
                    jnp.broadcast_to(sd, (B, sd.shape[1])),
                    out_sa, out_sdi,
                )

            fn = self._cached_jit("generate_fused_sidechains", _gen_sc)
            xyz = fn(
                self.state.params, points,
                jnp.asarray(np.nanmean(self.train_data[3], 0, keepdims=True)),
                jnp.asarray(np.nanmean(self.train_data[6], 0, keepdims=True)),
            )
            return np.asarray(xyz)

        def _gen(params, z, mean_lengths, mean_angles):
            decoded = adc.decode(params, self.p, z, self.shapes)
            out_angles, out_dihedrals = decoded[0], decoded[1]
            B = z.shape[0]
            if out_angles is None:  # MeanAngles substitution
                out_angles = jnp.broadcast_to(
                    mean_angles, (B, mean_angles.shape[1])
                )
            lengths = jnp.broadcast_to(
                mean_lengths, (B, mean_lengths.shape[1])
            )
            if self.p.multimer_training is not None:
                from ..ops.backmap import backmap_multimer

                return backmap_multimer(
                    adc.multimer_lengths_list(self.p), lengths,
                    out_angles, out_dihedrals, decoded[3],
                )
            return backmap_op(lengths, out_angles, out_dihedrals)

        fn = self._cached_jit("generate_fused", _gen)
        # nanmean: sparse ensembles NaN-pad missing columns, and a single
        # NaN bond length would propagate through every backmapped atom
        xyz = fn(
            self.state.params, points,
            jnp.asarray(np.nanmean(self.train_data[3], 0, keepdims=True)),
            jnp.asarray(np.nanmean(self.train_data[0], 0, keepdims=True)),
        )
        return np.asarray(xyz)

    # ------------------------------------------------------------------ persistence
    # save() / add_images_to_tensorboard() / checkpoint-state restore are
    # inherited from TrainerExtensions — keep them in ONE place

    @classmethod
    def _parameters_class(cls):
        return ADCParameters

    @classmethod
    def from_ensemble_h5(
        cls,
        path: Union[str, Path],
        parameters: Optional[ADCParameters] = None,
        prototype_frames: int = 4,
        **kwargs: Any,
    ) -> "AngleDihedralCartesianEncoderMap":
        """Build an ADC model whose input shapes come from an on-disk
        ensemble HDF5 (written by :meth:`TrajEnsemble.save`) without loading
        the CVs into RAM — only ``prototype_frames`` frames per CV are read
        to derive shapes and sparse-mode detection. Pair with
        ``train_streaming(path)`` for fully out-of-core training."""
        from .core import HDF5BatchSource

        p = parameters if parameters is not None else ADCParameters()
        src = HDF5BatchSource(
            path, _needed_cv_names(p), batch_size=prototype_frames,
            steps_per_scan=1, seed=0,
        )
        try:
            proto = src.read_prototype(prototype_frames)
        finally:
            src.close()
        return cls(parameters=p, dataset=proto, **kwargs)

    @classmethod
    def from_checkpoint(
        cls,
        trajs: Any,
        checkpoint_path: Union[str, Path],
        use_previous_model: bool = False,
        dataset: Optional[tuple] = None,
        **kwargs: Any,
    ) -> "AngleDihedralCartesianEncoderMap":
        ckpt_path = Path(checkpoint_path)
        p, model_params, opt_npz, step, _ = cls._load_checkpoint_checked(
            ckpt_path, use_previous_model
        )
        out = cls(trajs, parameters=p, model_params=_tree_to_jax(model_params),
                  dataset=dataset, **kwargs)
        out._restore_checkpoint_state(step, opt_npz, ckpt_path)
        return out
