# encodermap_tpu/train/autoencoder.py
"""User-facing autoencoder classes: Autoencoder, EncoderMap.

API surface mirrors the reference
(``/root/reference/encodermap/autoencoder/autoencoder.py:573-1307``):
``train() / encode() / decode() / generate() / save() / from_checkpoint()``,
hypercube fallback data, loss selection by ``p.loss``.

TPU-native differences:

* the train loop runs as jitted scan chunks (see ``train/core.py``) with the
  dataset resident on device,
* data parallelism comes from a ``jax.sharding.Mesh``: the dataset and every
  sampled batch are sharded over the ``dp`` axis, parameters are replicated,
  and XLA inserts the all-gathers the all-pairs distance loss needs,
* losses and the optimizer update compile into the same XLA program.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from .. import losses as L
from ..misc.misc import create_n_cube
from ..misc.saving import (
    load_checkpoint,
    load_checkpoint_rng,
    load_pytree_into,
    save_checkpoint,
)
from ..misc.summaries import MetricsWriter
from ..models import sequential as seq
from ..parameters import Parameters
from .callbacks import Callback, CheckpointSaver, NaNInterrupt, ProgressBar
from .core import TrainState, make_optimizer, make_scan_trainer

__all__ = ["Autoencoder", "EncoderMap"]

Array = jax.Array


class _SubModel:
    """Callable wrapper giving ``encoder``/``decoder`` submodels the keras
    call conventions migrating code expects (``model(x)`` and
    ``model.predict(x)``)."""

    def __init__(self, fn) -> None:
        self._fn = fn

    def __call__(self, x, *args, **kwargs):
        return self._fn(x)

    def predict(self, x, *args, **kwargs):
        """keras-style alias of ``__call__`` (batching is internal)."""
        return self._fn(x)


class TrainerExtensions:
    """User-extension hooks + the shared jitted train-step machinery for all
    autoencoder classes (the reference's
    ``add_loss``/``add_callback``/``add_metric``/``plot_network``,
    ``autoencoder.py:1031-1109``)."""

    # loss-term keys that are logged as metrics but NOT summed into the
    # total (e.g. the ADC soft-start scale)
    _metrics_only: tuple = ()
    # donate the input TrainState to the jitted chunk (halves HBM traffic).
    # ADC sets False: its trainer is driven manually by bench/ablation
    # scripts that would otherwise hold deleted buffers.
    _donate_state: bool = True

    def add_callback(self, callback) -> None:
        """Append a :class:`Callback` dispatched at chunk granularity."""
        self.callbacks.append(callback)

    @property
    def encoder(self):
        """The encoder as a standalone callable with a keras-style
        ``predict`` alias (reference ``autoencoder.py:936``/``2161`` return
        the keras submodel)."""
        return _SubModel(self.encode)

    @property
    def decoder(self):
        """The decoder as a standalone callable with a keras-style
        ``predict`` alias (reference ``autoencoder.py:941``/``2166``)."""
        return _SubModel(self.decode)

    # -------------------------------------------------------- shared persistence
    @classmethod
    def _parameters_class(cls):
        from ..parameters import Parameters

        return Parameters

    def save(self, step: Optional[int] = None) -> Optional[str]:
        """Checkpoint model + optimizer + step (``autoencoder.py:1197``)."""
        if self.read_only:
            return None
        step = int(self.state.step) if step is None else int(step)
        return save_checkpoint(
            self.p.main_path,
            self.state.params,
            step,
            opt_state=self.state.opt_state,
            parameters=self.p,
            rng=self.state.rng,
        )

    def add_images_to_tensorboard(
        self,
        data: Optional[Any] = None,
        image_step: Optional[int] = None,
        max_size: int = 10000,
        additional_fns: Optional[list] = None,
    ) -> None:
        """Register latent scatter/density image logging every
        ``image_step`` steps (the reference's method of the same name,
        ``autoencoder.py:1031``). ``additional_fns`` are user callables
        ``fn(lowd) -> Figure | png bytes | array`` plotted alongside (its
        customization tutorial 03)."""
        from .callbacks import ImageCallback

        step = image_step if image_step is not None else self.p.summary_step
        self.callbacks.append(
            ImageCallback(self, step, data=data, max_points=max_size,
                          additional_fns=additional_fns)
        )

    @classmethod
    def _load_checkpoint_checked(cls, ckpt_path: Path,
                                 use_previous_model: bool):
        """(p, model_params, opt_npz, step, directory) for a checkpoint,
        with the step-vs-parameters.json consistency check both
        from_checkpoint implementations share."""
        directory = ckpt_path if ckpt_path.is_dir() else ckpt_path.parent
        p = cls._parameters_class().from_file(directory / "parameters.json")
        # n_encoder lets keras files with generically-named Dense layers
        # (hand-built/re-exported models) split positionally — the
        # Encoder_i/Decoder_i name mapping is tried first either way
        model_params, opt_npz, step = load_checkpoint(
            ckpt_path, n_encoder=len(p.n_neurons)
        )
        if step < 0:
            # ISO-time-named reference .keras checkpoints carry no step
            # in the filename; parameters.json is the source of truth
            step = p.current_training_step
        if step != p.current_training_step and not use_previous_model:
            raise ValueError(
                f"Checkpoint step {step} disagrees with parameters.json "
                f"({p.current_training_step}). Pass use_previous_model=True "
                f"to load this intermediate checkpoint anyway."
            )
        return p, model_params, opt_npz, step, directory

    def _restore_checkpoint_state(self, step: int, opt_npz, ckpt_path
                                  ) -> None:
        """Adopt step + optimizer state + PRNG key from a checkpoint."""
        self.state = self.state.replace(step=jnp.asarray(step, jnp.int32))
        if opt_npz is not None:
            self.state = self.state.replace(
                opt_state=load_pytree_into(self.state.opt_state, opt_npz)
            )
        rng = load_checkpoint_rng(ckpt_path)
        if rng is not None:
            self.state = self.state.replace(rng=jnp.asarray(rng))

    def add_loss(self, loss_fn, name: Optional[str] = None) -> None:
        """Add a custom loss ``fn(params, batch) -> scalar`` to the total.

        Must be jit-traceable; it runs inside the compiled train step and is
        logged under ``name`` (default: the function's __name__).
        """
        self.custom_losses.append(
            (name or getattr(loss_fn, "__name__", "custom_loss"), loss_fn)
        )
        self._trainer = None  # force retrace with the new graph

    def add_metric(self, metric_fn, name: Optional[str] = None) -> None:
        """Add a metric logged every step (no gradient contribution).

        Accepts, like the reference's ``add_metric`` (``autoencoder.py:
        1045``), an :class:`~encodermap_tpu.train.metrics.EncoderMapBaseMetric`
        subclass (instantiated with this trainer's parameters) or instance —
        its ``update(y_true, y_pred)`` is traced into the jitted step — or a
        plain function ``fn(params, batch) -> scalar``.
        """
        from .metrics import EncoderMapBaseMetric

        if isinstance(metric_fn, type) and issubclass(
            metric_fn, EncoderMapBaseMetric
        ):
            # by keyword: the built-in classes (ADCClashMetric,
            # ADCRMSDMetric) take distance_unit/name as their first
            # positional — the reference's positional ``metric(self.p)``
            # lands the Parameters object there and crashes/mislabels
            try:
                metric_fn = metric_fn(parameters=self.p)
            except TypeError:
                metric_fn = metric_fn(self.p)
        if isinstance(metric_fn, EncoderMapBaseMetric):
            metric = metric_fn

            def metric_fn(params, batch, _m=metric):
                return _m.update(*self._metric_io(params, batch))

            name = name or metric.name
        self.custom_metrics.append(
            (name or getattr(metric_fn, "__name__", "custom_metric"),
             metric_fn)
        )
        self._trainer = None

    def _cached_jit(self, key: str, fn):
        """Compile ``fn`` once per (instance, key) and reuse it across calls.

        Inference helpers must pass ``params`` as an *argument* to ``fn``
        rather than closing over ``self.state.params``: a fresh
        ``jax.jit(lambda ...)`` per call starts with an empty jit cache, so
        every ``encode()`` would retrace — and on the remote-compile TPU
        platform recompile — from scratch.
        """
        cache = self.__dict__.setdefault("_jit_cache", {})
        if key not in cache:
            cache[key] = jax.jit(fn)
        return cache[key]

    def _streaming_sharding(self):
        """NamedSharding for (steps, batch, ...) superbatches: batch axis
        over the mesh's dp axis; None without a mesh."""
        mesh = self.mesh
        if mesh is None:
            return None
        from jax.sharding import NamedSharding, PartitionSpec as P

        return NamedSharding(mesh, P(None, "dp"))

    def _streaming_budget(self, n_steps: Optional[int]) -> int:
        """Steps to run: an explicit ``n_steps`` is steps-from-here;
        ``None`` means ``p.n_steps`` as a GLOBAL budget, exactly like
        ``train()`` — a restored model does not overshoot its schedules
        (wave 30)."""
        if n_steps is not None:
            return int(n_steps)
        start = int(self.state.step)
        remaining = self.p.n_steps - start
        if remaining <= 0:
            print(
                f"This model has already been trained for {start} steps. "
                f"Increase p.n_steps to train further."
            )
        return remaining

    def _finish_streaming(self, history: dict) -> dict:
        """Persist after a streaming run — shared by the base and ADC
        paths so the NaN-abort no-persist contract holds for both."""
        self.history = history
        if getattr(self, "_streaming_nan_stop", False):
            # same contract as train(): keep parameters.json pointing at
            # the last finite checkpoint instead of the diverged state
            print(
                "Not persisting the diverged state; the newest on-disk "
                "checkpoint remains the last finite one."
            )
            return history
        self.p.current_training_step = int(self.state.step)
        if not self.read_only:
            self.p.save(Path(self.p.main_path) / "parameters.json")
            self.save()
        return history

    def _custom_loss_terms(self, params, batch) -> dict:
        return {name: fn(params, batch) for name, fn in self.custom_losses}

    def _custom_metric_terms(self, params, batch) -> dict:
        return {name: fn(params, batch) for name, fn in self.custom_metrics}

    def _metric_io(self, params, batch):
        """``(y_true, y_pred)`` handed to metric *objects* (see
        :mod:`encodermap_tpu.train.metrics`): the densified input batch and
        the decoded output, matching what the reference's keras fit loop
        feeds its metrics."""
        batch = seq.densify(params, batch)
        out = seq.decode(params, self.p, seq.encode(params, self.p, batch))
        return batch, out

    # ------------------------------------------------------------------ train step
    def _loss_and_aux(self, params, batch, step):
        """``(terms, aux)`` for one batch. ``aux`` carries forward
        intermediates that metric hooks reuse (empty for the base classes;
        the ADC passes its backmapped coordinates through so clash/RMSD
        tracking does not rerun the whole forward)."""
        return self._loss_terms(params, batch), ()

    def _aux_metric_terms(self, aux, batch) -> dict:
        """Metrics computed from the loss forward's aux (see above)."""
        return {}

    def _maybe_fused_trainer(self, steps: int):
        """Subclasses may provide a fully-fused kernel for their config."""
        return None

    def _validate_model_api(self, expected: str) -> None:
        """The reference's ``_get_model`` dispatch on ``p.model_api``
        (``autoencoder.py:446-502``): each autoencoder family accepts its
        own api name, ``"custom"`` is NotImplemented, anything else is a
        ValueError. Here the family IS the class, so this is a guard."""
        api = getattr(self.p, "model_api", expected)
        if api == expected:
            return
        if api == "custom":
            raise NotImplementedError("No custom API currently supported")
        if api in ("sequential", "functional"):
            raise ValueError(
                f"{type(self).__name__} uses the {expected!r} model api; "
                f"p.model_api={api!r} belongs to the "
                f"{'ADC' if api == 'functional' else 'sequential'} family"
            )
        raise ValueError(
            f"p.model_api must be 'sequential', 'functional' or 'custom', "
            f"got {api!r}"
        )

    def _maybe_write_summary(self) -> Optional[str]:
        """The reference writes ``main_path/complete_model_summary.txt``
        (keras ``model.summary()`` capture) when ``p.tensorboard or
        p.write_summary`` (``models/models.py:1051-1059``); same record
        here, tabulated from the params pytree."""
        if self.read_only or not (
            self.p.tensorboard or getattr(self.p, "write_summary", False)
        ):
            return None
        lines = [f"Model: {type(self).__name__}", "-" * 60]
        total = 0
        flat, _ = jax.tree_util.tree_flatten_with_path(self.state.params)
        for path, w in flat:
            name = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                            for k in path)
            n = int(np.prod(w.shape))
            total += n
            lines.append(f"{name:<40} {str(tuple(w.shape)):<16} {n:>10,}")
        lines += ["-" * 60, f"Total params: {total:,}"]
        out = Path(self.p.main_path) / "complete_model_summary.txt"
        out.write_text("\n".join(lines) + "\n")
        return str(out)

    def _make_train_step(self):
        """One optimizer step as a pure function ``(state, batch) ->
        (state, metrics)`` — shared by every autoencoder class; subclasses
        plug in via ``_loss_and_aux``/``_aux_metric_terms``/``_metrics_only``.
        """

        def train_step(state: TrainState, batch):
            def total(params):
                terms, aux = self._loss_and_aux(params, batch, state.step)
                terms.update(self._custom_loss_terms(params, batch))
                loss = jnp.asarray(0.0, jnp.float32)
                for k, v in terms.items():
                    if k not in self._metrics_only:
                        loss = loss + v
                return loss, (terms, aux)

            (loss, (terms, aux)), grads = jax.value_and_grad(
                total, has_aux=True
            )(state.params)
            updates, opt_state = self.optimizer.update(
                grads, state.opt_state, state.params
            )
            params = jax.tree_util.tree_map(
                lambda p_, u: p_ + u, state.params, updates
            )
            metrics = dict(terms)
            metrics["loss"] = loss
            schedule = getattr(self, "_lr_schedule", None)
            if schedule is not None:
                # the analog of the reference's LearningRateLogger
                # (customization tutorial 01/04): the per-step lr lands in
                # the JSONL/TensorBoard stream
                metrics["learning_rate"] = jnp.asarray(
                    schedule(state.step), jnp.float32
                )
            metrics.update(self._aux_metric_terms(aux, batch))
            metrics.update(self._custom_metric_terms(params, batch))
            return (
                state.replace(
                    params=params, opt_state=opt_state, step=state.step + 1
                ),
                metrics,
            )

        return train_step

    def _get_trainer(self, steps: Optional[int] = None):
        if steps is None:
            steps = max(1, min(self.p.steps_per_scan, self.p.n_steps))
        if not isinstance(self._trainer, dict):
            self._trainer = {}
        if steps not in self._trainer:
            trainer = self._maybe_fused_trainer(steps)
            if trainer is None:
                trainer = make_scan_trainer(
                    self._make_train_step(), self.p.batch_size, steps,
                    donate=self._donate_state,
                    # batched=False: every step consumes the full dataset
                    # (the reference's unbatched custom-loop mode,
                    # autoencoder.py:1001-1004)
                    full_batch=not getattr(self.p, "batched", True),
                )
            self._trainer[steps] = trainer
        return self._trainer[steps]

    # ------------------------------------------------------------------ training loop
    def _setup_callbacks(self) -> list:
        cbs: list = [ProgressBar(self.p.n_steps), NaNInterrupt()]
        if not self.read_only:
            cbs.append(CheckpointSaver(self, self.p.checkpoint_step))
        return cbs + self.callbacks

    @property
    def mesh(self):
        """Device mesh from ``p.mesh_shape`` (e.g. {"dp": 8} or
        {"dp": 4, "tp": 2}); None for single-device training."""
        if getattr(self, "_mesh", None) is None and self.p.mesh_shape:
            from ..parallel.mesh import make_mesh

            self._mesh = make_mesh(**self.p.mesh_shape)
        return getattr(self, "_mesh", None)

    def close(self) -> None:
        if self._metrics_writer is not None:
            self._metrics_writer.close()

    def train(self) -> dict:
        """Run ``n_steps - current_training_step`` optimizer steps.

        The SHARED scan-chunked loop for every autoencoder class (chunk
        stepping with exact n_steps accounting, metric history, strided
        summary writes, callback dispatch, final persistence); subclasses
        provide ``_device_data``/``_get_trainer``/``_setup_callbacks``.
        Returns the metric history (dict of per-step arrays), and as the
        reference does, persists parameters + a final checkpoint.
        """
        if self.p.training not in ("auto", "custom"):
            # same guard as the reference (autoencoder.py:483-494); both
            # modes run the identical jitted scan loop here — "custom" only
            # changes the batching semantics via p.batched
            raise ValueError(
                f"Parameter `training` has to be one of 'custom', 'auto'. "
                f"You supplied {self.p.training!r}."
            )
        start = int(self.state.step)
        remaining = self.p.n_steps - start
        if remaining <= 0:
            print(
                f"This model has already been trained for {start} steps. "
                f"Increase p.n_steps to train further."
            )
            return self.history

        sps = max(1, min(self.p.steps_per_scan, self.p.n_steps))
        data = self._device_data()
        cbs = self._setup_callbacks()
        if not self.read_only:
            if self._metrics_writer is not None:
                # re-train: don't leak the previous JSONL/TB handles (the
                # JSONL opens in append mode, so history accumulates)
                self._metrics_writer.close()
            self._metrics_writer = MetricsWriter(
                self.p.main_path, tensorboard=self.p.tensorboard
            )
        for cb in cbs:
            cb.on_train_begin(self)

        history: dict[str, list] = {}
        stop = False
        nan_stop = False
        done = 0
        while done < remaining and not stop:
            first_step = int(self.state.step)
            # exact step count: the final chunk shrinks to the remainder so
            # the optimizer never runs past n_steps
            chunk = min(sps, remaining - done)
            trainer = self._get_trainer(chunk)
            self.state, metrics = trainer(self.state, data)
            metrics = jax.device_get(metrics)
            n = len(next(iter(metrics.values())))
            for k, v in metrics.items():
                history.setdefault(k, []).append(v)
            if self._metrics_writer is not None:
                stride = max(1, self.p.summary_step)
                for i in range(n):
                    step_i = first_step + i + 1
                    if step_i % stride == 0:
                        self._metrics_writer.write_scalars(
                            step_i, {k: v[i] for k, v in metrics.items()}
                        )
            for cb in cbs:
                if cb.on_chunk_end(first_step, metrics) is False:
                    stop = True
                    nan_stop = isinstance(cb, NaNInterrupt)
                    # skip the remaining callbacks for this chunk: a NaN
                    # abort must not reach CheckpointSaver (which sits after
                    # NaNInterrupt) with the diverged parameters
                    break
            done += n

        for cb in cbs:
            cb.on_train_end(self)
        self.history = {k: np.concatenate(v) for k, v in history.items()}
        if nan_stop:
            # don't shadow the last good checkpoint with NaN weights, and
            # leave parameters.json pointing at it so from_checkpoint works
            print(
                "Not persisting the diverged state; the newest on-disk "
                "checkpoint remains the last finite one."
            )
        else:
            self.p.current_training_step = int(self.state.step)
            if not self.read_only:
                self.p.save(Path(self.p.main_path) / "parameters.json")
                self.save()
        if self._metrics_writer is not None:
            self._metrics_writer.close()
            self._metrics_writer = None
        return self.history

    def plot_network(self) -> Optional[str]:
        """Draw the layer stack to ``main_path/network.png`` (the analog of
        the reference's keras ``plot_model`` call, ``autoencoder.py:1094``)."""
        # offscreen render without flipping the process-global backend
        # (same rule as misc/summaries.py)
        import matplotlib.pyplot as plt

        dims: list = [self.input_dim] if hasattr(self, "input_dim") else []
        dims += list(self.p.n_neurons)
        dec = list(self.p.n_neurons[-2::-1])
        dims += dec + ([self.input_dim] if hasattr(self, "input_dim") else [])
        fig, ax = plt.subplots(figsize=(max(6, len(dims)), 3))
        for i, d in enumerate(dims):
            ax.add_patch(plt.Rectangle((i, -0.4), 0.6, 0.8, fc="#4878cf",
                                       ec="k"))
            ax.text(i + 0.3, 0, str(d), ha="center", va="center",
                    color="w", fontsize=9)
            if i:
                ax.annotate("", xy=(i, 0), xytext=(i - 0.4, 0),
                            arrowprops=dict(arrowstyle="->"))
        ax.set_xlim(-0.5, len(dims))
        ax.set_ylim(-1, 1)
        ax.axis("off")
        ax.set_title(f"{type(self).__name__} layer stack")
        out = Path(self.p.main_path) / "network.png"
        fig.savefig(out, dpi=120, bbox_inches="tight")
        plt.close(fig)
        print(f"network diagram saved to {out}")
        return str(out)


class Autoencoder(TrainerExtensions):
    """Base autoencoder: auto + center + regularization losses.

    Args:
        parameters: a :class:`Parameters` instance (defaults used if None).
        train_data: ``(n_samples, n_features)`` array. If None, hypercube toy
            data is generated, as the reference does
            (``autoencoder.py:791-795``).
        model_params: pre-initialized parameter pytree (for reloads).
        read_only: skip writing parameters/main_path artifacts.
    """

    _loss_names = ("auto_loss", "center_loss", "regularization_loss")

    def __init__(
        self,
        parameters: Optional[Parameters] = None,
        train_data: Optional[np.ndarray] = None,
        model_params: Optional[dict] = None,
        read_only: bool = False,
        sparse: bool = False,
        learning_rate_schedule=None,
    ) -> None:
        """``learning_rate_schedule``: optional callable ``step -> lr``
        (any optax schedule) replacing the constant ``p.learning_rate`` —
        the TPU-native equivalent of the reference's keras
        ``LearningRateScheduler`` callback. Not serialized: pass it again
        when reloading via ``from_checkpoint``."""
        self.p = parameters if parameters is not None else Parameters()
        self._lr_schedule = learning_rate_schedule
        self.read_only = read_only
        self._validate_model_api("sequential")
        self.sparse = sparse
        self._metrics_writer: Optional[MetricsWriter] = None
        self.history: dict[str, list] = {}

        if train_data is None:
            train_data, _ = create_n_cube(seed=self.p.seed)
            self.p.using_hypercube = True
        train_data = np.asarray(train_data, np.float32)
        # NaN inputs mark ragged multi-topology ensembles -> sparse mode:
        # zero-fill + a trainable square Dense densifier in the model (the
        # reference reroutes these into tf.sparse tensors + a Dense layer,
        # ``models.py:3165-3177``; masked-dense is the TPU equivalent).
        self._nan_mask = np.isnan(train_data)
        if self._nan_mask.any():
            self.sparse = True
        self.train_data = train_data
        self.input_dim = train_data.shape[1]

        if not read_only:
            Path(self.p.main_path).mkdir(parents=True, exist_ok=True)
            self.p.save(Path(self.p.main_path) / "parameters.json")

        seed = self.p.seed if self.p.seed is not None else 0
        key = jax.random.PRNGKey(seed)
        k_model, k_train = jax.random.split(key)
        if model_params is None:
            model_params = seq.init_params(
                k_model, self.p, self.input_dim, sparse=self.sparse
            )
        self.optimizer = make_optimizer(
            self._lr_schedule if self._lr_schedule is not None
            else self.p.learning_rate
        )
        self.state = TrainState.create(
            model_params, self.optimizer, k_train, step=self.p.current_training_step
        )
        self._trainer = None  # built lazily (jit cache)
        self.callbacks: list[Callback] = []
        self.custom_losses: list = []
        self.custom_metrics: list = []
        self._maybe_write_summary()

    def set_train_data(self, data: np.ndarray) -> None:
        """Replace the training data (reference ``autoencoder.py:788``);
        shapes must stay compatible with the built model."""
        data = np.asarray(data, np.float32)
        assert data.shape[1] == self.input_dim, (
            f"new data has {data.shape[1]} features, model expects "
            f"{self.input_dim}"
        )
        nan_mask = np.isnan(data)
        if nan_mask.any() and "densifier" not in self.state.params:
            # a dense-built model would zero-fill the NaNs with no trainable
            # densifier — silently training on literal zeros
            raise ValueError(
                "the new data holds NaNs (sparse mode) but this model was "
                "built dense (no densifier layer). Rebuild the model on the "
                "NaN-padded data or construct it with sparse=True."
            )
        self._nan_mask = nan_mask
        if nan_mask.any():
            self.sparse = True
        self.train_data = data

    # ------------------------------------------------------------------ losses
    def _loss_terms(self, params: dict, batch: Array) -> dict[str, Array]:
        """All loss contributions for one batch; subclasses extend."""
        p = self.p
        # sparse (NaN-padded) inputs run through the trainable densifier;
        # the densified vector is both encoder input and reconstruction
        # target (reference sparse path, ``models.py:3165-3177``)
        batch = seq.densify(params, batch)
        latent = seq.encode(params, p, batch)
        out = seq.decode(params, p, latent)
        terms = {
            "auto_loss": L.auto_loss(batch, out, p),
            "center_loss": L.center_loss(latent, p),
            "regularization_loss": L.regularization_loss(
                seq.regularization_sum(params), p
            ),
        }
        return terms

    def _shard_leading(self, x):
        """Shard an array's batch axis over the mesh's dp axis (GSPMD
        inserts the collectives the all-pairs losses need)."""
        mesh = self.mesh
        if mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(x, NamedSharding(mesh, P("dp")))

    def _device_data(self):
        data = self.train_data
        if self._nan_mask.any():
            data = np.nan_to_num(data, nan=0.0)
        return self._shard_leading(jnp.asarray(data))

    def train_streaming(self, source, n_steps: Optional[int] = None) -> dict:
        """Out-of-core training from a host superbatch source (e.g.
        :class:`encodermap_tpu.train.core.HDF5BatchSource`) — the
        million-frame path where CVs never fully materialize on device.
        With ``p.mesh_shape`` set, each uploaded superbatch is sharded over
        the mesh's dp axis (BASELINE config 5: streaming + data-parallel)."""
        from .core import run_streaming

        n = self._streaming_budget(n_steps)
        if n <= 0:
            return self.history
        history = run_streaming(self, source, n,
                                sharding=self._streaming_sharding())
        return self._finish_streaming(history)

    # ------------------------------------------------------------------ inference
    def _batched_apply(self, fn, data: np.ndarray, max_batch: int = 8192) -> np.ndarray:
        data = np.asarray(data, np.float32)
        single = data.ndim == 1
        if single:
            data = data[None]
        outs = []
        for i in range(0, len(data), max_batch):
            outs.append(np.asarray(fn(jnp.asarray(data[i : i + max_batch]))))
        out = np.concatenate(outs, axis=0)
        return out[0] if single else out

    def encode(self, data: Optional[np.ndarray] = None) -> np.ndarray:
        """Project data to the latent space (reference: ``autoencoder.py:1110``)."""
        if data is None:
            data = self.train_data
        fn = self._cached_jit(
            "encode",
            lambda params, x: seq.encode(
                params, self.p, seq.densify(params, x)
            ),
        )
        return self._batched_apply(lambda x: fn(self.state.params, x), data)

    def decode(self, latent: np.ndarray) -> np.ndarray:
        """Decode latent points back to input space (``autoencoder.py:1147``)."""
        fn = self._cached_jit(
            "decode", lambda params, z: seq.decode(params, self.p, z)
        )
        return self._batched_apply(lambda z: fn(self.state.params, z), latent)

    def generate(self, latent: np.ndarray) -> np.ndarray:
        """Alias of :meth:`decode` for the base class (``autoencoder.py:1177``)."""
        return self.decode(latent)

    # ------------------------------------------------------------------ persistence
    @property
    def model_params(self) -> dict:
        return self.state.params

    @classmethod
    def from_checkpoint(
        cls,
        checkpoint_path: Union[str, Path],
        train_data: Optional[np.ndarray] = None,
        sparse: bool = False,
        use_previous_model: bool = False,
        **kwargs: Any,
    ) -> "Autoencoder":
        """Rebuild from a checkpoint directory or file
        (reference: ``autoencoder.py:889-931`` + ``saving_loading_models.py:333``).
        """
        ckpt_path = Path(checkpoint_path)
        p, model_params, opt_npz, step, directory = (
            cls._load_checkpoint_checked(ckpt_path, use_previous_model)
        )
        if train_data is None and not p.using_hypercube:
            # silently regenerating hypercube data here would build a model
            # whose train_data dim disagrees with the loaded weights —
            # raise the reference's descriptive error instead
            # (``autoencoder.py:3230`` test contract)
            raise ValueError(
                f"The model in {directory} was trained on user data "
                f"(using_hypercube=False). Pass that data via "
                f"from_checkpoint(..., train_data=...) to reload it."
            )
        out = cls(parameters=p, train_data=train_data,
                  model_params=_tree_to_jax(model_params), sparse=sparse, **kwargs)
        out._restore_checkpoint_state(step, opt_npz, ckpt_path)
        return out

    @classmethod
    def _parameters_class(cls):
        return Parameters


def _tree_to_jax(tree):
    return jax.tree_util.tree_map(jnp.asarray, tree)


class EncoderMap(Autoencoder):
    """Adds the sketch-map sigmoid distance loss
    (reference: ``autoencoder.py:1232-1307``)."""

    _loss_names = (
        "auto_loss", "center_loss", "regularization_loss", "distance_loss",
    )

    def _loss_terms(self, params: dict, batch: Array) -> dict[str, Array]:
        terms = super()._loss_terms(params, batch)
        # densify here too (XLA CSEs the shared work with the base terms):
        # the sigmoid distance cost must see the same vectors the
        # autoencoder reconstructs
        batch = seq.densify(params, batch)
        latent = seq.encode(params, self.p, batch)
        terms["distance_loss"] = L.distance_loss(batch, latent, self.p)
        return terms

    def _maybe_fused_trainer(self, steps: int):
        """Route eligible configs (non-periodic, tanh/linear, standard
        4-loss stack, TPU backend, no user extensions) through the fully
        fused Pallas train kernel — ~3x faster per step than the XLA path
        at EncoderMap sizes (see ``ops/pallas_train.py``)."""
        from ..ops.pallas_train import (
            fused_trainer_available,
            make_fused_trainer,
        )

        if not getattr(self.p, "fused_trainer", True):
            return None
        if self.mesh is not None:
            # the fused Pallas kernel is a single-device program: its
            # cross-batch sigmoid contraction (every row against every
            # row) would need a per-shard kernel + psum rewrite to ride a
            # mesh. Multi-device EncoderMap therefore runs the XLA path —
            # ~3x slower per on-device step at bench scale (8 us fused vs
            # 24 us XLA on 1x v5e, docs/mosaic_findings.md) but sharded.
            # Disclosed in PARITY.md "Performance-first additions" +
            # BASELINE.md; warn once so the routing is never silent.
            if not getattr(self, "_warned_fused_mesh", False):
                self._warned_fused_mesh = True
                import warnings

                warnings.warn(
                    "mesh_shape is set: the fused Pallas train kernel is "
                    "single-device and this run uses the (sharded) XLA "
                    "path instead (~3x slower per on-device step; see "
                    "BASELINE.md). Set fused_trainer=False to silence.",
                    stacklevel=3,
                )
            return None
        if not getattr(self.p, "batched", True):
            # the fused kernel samples its own random batches
            return None
        # gate on the PARAMS, not just self.sparse: a sparse-trained
        # checkpoint reloaded with clean data keeps its densifier, and the
        # fused kernel's split/join_params would silently drop it
        if (self.sparse or "densifier" in self.state.params
                or self.custom_losses or self.custom_metrics
                or getattr(self, "_lr_schedule", None) is not None):
            # the fused kernel hardwires a constant lr
            return None
        # only for classes that keep EncoderMap's exact loss stack
        # (DihedralEncoderMap qualifies — it only overrides generate())
        if type(self)._loss_terms is not EncoderMap._loss_terms:
            return None
        if not fused_trainer_available(self.p, self.state.params,
                                       self.input_dim):
            return None
        return make_fused_trainer(self.p, steps, self.p.batch_size)


class DihedralEncoderMap(EncoderMap):
    """EncoderMap over backbone dihedrals whose ``generate`` back-maps onto a
    real topology by rotating its phi/psi bonds
    (reference: ``autoencoder.py:1310-1400``, which uses MDAnalysis; here the
    rotation sweep is the on-device scan of
    ``misc/backmapping_offline.py``).

    Training data layout must be [all phi, all psi] in residue order, as the
    reference's ``dihedral_backmapping`` expects.
    """

    def generate(self, latent: np.ndarray, top: Any = None) -> Any:
        """Decode latent points to dihedrals and rotate a topology into them.

        Args:
            latent: ``(n, 2)`` latent points.
            top: a pdb path or :class:`SingleTraj` providing topology + seed
                coordinates. Without it, raw dihedrals are returned.

        Returns:
            A :class:`SingleTraj` of generated conformations (or the raw
            dihedral array when ``top`` is None).
        """
        dihedrals = self.decode(np.asarray(latent, np.float32))
        if top is None:
            return dihedrals
        from ..data.trajectory import SingleTraj
        from ..misc.backmapping_offline import backmap_topology

        if not isinstance(top, SingleTraj):
            top = SingleTraj(top)
        xyz = backmap_topology(top.top, top.xyz[0], dihedrals)
        out = top[np.zeros(len(xyz), dtype=int)]
        out.load()
        out._xyz = xyz
        out._materialized = True
        return out
