# encodermap_tpu/train/callbacks.py
"""Host-side training callbacks.

The reference drives per-step behavior with Keras callbacks
(``/root/reference/encodermap/callbacks/callbacks.py``): ProgressBar,
CheckpointSaver, EarlyStop, NoneInterruptCallback (NaN abort),
TensorboardWriteBool, IncreaseCartesianCost, ImageCallback.

In the TPU design the hot loop is an on-device ``lax.scan``, so callbacks run
at *chunk* granularity: after every ``steps_per_scan`` steps the host receives
the stacked per-step metrics and dispatches them here. Two reference
callbacks disappear by construction:

* ``IncreaseCartesianCost`` — the soft-start scale is computed in-graph from
  the step counter (:func:`encodermap_tpu.losses.soft_start_scale`).
* ``TensorboardWriteBool`` — the writer simply subsamples rows on host.
"""

from __future__ import annotations

import sys
from typing import Any, Optional

import jax
import numpy as np

__all__ = [
    "Callback",
    "ProgressBar",
    "CheckpointSaver",
    "EarlyStop",
    "NaNInterrupt",
    "ImageCallback",
]


class Callback:
    """Base callback; receives per-step metric rows after each scan chunk.

    ``on_chunk_end(first_step, metrics)`` gets ``metrics`` as a dict of
    1-D arrays of length ``steps_per_scan`` where row i belongs to global
    step ``first_step + i + 1`` — the 1-based number of the COMPLETED
    step, identical to the ``step`` field the metrics writer puts in
    train_metrics.jsonl/TensorBoard. Return ``False`` to stop training.
    """

    def on_train_begin(self, autoencoder: Any) -> None: ...

    def on_chunk_end(self, first_step: int, metrics: dict) -> Optional[bool]: ...

    def on_train_end(self, autoencoder: Any) -> None: ...


class ProgressBar(Callback):
    """tqdm progress bar (falls back to line prints), showing the current
    combined loss like the reference's ProgressBar (``callbacks.py:272-330``)."""

    def __init__(self, n_steps: int) -> None:
        self.n_steps = n_steps
        self._bar = None

    def on_train_begin(self, autoencoder: Any) -> None:
        try:
            from tqdm import tqdm  # type: ignore

            self._bar = tqdm(total=self.n_steps, unit="step", file=sys.stdout)
        except ImportError:
            self._bar = None

    def on_chunk_end(self, first_step: int, metrics: dict) -> None:
        n = len(next(iter(metrics.values())))
        loss = float(np.asarray(metrics.get("loss", [np.nan])[-1]))
        if self._bar is not None:
            self._bar.update(n)
            self._bar.set_postfix(loss=f"{loss:.4f}")
        else:
            print(f"step {first_step + n}: loss={loss:.4f}", flush=True)

    def on_train_end(self, autoencoder: Any) -> None:
        if self._bar is not None:
            self._bar.close()


class CheckpointSaver(Callback):
    """Save a checkpoint every ``checkpoint_step`` steps
    (reference: ``callbacks.py:519-529``)."""

    def __init__(self, autoencoder: Any, checkpoint_step: int) -> None:
        self.autoencoder = autoencoder
        self.checkpoint_step = checkpoint_step
        self._last_saved = -1

    def on_chunk_end(self, first_step: int, metrics: dict) -> None:
        from ..parallel.distributed import is_primary

        if not is_primary():
            return
        if self.checkpoint_step <= 0:
            return  # <=0 disables checkpointing (ZeroDivision guard)
        n = len(next(iter(metrics.values())))
        last = first_step + n
        due = (last // self.checkpoint_step) * self.checkpoint_step
        if due > self._last_saved and due > first_step:
            self.autoencoder.save(step=last)
            self._last_saved = due


class EarlyStop(Callback):
    """Stop when the monitored loss hasn't improved for ``patience`` steps
    (reference: ``callbacks.py:219-269``).

    With ``restore_best_weights=True`` the parameters from the
    best-so-far chunk are put back on stop, like the reference's
    ``self.model.set_weights(self.best_weights)``. Snapshots are taken at
    chunk (``steps_per_scan``) granularity — the on-device scan does not
    surface per-step weights."""

    def __init__(self, monitor: str = "loss", patience: int = 1000,
                 min_delta: float = 0.0,
                 restore_best_weights: bool = False) -> None:
        self.monitor = monitor
        self.patience = patience
        self.min_delta = min_delta
        self.restore_best_weights = restore_best_weights
        self.best = np.inf
        self.best_step = 0
        self._autoencoder: Any = None
        self._best_params: Any = None

    def on_train_begin(self, autoencoder: Any) -> None:
        self._autoencoder = autoencoder

    def on_chunk_end(self, first_step: int, metrics: dict) -> Optional[bool]:
        if self.monitor not in metrics:
            # a Keras-habit monitor like 'val_loss': warn once and skip
            # instead of KeyError-aborting the whole training run
            if not getattr(self, "_warned_missing", False):
                import warnings

                warnings.warn(
                    f"EarlyStop: monitored metric {self.monitor!r} not in "
                    f"emitted metrics {sorted(metrics)}; skipping."
                )
                self._warned_missing = True
            return None
        vals = np.asarray(metrics[self.monitor])
        i = int(vals.argmin())
        if vals[i] < self.best - self.min_delta:
            self.best = float(vals[i])
            # 1-based completed-step label, matching the JSONL rows
            self.best_step = first_step + i + 1
            if self.restore_best_weights and self._autoencoder is not None:
                # host copy: the train step donates its input buffers, so
                # device arrays held here would be deleted by the next chunk
                self._best_params = jax.tree_util.tree_map(
                    lambda x: np.array(x), self._autoencoder.state.params
                )
        elif first_step + len(vals) - self.best_step > self.patience:
            print(f"EarlyStop: no {self.monitor} improvement for "
                  f"{self.patience} steps (best {self.best:.6f}).")
            if self._best_params is not None:
                print("Restoring model weights from the best chunk.")
                self._autoencoder.state = self._autoencoder.state.replace(
                    params=jax.tree_util.tree_map(
                        jax.numpy.asarray, self._best_params
                    )
                )
            return False
        return None


class NaNInterrupt(Callback):
    """Abort when the loss goes NaN — the reference's NoneInterruptCallback
    (``callbacks.py:87-109``) checks weights; checking the loss catches the
    same divergence one step earlier without pulling params to host."""

    def on_chunk_end(self, first_step: int, metrics: dict) -> Optional[bool]:
        if metrics.get("loss") is None:  # before asarray: asarray(None) is
            return None                  # a 0-d object array, never None
        loss = np.asarray(metrics["loss"])
        if not np.all(np.isfinite(loss)):
            bad = int(np.argmax(~np.isfinite(loss)))
            # label matches the JSONL/TensorBoard step of the same row
            print(f"NaN/Inf loss at step {first_step + bad + 1}; "
                  f"stopping training.")
            return False
        return None


class ImageCallback(Callback):
    """Write latent scatter/density images every ``image_step`` steps
    (reference: ``callbacks.py:333-516``)."""

    def __init__(self, autoencoder: Any, image_step: int,
                 data: Optional[np.ndarray] = None, max_points: int = 10000,
                 additional_fns: Optional[list] = None) -> None:
        """``additional_fns``: user callables ``fn(lowd) -> image`` run at
        every image step with the latent projection (the reference's
        ``additional_fns``, ``callbacks.py:346-496``; its customization
        tutorial 03). The return value may be a matplotlib Figure, raw PNG
        bytes, or an (H, W[, C]) array; each is written as
        ``custom_{k}_{step}.png`` and to the metrics writer."""
        self.autoencoder = autoencoder
        self.image_step = image_step
        self.data = data
        self.max_points = max_points
        self.additional_fns = list(additional_fns or [])
        self._last = -1

    def on_chunk_end(self, first_step: int, metrics: dict) -> None:
        if self.image_step <= 0:
            return  # <=0 disables image writing (ZeroDivision guard)
        from ..parallel.distributed import is_primary

        if not is_primary():
            # pod training: one process renders/writes latent_{step}.png
            # (same gate as CheckpointSaver; avoids N processes racing on
            # the same file in a shared main_path)
            return
        n = len(next(iter(metrics.values())))
        last = first_step + n
        due = (last // self.image_step) * self.image_step
        if due > self._last and due > first_step:
            from ..misc.summaries import image_summary

            data = self.data
            if data is None:
                data = self.autoencoder.train_data
            if isinstance(data, (tuple, list)):
                # ADC models train on a tuple of CV arrays (ragged widths:
                # np.asarray would raise); slice FRAMES of each member
                data = tuple(
                    np.asarray(d)[: self.max_points] for d in data
                )
            else:
                data = np.asarray(data)[: self.max_points]
            latent = self.autoencoder.encode(data)
            writer = getattr(self.autoencoder, "_metrics_writer", None)
            image_summary(
                latent, last, self.autoencoder.p.main_path,
                writer=writer,
                max_points=self.max_points,
            )
            for k, fn in enumerate(self.additional_fns):
                from ..misc.summaries import write_user_image

                fn_name = getattr(fn, "__name__", "")
                if not fn_name.isidentifier():  # lambdas, partials, ...
                    fn_name = f"custom_{k}"
                try:
                    write_user_image(
                        fn(np.asarray(latent)), last,
                        self.autoencoder.p.main_path,
                        name=fn_name,
                        writer=writer,
                    )
                except Exception as e:  # a broken user fn must not kill
                    print(f"ImageCallback: additional_fns[{k}] failed "
                          f"({type(e).__name__}: {e}); skipping.")
            self._last = due
