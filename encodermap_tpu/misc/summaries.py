# encodermap_tpu/misc/summaries.py
"""Training observability: scalar metrics + latent-space images.

The reference writes gated TensorBoard scalars per loss, layer histograms,
and latent scatter/density images
(``/root/reference/encodermap/misc/summaries.py:73-696``). Here the jitted
train step returns *all* per-step costs as arrays (no graph-side gating
needed), and this module handles the host side:

* ``MetricsWriter`` appends JSONL rows (always) and optionally mirrors to
  TensorBoard via ``tf.summary`` when TensorFlow is importable and
  ``tensorboard=True``.
* ``image_summary`` renders the latent scatter + density with matplotlib to a
  PNG (and to TensorBoard when enabled), with the reference's NaN-placeholder
  behavior.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Optional, Union

import numpy as np

__all__ = ["MetricsWriter", "image_summary", "histogram_summary",
           "add_layer_summaries"]


class MetricsWriter:
    """Append-only scalar metrics log with optional TensorBoard mirror."""

    def __init__(
        self,
        main_path: Union[str, Path],
        tensorboard: bool = False,
        filename: str = "train_metrics.jsonl",
    ) -> None:
        from ..parallel.distributed import is_primary

        self.main_path = Path(main_path)
        self.path = self.main_path / filename
        # multi-host: only process 0 writes (every process computes the same
        # replicated metrics, so nothing is lost)
        self._primary = is_primary()
        self._fh = None
        if self._primary:
            self.main_path.mkdir(parents=True, exist_ok=True)
            self._fh = open(self.path, "a")
        self._tb_writer = None
        if tensorboard and self._primary:
            try:
                import tensorflow as tf  # noqa: deferred heavy import

                logdir = str(self.main_path / "train")
                self._tb_writer = tf.summary.create_file_writer(logdir)
            except Exception as e:  # pragma: no cover - TF optional
                print(f"TensorBoard writer unavailable ({e}); JSONL only.")

    def write_scalars(self, step: int, scalars: dict[str, Any]) -> None:
        if self._fh is None:
            return
        row = {"step": int(step)}
        for k, v in scalars.items():
            row[k] = float(np.asarray(v))
        self._fh.write(json.dumps(row) + "\n")
        self._fh.flush()
        if self._tb_writer is not None:
            import tensorflow as tf

            with self._tb_writer.as_default(step=int(step)):
                for k, v in scalars.items():
                    tf.summary.scalar(k, float(np.asarray(v)))
            self._tb_writer.flush()

    def write_image(self, step: int, name: str, png_bytes: bytes) -> None:
        if self._tb_writer is not None:
            import tensorflow as tf

            img = tf.image.decode_png(png_bytes, channels=4)[None]
            with self._tb_writer.as_default(step=int(step)):
                tf.summary.image(name, img)
            self._tb_writer.flush()

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()


def _param_leaf_stats(params: Any):
    """Yield ``(path_name, leaf_array)`` for every param leaf — the ONE
    tree walk + path naming shared by :func:`histogram_summary` and
    :func:`add_layer_summaries` (keeping the name scheme in one place)."""
    import jax

    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        yield name, np.asarray(leaf)


def histogram_summary(writer: MetricsWriter, step: int, params: Any) -> None:
    """Log weight/bias summary statistics per layer (the TPU-side stand-in
    for the reference's per-layer histograms, ``summaries.py:73-98``)."""
    stats = {}
    for name, arr in _param_leaf_stats(params):
        stats[f"weights/{name}/mean"] = float(arr.mean())
        stats[f"weights/{name}/std"] = float(arr.std())
    writer.write_scalars(step, stats)


def image_summary(
    latent: np.ndarray,
    step: int,
    main_path: Union[str, Path],
    writer: Optional[MetricsWriter] = None,
    max_points: int = 10000,
    name: str = "latent",
) -> Optional[str]:
    """Latent scatter + 2D histogram density image, saved as PNG.

    Mirrors ``misc/summaries.py:424-497`` including the NaN placeholder: if
    the latent contains NaNs, a text placeholder image is written instead.
    """
    import io

    # render offscreen WITHOUT touching the process-global backend: a
    # matplotlib.use('Agg') here would silently kill any interactive
    # plotting the user does after training writes its first image
    from matplotlib.backends.backend_agg import FigureCanvasAgg
    from matplotlib.figure import Figure

    latent = np.asarray(latent)
    if latent.shape[0] > max_points:
        idx = np.random.default_rng(0).choice(latent.shape[0], max_points, False)
        latent = latent[idx]

    fig = Figure(figsize=(8, 4))
    FigureCanvasAgg(fig)
    axes = fig.subplots(1, 2)
    if not np.all(np.isfinite(latent)):
        # inf kills hist2d just like NaN ("autodetected range ... is not
        # finite") — and this runs unguarded inside ImageCallback, so a
        # diverged latent must produce the placeholder, not abort training
        bad = "NaN" if np.any(np.isnan(latent)) else "inf"
        for ax in axes:
            ax.text(0.5, 0.5, f"{bad} in latent", ha="center", va="center")
            ax.set_axis_off()
    elif latent.ndim < 2 or latent.shape[1] < 2:
        # 1-D bottleneck: scatter/hist2d need two columns; plot the
        # histogram of the single latent coordinate instead of crashing
        flat = latent.reshape(len(latent), -1)
        col = flat[:, 0] if flat.shape[1] else np.zeros(len(flat))
        axes[0].plot(col, ".", ms=2)
        axes[0].set_title("latent (1-D) per point")
        axes[1].hist(col, bins=50)
        axes[1].set_title("latent density")
    else:
        axes[0].scatter(latent[:, 0], latent[:, 1], s=2)
        axes[0].set_title("latent scatter")
        axes[1].hist2d(latent[:, 0], latent[:, 1], bins=50)
        axes[1].set_title("latent density")
    buf = io.BytesIO()
    fig.savefig(buf, format="png", dpi=100)
    png = buf.getvalue()

    out = Path(main_path) / f"{name}_{step}.png"
    out.write_bytes(png)
    if writer is not None:
        writer.write_image(step, name, png)
    return str(out)


def write_user_image(
    img: object,
    step: int,
    main_path: Union[str, Path],
    name: str = "custom",
    writer: Optional[MetricsWriter] = None,
) -> str:
    """Persist a user-produced image from an ImageCallback
    ``additional_fns`` hook (reference ``callbacks.py:346-496``).

    Accepts a matplotlib Figure, raw PNG bytes, or an (H, W[, C]) array.
    """
    import io

    if hasattr(img, "savefig"):  # matplotlib Figure
        buf = io.BytesIO()
        img.savefig(buf, format="png", dpi=100)
        png = buf.getvalue()
    elif isinstance(img, (bytes, bytearray)):
        png = bytes(img)
    else:
        arr = np.asarray(img)
        from matplotlib.backends.backend_agg import FigureCanvasAgg
        from matplotlib.figure import Figure

        fig = Figure(figsize=(5, 5))
        FigureCanvasAgg(fig)
        ax = fig.subplots()
        ax.imshow(arr, origin="lower")
        ax.set_axis_off()
        buf = io.BytesIO()
        fig.savefig(buf, format="png", dpi=100)
        png = buf.getvalue()
    out = Path(main_path) / f"{name}_{step}.png"
    out.write_bytes(png)
    if writer is not None:
        writer.write_image(step, name, png)
    return str(out)


def add_layer_summaries(writer: MetricsWriter, step: int, params: Any,
                        namescope: str = "") -> None:
    """Reference-named per-layer weight/bias statistics
    (``summaries.py:73-98``): grouped under Encoder/Decoder/Latent
    namescopes derived from the param-tree paths. A thin veneer over
    :func:`histogram_summary` that keeps the reference's grouping scheme
    in the scalar names."""
    stats = {}
    for name, arr in _param_leaf_stats(params):
        low = name.lower()
        if "encoder" in low:
            scope = "Encoder"
        elif "decoder" in low:
            scope = "Decoder"
        elif "latent" in low:
            scope = "Latent"
        else:
            scope = "InputOutputLayers"
        if namescope:
            scope = f"{namescope}/{scope}"
        kind = "biases" if arr.ndim == 1 else "weights"
        stats[f"{scope}/{name}/{kind}/mean"] = float(arr.mean())
        stats[f"{scope}/{name}/{kind}/std"] = float(arr.std())
    writer.write_scalars(step, stats)
