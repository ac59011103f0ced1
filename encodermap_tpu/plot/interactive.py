# encodermap_tpu/plot/interactive.py
"""InteractivePlotting: select latent-space regions -> cluster -> generate.

The reference builds a Jupyter/nglview lasso UI
(``/root/reference/encodermap/plot/interactive_plotting.py:521``). This
re-design separates the *logic* (selection, cluster writing, path decoding)
from the *widget* so it works headless (tests, scripts) and, when matplotlib
is interactive, via ``LassoSelector``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional, Sequence, Union

import numpy as np

__all__ = ["InteractivePlotting"]


class InteractivePlotting:
    """Latent-space selection + generation sessions.

    Args:
        autoencoder: an EncoderMap/ADC instance (needs encode/generate).
        trajs: optional TrajEnsemble for structure output.
        data: data to project (defaults to the autoencoder's train data).
    """

    def __init__(
        self,
        autoencoder: Any,
        trajs: Any = None,
        data: Optional[np.ndarray] = None,
        main_path: Optional[Union[str, Path]] = None,
    ) -> None:
        self.autoencoder = autoencoder
        self.trajs = trajs
        self.main_path = Path(
            main_path or getattr(autoencoder.p, "main_path", ".")
        )
        if data is None:
            data = autoencoder.train_data
        self.data = data
        self.latent = np.asarray(autoencoder.encode(data))
        self._selection: Optional[np.ndarray] = None

    # ------------------------------------------------------------------ selection
    def select(self, polygon: Sequence[tuple[float, float]]) -> np.ndarray:
        """Select latent points inside a polygon (the lasso). Returns frame
        indices and stores them as the active selection."""
        from matplotlib.path import Path as MplPath

        path = MplPath(np.asarray(polygon))
        mask = path.contains_points(self.latent[:, :2])
        self._selection = np.where(mask)[0]
        return self._selection

    def select_rectangle(self, x0, y0, x1, y1) -> np.ndarray:
        return self.select([(x0, y0), (x1, y0), (x1, y1), (x0, y1)])

    @property
    def selection(self) -> np.ndarray:
        if self._selection is None:
            raise RuntimeError("nothing selected yet — call select() first")
        return self._selection

    # ------------------------------------------------------------------ actions
    def cluster(self, name: str = "cluster") -> dict:
        """Write the selected frames as a cluster: csv of indices, latent
        highlight png, and (with trajs) a PDB of representative structures."""
        from .plotting import plot_cluster

        membership = np.full(len(self.latent), -1)
        membership[self.selection] = 0
        out = plot_cluster(
            self.trajs, 0, membership, self.latent,
            self.main_path / "clusters" / name,
        )
        return out

    def path(self, points: Sequence[tuple[float, float]], n: int = 50,
             mode: str = "linear") -> np.ndarray:
        """Interpolate a path through latent space and decode/generate along
        it (the reference's bezier/path tools,
        ``plot/utils.py:582-663``).

        Args:
            points: control points in latent space.
            n: samples along the path.
            mode: "linear" (piecewise-linear through the points) or "bezier"
                (Bernstein-polynomial curve with the points as control
                polygon, like the reference's BezierBuilder).
        """
        pts = np.asarray(points, np.float32)
        ts = np.linspace(0, 1, n)
        if mode == "bezier":
            from math import comb

            k = len(pts) - 1
            bern = np.stack(
                [comb(k, i) * ts**i * (1 - ts) ** (k - i)
                 for i in range(k + 1)], axis=1,
            )  # (n, k+1)
            path = bern @ pts
        elif mode == "linear":
            seg_lengths = np.linalg.norm(np.diff(pts, axis=0), axis=1)
            t = np.concatenate([[0], np.cumsum(seg_lengths)])
            t = t / t[-1]
            path = np.stack(
                [np.interp(ts, t, pts[:, i]) for i in range(pts.shape[1])],
                axis=1,
            )
        else:
            raise ValueError(f"unknown path mode {mode!r}")
        return self.autoencoder.generate(path)

    # ------------------------------------------------------------------ widget
    def show(self):
        """Open the matplotlib lasso UI (interactive backends only)."""
        import matplotlib.pyplot as plt
        from matplotlib.widgets import LassoSelector

        fig, ax = plt.subplots()
        ax.scatter(self.latent[:, 0], self.latent[:, 1], s=2)
        selector = LassoSelector(ax, onselect=lambda verts: self.select(verts))
        ax.set_title("lasso-select latent points; then call .cluster()")
        plt.show()
        return selector
