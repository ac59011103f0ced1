# encodermap_tpu/plot/__init__.py
"""Plotting/visualization layer (matplotlib backend)."""

from .interactive import (
    DistanceHistogramInteractive,
    InteractivePlotting,
    interactive_path_visualization,
)
from .plotting import (
    animate_lowd_trajectory,
    digitize_dssp,
    distance_histogram_interactive,
    dssp_to_rgb,
    dssp_to_text,
    hex_to_rgba,
    get_density,
    get_free_energy,
    get_histogram,
    plot_end2end,
    plot_raw_data,
    to_density,
    to_free_energy,
    distance_histogram,
    dssp_fractions,
    plot_ball_and_stick,
    render_vmd,
    plot_cluster,
    plot_dssp,
    plot_free_energy,
    plot_latent_scatter,
    plot_ramachandran,
    plot_trajs_by_parameter,
)

__all__ = [
    "Dashboard",
    "DashboardSession",
    "HomePage",
    "UploadPage",
    "TrajPage",
    "TopPage",
    "ProjectionPage",
    "InteractivePlotting",
    "DistanceHistogramInteractive",
    "interactive_path_visualization",
    "distance_histogram",
    "distance_histogram_interactive",
    "dssp_to_text",
    "dssp_to_rgb",
    "hex_to_rgba",
    "plot_dssp",
    "plot_ball_and_stick",
    "render_vmd",
    "dssp_fractions",
    "digitize_dssp",
    "animate_lowd_trajectory",
    "get_density",
    "get_free_energy",
    "get_histogram",
    "plot_end2end",
    "plot_raw_data",
    "to_density",
    "to_free_energy",
    "plot_cluster",
    "plot_free_energy",
    "plot_latent_scatter",
    "plot_ramachandran",
    "plot_trajs_by_parameter",
]


#: dashboard members resolved lazily (the module logic is dash-free, but
#: keeping the import deferred spares every non-dashboard user its cost)
_DASHBOARD_NAMES = (
    "Dashboard", "DashboardSession", "HomePage", "UploadPage", "TrajPage",
    "TopPage", "ProjectionPage",
)


def __getattr__(name):
    """Lazy import for optional-dependency members."""
    if name in _DASHBOARD_NAMES:
        from . import dashboard

        return getattr(dashboard, name)
    raise AttributeError(name)
