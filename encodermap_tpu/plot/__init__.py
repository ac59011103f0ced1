# encodermap_tpu/plot/__init__.py
"""Plotting/visualization layer (matplotlib backend)."""

from .interactive import InteractivePlotting
from .plotting import (
    digitize_dssp,
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
    "InteractivePlotting",
    "distance_histogram",
    "plot_dssp",
    "plot_ball_and_stick",
    "render_vmd",
    "dssp_fractions",
    "digitize_dssp",
    "plot_cluster",
    "plot_free_energy",
    "plot_latent_scatter",
    "plot_ramachandran",
    "plot_trajs_by_parameter",
]


def __getattr__(name):
    """Lazy import for optional-dependency members."""
    if name == "Dashboard":
        from .dashboard import Dashboard

        return Dashboard
    raise AttributeError(name)
