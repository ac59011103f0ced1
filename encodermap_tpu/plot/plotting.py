# encodermap_tpu/plot/plotting.py
"""Static plotting: free-energy maps, Ramachandran, distance histograms with
interactive sigmoid tuning, latent scatter.

Matplotlib re-implementations of the reference's most-used plotting helpers
(``/root/reference/encodermap/plot/plotting.py:268-2342``). Plotly/nglview
based views (ball-and-stick, dashboards) are gated on availability of those
packages.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional, Sequence, Union

import numpy as np

__all__ = [
    "plot_free_energy",
    "plot_ramachandran",
    "distance_histogram",
    "plot_latent_scatter",
    "plot_cluster",
    "plot_trajs_by_parameter",
]


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_free_energy(
    x: np.ndarray,
    y: Optional[np.ndarray] = None,
    bins: int = 100,
    kT: float = 1.0,
    ax: Any = None,
    cbar: bool = True,
    save_path: Optional[Union[str, Path]] = None,
):
    """-kT ln(p) free-energy surface over a 2D projection
    (reference ``plotting.py:1372-1448``)."""
    plt = _mpl()
    if y is None:
        x, y = np.asarray(x)[:, 0], np.asarray(x)[:, 1]
    H, xe, ye = np.histogram2d(x, y, bins=bins)
    H = H.T
    with np.errstate(divide="ignore"):
        F = -kT * np.log(H / H.max())
    F[~np.isfinite(F)] = np.nan
    if ax is None:
        fig, ax = plt.subplots()
    else:
        fig = ax.figure
    mesh = ax.pcolormesh(xe, ye, F, shading="auto", cmap="viridis")
    if cbar:
        fig.colorbar(mesh, ax=ax, label="free energy / kT")
    ax.set_xlabel("x")
    ax.set_ylabel("y")
    if save_path:
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
        return str(save_path)
    return ax


def plot_ramachandran(
    phi: np.ndarray,
    psi: np.ndarray,
    bins: int = 72,
    ax: Any = None,
    save_path: Optional[Union[str, Path]] = None,
):
    """Ramachandran density plot (reference ``plotting.py:2258-2341``)."""
    plt = _mpl()
    if ax is None:
        fig, ax = plt.subplots()
    else:
        fig = ax.figure
    ax.hist2d(
        np.asarray(phi).ravel(),
        np.asarray(psi).ravel(),
        bins=bins,
        range=[[-np.pi, np.pi], [-np.pi, np.pi]],
        cmap="viridis",
    )
    ax.set_xlabel(r"$\phi$ / rad")
    ax.set_ylabel(r"$\psi$ / rad")
    ax.set_xlim(-np.pi, np.pi)
    ax.set_ylim(-np.pi, np.pi)
    if save_path:
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
        return str(save_path)
    return ax


def distance_histogram(
    data: np.ndarray,
    periodicity: float,
    sigmoid_parameters: Sequence[float],
    bins: int = 50,
    low_d_max: float = 5.0,
    save_path: Optional[Union[str, Path]] = None,
):
    """High-D distance histogram with the sketch-map sigmoid overlaid, plus
    the implied low-D sigmoid — the tool for tuning ``dist_sig_parameters``
    (reference ``plotting.py:1650-2023``).

    Returns the matplotlib axes (or the save path).
    """
    plt = _mpl()
    from ..ops.distances import sigmoid
    from scipy.spatial.distance import pdist

    data = np.asarray(data)
    if len(data) > 1000:
        data = data[np.linspace(0, len(data) - 1, 1000).astype(int)]
    if periodicity == float("inf"):
        dists = pdist(data)
    else:
        # periodic pdist
        d = np.abs(data[:, None, :] - data[None, :, :])
        d = np.minimum(d, periodicity - d)
        dists = np.sqrt((d**2).sum(-1))[np.triu_indices(len(data), 1)]

    sig_h, a_h, b_h, sig_l, a_l, b_l = sigmoid_parameters
    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    ax = axes[0]
    counts, edges, _ = ax.hist(dists, bins=bins, density=True, alpha=0.5)
    r = np.linspace(1e-3, edges[-1], 300)
    sig_vals = np.asarray(sigmoid(sig_h, a_h, b_h)(r))
    ax2 = ax.twinx()
    ax2.plot(r, sig_vals, "C1", label=f"sigmoid({sig_h}, {a_h}, {b_h})")
    # the differentiated sigmoid shows which distances the loss is sensitive to
    dsig = np.gradient(sig_vals, r)
    ax2.plot(r, dsig / dsig.max(), "C2--", label="d sigmoid (norm.)")
    ax2.legend(loc="upper right", fontsize=8)
    ax.set_xlabel("high-d distance")
    ax.set_ylabel("density")
    ax.set_title("high-dimensional")

    ax = axes[1]
    rl = np.linspace(1e-3, low_d_max, 300)
    ax.plot(rl, np.asarray(sigmoid(sig_l, a_l, b_l)(rl)), "C1")
    ax.set_xlabel("low-d distance")
    ax.set_title(f"low-dimensional sigmoid({sig_l}, {a_l}, {b_l})")
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
        return str(save_path)
    return axes


def plot_latent_scatter(
    latent: np.ndarray,
    colors: Optional[np.ndarray] = None,
    ax: Any = None,
    save_path: Optional[Union[str, Path]] = None,
    s: float = 2.0,
):
    """Latent-space scatter, optionally colored (e.g. by cluster or edge id)."""
    plt = _mpl()
    latent = np.asarray(latent)
    if ax is None:
        fig, ax = plt.subplots()
    else:
        fig = ax.figure
    sc = ax.scatter(latent[:, 0], latent[:, 1], c=colors, s=s, cmap="tab20")
    if colors is not None:
        fig.colorbar(sc, ax=ax)
    ax.set_xlabel("latent 0")
    ax.set_ylabel("latent 1")
    if save_path:
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
        return str(save_path)
    return ax


def plot_cluster(
    trajs: Any,
    cluster_id: int,
    cluster_membership: np.ndarray,
    latent: np.ndarray,
    out_dir: Union[str, Path],
    max_structures: int = 10,
) -> dict:
    """Render one cluster: latent highlight plot + representative structures
    written as PDB (reference ``plotting.py:2922`` writes PDB + png + csv)."""
    from ..misc.clustering import rmsd_centroid_of_cluster

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    idx = np.where(np.asarray(cluster_membership) == cluster_id)[0]

    plt = _mpl()
    fig, ax = plt.subplots()
    ax.scatter(latent[:, 0], latent[:, 1], s=1, c="lightgray")
    ax.scatter(latent[idx, 0], latent[idx, 1], s=3, c="C1")
    png = out_dir / f"cluster_{cluster_id}.png"
    fig.savefig(png, dpi=120)
    plt.close(fig)

    np.savetxt(out_dir / f"cluster_{cluster_id}_frames.csv", idx, fmt="%d")

    result = {"png": str(png), "n_frames": len(idx)}
    if trajs is not None and len(idx):
        sub_idx = idx[:: max(1, len(idx) // max_structures)][:max_structures]
        # map flat frame indices back to (traj, frame)
        bounds = np.cumsum([0] + [t.n_frames for t in trajs])
        xyz = []
        top = None
        for fi in sub_idx:
            ti = int(np.searchsorted(bounds, fi, side="right") - 1)
            traj = trajs.trajs[ti]
            xyz.append(traj.xyz[fi - bounds[ti]])
            top = traj.top
        from ..data.pdb import write_pdb

        pdb = out_dir / f"cluster_{cluster_id}.pdb"
        write_pdb(pdb, top, np.stack(xyz))
        centroid_i, _ = rmsd_centroid_of_cluster(np.stack(xyz))
        result["pdb"] = str(pdb)
        result["centroid_frame"] = int(sub_idx[centroid_i])
    return result


def plot_trajs_by_parameter(
    latent: np.ndarray,
    parameter: np.ndarray,
    ax: Any = None,
    save_path: Optional[Union[str, Path]] = None,
):
    """Color the projection by any per-frame parameter (reference
    ``plotting.py:654``-style view, matplotlib backend)."""
    return plot_latent_scatter(latent, colors=np.asarray(parameter), ax=ax,
                               save_path=save_path)
