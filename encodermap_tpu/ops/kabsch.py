# encodermap_tpu/ops/kabsch.py
"""Weighted Kabsch superposition + batched RMSD.

Re-implements the reference's metric kernels
(``/root/reference/encodermap/callbacks/metrics.py:71-246``) as batched JAX
(vmapped SVD on device). Used by the ADCRMSDMetric equivalent and available
as a public op.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["kabsch_weighted", "rmsd", "align_frames"]

Array = jax.Array


def kabsch_weighted(
    P: Array, Q: Array, W: Optional[Array] = None
) -> tuple[Array, Array, Array]:
    """Optimal rotation R and translation t minimizing the weighted RMSD of
    ``P`` onto ``Q`` plus the resulting RMSD.

    Args:
        P: ``(n, 3)`` coordinates.
        Q: ``(n, 3)`` coordinates.
        W: optional ``(n,)`` weights (default: uniform).

    Returns:
        (rmsd, R, t) with ``P_aligned = P @ R.T + t``.
    """
    n = P.shape[0]
    if W is None:
        W = jnp.full((n,), 1.0 / n, P.dtype)
    else:
        W = W / jnp.sum(W)
    p_bar = jnp.sum(P * W[:, None], axis=0)
    q_bar = jnp.sum(Q * W[:, None], axis=0)
    Pc = P - p_bar
    Qc = Q - q_bar
    C = jnp.einsum(
        "ni,n,nj->ij", Qc, W, Pc, precision=jax.lax.Precision.HIGHEST
    )
    U, S, Vt = jnp.linalg.svd(C, full_matrices=False)
    det = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], P.dtype)).at[2, 2].set(det)
    # HIGHEST everywhere R is formed/applied: this platform's DEFAULT
    # matmul precision puts ~3e-3 error on 3x3 f32 products (CLAUDE.md),
    # far above the 1e-5 parity bar the RMSD/Align features feed
    hi = jax.lax.Precision.HIGHEST
    R = jnp.matmul(jnp.matmul(U, D, precision=hi), Vt, precision=hi)
    t = q_bar - jnp.matmul(R, p_bar, precision=hi)
    P_aligned = jnp.matmul(Pc, R.T, precision=hi) + q_bar
    msd = jnp.sum(W[:, None] * jnp.square(P_aligned - Q))
    return jnp.sqrt(jnp.maximum(msd, 0.0)), R, t


def rmsd(P: Array, Q: Array, W: Optional[Array] = None) -> Array:
    """Batched minimal RMSD after optimal superposition.

    Args:
        P, Q: ``(batch, n, 3)`` coordinate sets.
        W: optional ``(n,)`` weights.

    Returns:
        ``(batch,)`` RMSD values.
    """

    def one(p, q):
        return kabsch_weighted(p, q, W)[0]

    return jax.vmap(one)(P, Q)


def align_frames(
    xyz: Array,
    ref: Array,
    atom_indices: Optional[Array] = None,
    ref_atom_indices: Optional[Array] = None,
) -> Array:
    """Kabsch-fit every frame of ``xyz`` (``(n_frames, n_atoms, 3)``) onto
    ``ref`` (``(n_ref_atoms, 3)``) using the selected fit atoms, then apply
    the rotation+translation to the WHOLE frame.

    The single align-then-transform implementation behind
    ``SingleTraj.superpose``, ``AlignFeature``, and ``GroupCOMFeature``'s
    ``ref_geom`` — HIGHEST-precision matmuls throughout (3x3 products are
    ~3e-3 off at this platform's DEFAULT precision; CLAUDE.md rule).
    """
    xyz = jnp.asarray(xyz)
    ref = jnp.asarray(ref)
    ref_sel = ref if ref_atom_indices is None else ref[ref_atom_indices]

    def align_one(frame):
        fit = frame if atom_indices is None else frame[atom_indices]
        _, R, t = kabsch_weighted(fit, ref_sel)
        return jnp.matmul(
            frame, R.T, precision=jax.lax.Precision.HIGHEST
        ) + t

    return jax.vmap(align_one)(xyz)
