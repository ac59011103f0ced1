# encodermap_tpu/ops/backmap.py
"""Backmapping: internal coordinates (bond lengths, angles, dihedrals) -> xyz.

The reference implements this as strictly sequential Python/TF loops:

* ``chain_in_plane`` (``/root/reference/encodermap/encodermap_tf1/backmapping.py:97-119``)
  places a planar zig-zag chain one bond at a time with the angle recurrence
  ``a_{i+1} = pi - angle_i - a_i`` and alternating y-sign.
* ``dihedral_to_cartesian_tf_one_way_layers``
  (``/root/reference/encodermap/misc/backmapping.py:1873-1912``) rotates the
  chain tail out of the plane one dihedral at a time, each rotation about an
  axis that previous rotations have already moved.

Both are re-derived here as *parallel* TPU-native computations:

* The angle recurrence has the closed form
  ``a_i = (-1)^i * cumsum_j[ (-1)^(j+1) (pi - angle_j) ]`` — two cumsative
  scans and the positions follow from cumsums of ``L_i cos(a_i)`` /
  ``L_i sin(a_i) * (-1)^i``. O(log n) depth instead of O(n).

* For the dihedral chain, note that a rotation about an axis that was moved
  by a prior transform C is ``A = C B C^{-1}`` where B is the same rotation
  about the *original* axis. The sequential composition therefore telescopes:

      C_i = A_i ∘ ... ∘ A_0 = (C_{i-1} B_i C_{i-1}^{-1}) C_{i-1} = C_{i-1} B_i
          = B_0 ∘ B_1 ∘ ... ∘ B_i      (applied right-to-left)

  where ``B_i`` is the Rodrigues rotation about the FIXED chain-in-plane axis
  through atoms (i+1, i+2) by the i-th dihedral. The final position of atom k
  is ``(B_0 B_1 ... B_{k-2}) q_k`` — a cumulative composition of affine
  transforms, computed with ``jax.lax.associative_scan`` in O(log n) matmul
  rounds. All transforms are 3x4 affines stored as (3,3) linear + (3,) offset.

Numerical parity with the reference loop is asserted in
``tests/test_backmap.py`` against an independent sequential NumPy oracle.
"""

from __future__ import annotations

from math import pi
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "chain_in_plane",
    "dihedrals_to_cartesian",
    "dihedral_to_cartesian_one_way",
    "split_and_reverse_dihedrals",
    "split_and_reverse_cartesians",
    "backmap",
    "backmap_multimer",
    "rotation_matrices",
    "guess_amide_H",
    "guess_amide_O",
    "guess_sp2_atom",
    "merge_cartesians",
    "straight_tetrahedral_chain",
]

Array = jax.Array


# ----------------------------------------------------------------------------
# chain in plane
# ----------------------------------------------------------------------------


def chain_in_plane(lengths: Array, angles: Array) -> Array:
    """Place a zig-zag chain in the xy-plane from bond lengths and angles.

    Args:
        lengths: ``(batch, n_atoms - 1)`` bond lengths (broadcastable batch).
        angles: ``(batch, n_atoms - 2)`` bond angles.

    Returns:
        ``(batch, n_atoms, 3)`` coordinates with z == 0.

    Matches ``encodermap_tf1/backmapping.py:97-119`` semantics: the heading
    angle follows ``a_0 = 0; a_{i+1} = pi - angles[:, i] - a_i`` and the
    y-step of bond i is multiplied by ``(-1)^i``.

    Closed form: with ``s_j = (-1)^(j+1) (pi - angles[:, j])``,
    ``a_i = (-1)^i * sum_{j<i} s_j`` — a cumsum, fully parallel.
    """
    n_bonds = lengths.shape[-1]
    n_angles = angles.shape[-1]
    assert n_bonds == n_angles + 1, f"{n_bonds=} must be n_angles+1 ({n_angles=})"

    dtype = jnp.result_type(lengths, angles)
    signs_a = jnp.asarray(
        np.where(np.arange(n_angles) % 2 == 0, -1.0, 1.0), dtype=dtype
    )
    # heading angle before bond i (i = 0..n_bonds-1)
    s = signs_a[None, :] * (pi - angles)  # (batch, n_angles)
    csum = jnp.cumsum(s, axis=-1)
    sign_i = jnp.asarray(
        np.where(np.arange(1, n_bonds) % 2 == 0, 1.0, -1.0), dtype=dtype
    )
    heading = jnp.concatenate(
        [jnp.zeros((angles.shape[0], 1), dtype=dtype), sign_i[None, :] * csum],
        axis=-1,
    )  # (batch, n_bonds)

    y_sign = jnp.asarray(
        np.where(np.arange(n_bonds) % 2 == 0, 1.0, -1.0), dtype=dtype
    )
    dx = lengths * jnp.cos(heading)
    dy = lengths * jnp.sin(heading) * y_sign[None, :]

    zeros = jnp.zeros((dx.shape[0], 1), dtype=dtype)
    xs = jnp.concatenate([zeros, jnp.cumsum(dx, axis=-1)], axis=-1)
    ys = jnp.concatenate([zeros, jnp.cumsum(dy, axis=-1)], axis=-1)
    zs = jnp.zeros_like(xs)
    return jnp.stack([xs, ys, zs], axis=-1)


def straight_tetrahedral_chain(
    n_atoms: Optional[int] = None, bond_lengths: Optional[np.ndarray] = None
) -> np.ndarray:
    """Host-side helper: a straight chain with tetrahedral-ish geometry.

    Reference: ``encodermap_tf1/backmapping.py:71-94``.
    """
    dx = np.cos(70.63 / 180 * np.pi)
    dy = np.sin(70.63 / 180 * np.pi)
    if n_atoms is not None and bond_lengths is None:
        coordinates = np.zeros((n_atoms, 3), dtype=np.float32)
        indices = np.repeat(np.arange(int(n_atoms / 2) + 1), 2)
        coordinates[:, 0] = indices[1 : n_atoms + 1] + dx * indices[0:n_atoms]
        coordinates[:, 1] = dy * indices[0:n_atoms]
        return coordinates
    if bond_lengths is not None:
        bond_lengths = np.asarray(bond_lengths)
        n_bonds = len(bond_lengths)
        n_atoms = n_atoms or n_bonds + 1
        dxs = bond_lengths * np.tile([1, dx], int(n_atoms / 2))[:n_bonds]
        dys = bond_lengths * np.tile([0, dy], int(n_atoms / 2))[:n_bonds]
        coordinates = np.zeros((n_atoms, 3), dtype=np.float32)
        coordinates[1:, 0] = np.cumsum(dxs)
        coordinates[1:, 1] = np.cumsum(dys)
        return coordinates
    raise ValueError("provide n_atoms or bond_lengths")


# ----------------------------------------------------------------------------
# dihedral chain via associative scan
# ----------------------------------------------------------------------------


def rotation_matrices(axis_unit: Array, angle: Array) -> Array:
    """Batched Rodrigues rotation matrices for row-vector right-multiplication.

    Returns R with ``x_rotated = x @ R``, matching the reference's convention
    (``misc/backmapping.py:1950-1970``): for column vectors this is a rotation
    by ``-angle`` about ``axis``; the reference compensates by negating the
    dihedrals before use, and so do we.

    Args:
        axis_unit: ``(..., 3)`` unit axis vectors.
        angle: ``(...,)`` rotation angles.

    Returns:
        ``(..., 3, 3)`` matrices.
    """
    x, y, z = axis_unit[..., 0], axis_unit[..., 1], axis_unit[..., 2]
    zeros = jnp.zeros_like(x)
    # cross-product matrix K (same layout as the reference's tf implementation)
    K = jnp.stack(
        [
            jnp.stack([zeros, -z, y], axis=-1),
            jnp.stack([z, zeros, -x], axis=-1),
            jnp.stack([-y, x, zeros], axis=-1),
        ],
        axis=-2,
    )
    c = jnp.cos(angle)[..., None, None]
    s = jnp.sin(angle)[..., None, None]
    eye = jnp.eye(3, dtype=axis_unit.dtype)
    outer = axis_unit[..., :, None] * axis_unit[..., None, :]
    return c * eye + s * K + (1.0 - c) * outer


def _rotation_compose(A_f, A_g):
    """Compose rotation matrices acting on ROW vectors: ``x -> x @ A``.

    ``combine(f, g)(x) = f(g(x))`` -- g applied first -- is ``x @ (A_g A_f)``.
    The scan folds ``c_i = combine(c_{i-1}, B_i)``, yielding
    ``C_i = B_0 o B_1 o ... o B_i`` with ``B_i`` applied first: exactly the
    telescoped composition derived in the module docstring.
    """
    return jnp.einsum("...ij,...jk->...ik", A_g, A_f, precision=jax.lax.Precision.HIGHEST)


def _quat_compose(f, g):
    """Hamilton product p ⊗ q on component-separated quaternions.

    Components are ``(batch, n)`` arrays (structure-of-arrays layout): the
    chain dim n lives in the TPU lane axis, so each compose is 16 fully
    vectorized multiply-adds — versus 3x3-matrix composition whose
    trailing dim of 3 wastes 125/128 lanes.

    Scan convention matches :func:`_rotation_compose`: ``combine(f, g)``
    applies g's rotation FIRST, i.e. column-matrices R(f)R(g) = R(f ⊗ g).
    """
    fw, fx, fy, fz = f
    gw, gx, gy, gz = g
    return (
        fw * gw - fx * gx - fy * gy - fz * gz,
        fw * gx + fx * gw + fy * gz - fz * gy,
        fw * gy - fx * gz + fy * gw + fz * gx,
        fw * gz + fx * gy - fy * gx + fz * gw,
    )


def _quat_rotate(q, v):
    """Rotate vectors by component-separated quaternions.

    ``v' = v + 2 w (r x v) + 2 r x (r x v)`` with q = (w, r).

    Args:
        q: tuple of 4 ``(batch, n)`` arrays.
        v: tuple of 3 ``(batch, n)`` arrays (vector components).

    Returns:
        tuple of 3 ``(batch, n)`` arrays.
    """
    w, x, y, z = q
    vx, vy, vz = v
    # t = 2 * (r x v)
    tx = 2.0 * (y * vz - z * vy)
    ty = 2.0 * (z * vx - x * vz)
    tz = 2.0 * (x * vy - y * vx)
    # v' = v + w*t + r x t
    return (
        vx + w * tx + (y * tz - z * ty),
        vy + w * ty + (z * tx - x * tz),
        vz + w * tz + (x * ty - y * tx),
    )


def _one_way_impl(dihedrals: Array, cartesian: Array) -> tuple[Array, tuple]:
    """Forward pass; returns the result and the residuals the analytic
    adjoint needs (cumulative quaternions, rotated bonds, axis info).

    EVERYTHING per-rotation lives in structure-of-arrays layout — tuples
    of ``(batch, n)`` component planes with the chain dim in the TPU lane
    axis. Stacked ``(batch, n, 3)`` / ``(batch, n, 3, 3)`` tensors tile as
    (sublane, lane) = (n, 3) / (3, 3) and waste 125/128 lanes; at 158
    residues the SoA form of this fwd+bwd is what keeps the ADC step from
    being layout-bound (measured on v5e, see docs/adc_ablation_r3.json).
    """
    # B_i: rotation about the fixed original axis through atoms (i+1, i+2).
    n = dihedrals.shape[1]
    ux = cartesian[:, 2:-1, 0] - cartesian[:, 1:-2, 0]
    uy = cartesian[:, 2:-1, 1] - cartesian[:, 1:-2, 1]
    uz = cartesian[:, 2:-1, 2] - cartesian[:, 1:-2, 2]
    ulen = jnp.sqrt(ux * ux + uy * uy + uz * uz)  # (B, n)
    ax, ay, az = ux / ulen, uy / ulen, uz / ulen

    # The reference's x @ R_rodrigues(axis, -dihedral) equals, in column
    # convention, a rotation by +dihedral about axis; as a quaternion:
    # q = (cos(d/2), sin(d/2) * axis).
    half = 0.5 * dihedrals
    cw = jnp.cos(half)
    s = jnp.sin(half)
    q = (cw, s * ax, s * ay, s * az)

    # cumulative rotation C_i = B_0 ∘ ... ∘ B_i (B_i applied first)
    q_scan = jax.lax.associative_scan(_quat_compose, q, axis=1)
    # atom n+2 shares C_{n-1} with atom n+1
    q_cum = tuple(
        jnp.concatenate([c, c[:, -1:]], axis=1) for c in q_scan
    )

    # rotated bond vectors for bonds (k-1, k), k = 2..n+2, then cumsum
    bx = cartesian[:, 2:, 0] - cartesian[:, 1:-1, 0]
    by = cartesian[:, 2:, 1] - cartesian[:, 1:-1, 1]
    bz = cartesian[:, 2:, 2] - cartesian[:, 1:-1, 2]
    rx, ry, rz = _quat_rotate(q_cum, (bx, by, bz))
    if n < _SUFFIX_MM_MIN:
        # short chains: one cumsum over stacked components (op-count bound)
        csum = jnp.cumsum(jnp.stack([rx, ry, rz], axis=1), axis=-1)
        moved = cartesian[:, 1:2, :] + jnp.swapaxes(csum, 1, 2)
    else:
        # long chains: per-component cumsums avoid the transpose relayout
        moved = jnp.stack(
            [
                cartesian[:, 1:2, 0] + jnp.cumsum(rx, axis=1),
                cartesian[:, 1:2, 1] + jnp.cumsum(ry, axis=1),
                cartesian[:, 1:2, 2] + jnp.cumsum(rz, axis=1),
            ],
            axis=-1,
        )
    out = jnp.concatenate([cartesian[:, :2, :], moved], axis=1)
    return out, (q_scan, q_cum, (rx, ry, rz), (ax, ay, az), ulen, dihedrals)


#: chain length above which the adjoint's suffix sums ride the MXU
_SUFFIX_MM_MIN = 96

#: test hook: force the matmul suffix-sum branch regardless of backend
#: (lets the CPU suite validate the TPU-only code path exactly)
_FORCE_SUFFIX_MM = False


def _suffix_sums(planes: list) -> list:
    """Suffix sums along the chain axis for a list of ``(B, m)`` planes.

    On TPU ONE einsum against a constant triangular mask computes all
    planes at once on the MXU (3-pass bf16: ~2^-19 relative error on the
    ~470-term sums): the adjoint needs 15 such sums per half-chain, and
    the elementwise flip-cumsum-flip form costs O(log n) masked-shift
    rounds per plane on the VPU — it dominated the 158-residue ADC
    backward (docs/adc_ablation_r3.json). Short chains and CPU keep the
    exact elementwise form.
    """
    m = planes[0].shape[1]
    try:
        on_tpu = _FORCE_SUFFIX_MM or jax.default_backend() in ("tpu", "axon")
    except Exception:
        on_tpu = False
    if m < _SUFFIX_MM_MIN or not on_tpu:
        # ONE cumsum over the stacked planes (identical per-row numerics):
        # k separate cumsum ops each carry fixed launch/relayout overhead,
        # which dominates at short chain lengths
        stacked = jnp.stack(planes, axis=1)  # (B, k, m)
        out = jnp.flip(jnp.cumsum(jnp.flip(stacked, -1), axis=-1), -1)
        return [out[:, j] for j in range(len(planes))]
    # mask[m', i] = 1 iff m' >= i  ->  out[b, i] = sum_{m' >= i} x[b, m']
    mask = jnp.asarray(np.tril(np.ones((m, m), np.float32)))
    stacked = jnp.stack(planes, axis=1)  # (B, k, m)
    out = jnp.einsum(
        "bkm,mi->bki", stacked, mask, precision=jax.lax.Precision.HIGH
    )
    return [out[:, j] for j in range(len(planes))]


def _quat_conj(q):
    w, x, y, z = q
    return (w, -x, -y, -z)


def _quat_rotate_mat3(q, M):
    """``R(q) @ M`` for a 3x3 matrix given as a nested tuple ``M[i][j]`` of
    ``(batch, n)`` component planes (SoA): rotate each column as a vector."""
    cols = [_quat_rotate(q, (M[0][j], M[1][j], M[2][j])) for j in range(3)]
    return tuple(tuple(cols[j][i] for j in range(3)) for i in range(3))


@jax.custom_vjp
def _one_way(dihedrals: Array, cartesian: Array) -> Array:
    # A fused Pallas VMEM scan was measured at parity with this XLA path on
    # v5e (2.46 vs 2.61M conf/s at (512, 456)) — XLA's O(n)-work
    # associative_scan beats the kernel's O(n log n) Hillis-Steele rounds,
    # so the plain path stays the default (see docs/mosaic_findings.md).
    return _one_way_impl(dihedrals, cartesian)[0]


def _one_way_fwd(dihedrals, cartesian):
    out, res = _one_way_impl(dihedrals, cartesian)
    return out, res


def _one_way_bwd(res, g):
    """Analytic adjoint — the rigid-rotation Jacobian collapses to suffix
    sums, avoiding autodiff's transposed associative scan (which dominated
    the ADC train step's cost).

    With y_k = q_1 + sum_{m<=k} R_{c(m)} b_m  (b_m planar bonds, R the
    cumulative rotations, c(m) = min(m-2, n-1)):

    * bond pullback:    b_bar_m = R_{c(m)}^T G_m,   G_m = sum_{k>=m} g_k
    * torsion pullback: d_bar_i = a_i^fin . sum_{m>=i+2} r_m x G_m
      (a^fin = final axis direction = r_{i+2}/|u_i|, r = rotated bonds)
    * axis pullback via the per-i moment matrix
      N_i = R_i^T M_i R_{i-1},  M_i = sum_{m>=i+2} r_m G_m^T:
      a_bar_i = sin(d_i) vee(N_i) + (1-cos(d_i)) (N_i^T a_i + N_i a_i),
      vee(N) = (N_23-N_32, N_31-N_13, N_12-N_21),
      then u_bar = (I - a a^T) a_bar / |u|.
    """
    q_scan, q_cum, r, axis, ulen, dihedrals = res
    B, n = dihedrals.shape
    dtype = g.dtype
    rx, ry, rz = r
    ax, ay, az = axis

    # suffix sums of the output cotangent over atoms k = 2..n+2, as SoA
    # component planes (B, n+1): G[m-2] = sum_{k>=m} g_k
    G = tuple(_suffix_sums([g[:, 2:, c] for c in range(3)]))
    Gx, Gy, Gz = G

    # --- bond pullback: b_bar_m = R_{c(m)}^T G_m
    b_bar = _quat_rotate(_quat_conj(q_cum), G)  # 3 x (B, n+1)

    # --- torsion pullback (t = r_m x G_m, suffix-summed) and the moment
    # matrix M_i = suffix_{m>=i+2} r_m G_m^T: 12 suffix sums, batched into
    # one pass. Bond m sits at array index m-2, so "m >= i+2" starts at
    # index i.
    rc = (rx, ry, rz)
    sums = _suffix_sums(
        [ry * Gz - rz * Gy, rz * Gx - rx * Gz, rx * Gy - ry * Gx]
        + [rc[i] * G[j] for i in range(3) for j in range(3)]
    )
    Tx, Ty, Tz = sums[0], sums[1], sums[2]
    # a_fin = r_{i+2} / |u_i| (the final axis direction), i = 0..n-1
    d_bar = (
        rx[:, :n] * Tx[:, :n] + ry[:, :n] * Ty[:, :n] + rz[:, :n] * Tz[:, :n]
    ) / ulen

    M = tuple(
        tuple(sums[3 + 3 * i + j][:, :n] for j in range(3)) for i in range(3)
    )
    # N_i = R_i^T M_i R_{i-1}: rotate columns by R_i^T, then rows by R_{i-1}^T
    q_i = tuple(c[:, :n] for c in q_scan)
    ident = lambda c, v: jnp.concatenate(
        [jnp.full((B, 1), v, c.dtype), c[:, : n - 1]], axis=1
    )
    q_im1 = (ident(q_scan[0], 1.0),) + tuple(
        ident(c, 0.0) for c in q_scan[1:]
    )
    halfN = _quat_rotate_mat3(_quat_conj(q_i), M)  # R_i^T M_i
    # (R_i^T M_i) R_{i-1} = (R_{i-1}^T (R_i^T M_i)^T)^T
    halfNT = tuple(tuple(halfN[j][i] for j in range(3)) for i in range(3))
    tmp = _quat_rotate_mat3(_quat_conj(q_im1), halfNT)
    N = tuple(tuple(tmp[j][i] for j in range(3)) for i in range(3))
    vee = (
        N[1][2] - N[2][1],
        N[2][0] - N[0][2],
        N[0][1] - N[1][0],
    )
    sin_d = jnp.sin(dihedrals)
    cos1 = 1.0 - jnp.cos(dihedrals)
    a = (ax, ay, az)
    a_bar = tuple(
        sin_d * vee[i]
        + cos1
        * (
            # (N + N^T) @ a
            (N[i][0] + N[0][i]) * ax
            + (N[i][1] + N[1][i]) * ay
            + (N[i][2] + N[2][i]) * az
        )
        for i in range(3)
    )
    dot = ax * a_bar[0] + ay * a_bar[1] + az * a_bar[2]
    u_bar = tuple((a_bar[i] - a[i] * dot) / ulen for i in range(3))

    # --- assemble q_bar (planar-cartesian cotangent)
    if n < _SUFFIX_MM_MIN:
        # short chains: components stacked on axis 1 so each slice-update
        # is ONE op, not three (op-count bound at small n)
        g_sw = jnp.swapaxes(g, 1, 2)  # (B, 3, n+3)
        bb = jnp.stack(b_bar, axis=1)  # (B, 3, n+1)
        ub = jnp.stack(u_bar, axis=1)  # (B, 3, n)
        v = jnp.zeros((B, 3, n + 3), dtype)
        v = v.at[:, :, 0].set(g_sw[:, :, 0])
        v = v.at[:, :, 1].set(g_sw[:, :, 1] + jnp.sum(g_sw[:, :, 2:], axis=2))
        # bonds b_m = q_m - q_{m-1}, m = 2..n+2
        v = v.at[:, :, 2:].add(bb)
        v = v.at[:, :, 1:-1].add(-bb)
        # axes u_i = q_{i+2} - q_{i+1}, i = 0..n-1
        v = v.at[:, :, 2:-1].add(ub)
        v = v.at[:, :, 1:-2].add(-ub)
        q_bar = jnp.swapaxes(v, 1, 2)
        return d_bar.astype(dihedrals.dtype), q_bar
    # long chains: per-component updates avoid the (B, n, 3) transposes
    comps = []
    for c in range(3):
        v = jnp.zeros((B, n + 3), dtype)
        v = v.at[:, 0].set(g[:, 0, c])
        v = v.at[:, 1].set(g[:, 1, c] + jnp.sum(g[:, 2:, c], axis=1))
        v = v.at[:, 2:].add(b_bar[c])
        v = v.at[:, 1:-1].add(-b_bar[c])
        v = v.at[:, 2:-1].add(u_bar[c])
        v = v.at[:, 1:-2].add(-u_bar[c])
        comps.append(v)
    q_bar = jnp.stack(comps, axis=-1)
    return d_bar.astype(dihedrals.dtype), q_bar


_one_way.defvjp(_one_way_fwd, _one_way_bwd)


def dihedral_to_cartesian_one_way(dihedrals: Array, cartesian: Array) -> Array:
    """Curl one half-chain out of the plane, setting dihedrals sequentially.

    Parallel reformulation of the reference's per-dihedral loop
    (``misc/backmapping.py:1873-1912``): cumulative composition of the fixed
    per-bond rotations via ``associative_scan`` (module docstring), then a
    cumulative sum of rotated bond vectors.

    The translation parts of the affine transforms are never materialized:
    because ``B_{k-2}`` fixes atom ``k-1`` (it lies on the rotation axis), the
    final bond vector is a pure rotation of the original bond vector,

        p_k - p_{k-1} = (q_k - q_{k-1}) @ A_cum_{k-2},

    so positions follow from one cumsum. This avoids the catastrophic f32
    cancellation a naive affine-composition scan exhibits for long chains
    (rotations about points far from the origin produce large, cancelling
    translation terms); composing orthogonal matrices is well-conditioned.

    The backward pass is a hand-derived analytic adjoint (``_one_way_bwd``)
    instead of autodiff through the associative scan.

    Args:
        dihedrals: ``(batch, n)`` dihedral angles.
        cartesian: ``(batch, n + 3, 3)`` planar chain coordinates.

    Returns:
        ``(batch, n + 3, 3)`` coordinates.
    """
    assert dihedrals.ndim == 2
    n = dihedrals.shape[-1]
    if n == 0:
        return cartesian
    assert cartesian.shape[-2] == n + 3, (
        f"need n+3 atoms for n dihedrals, got {cartesian.shape[-2]=} {n=}"
    )
    return _one_way(dihedrals, cartesian)


def split_and_reverse_dihedrals(x: Array) -> tuple[Array, Array]:
    """Split dihedrals into left (reversed) and right halves.

    Reference: ``misc/backmapping.py:179-214``. Shapes are static in JAX, so
    the even/odd branch resolves at trace time.
    """
    n = x.shape[1]
    middle = n // 2
    if n % 2 == 0:
        return x[:, middle - 1 :: -1], x[:, middle:]
    return x[:, middle::-1], x[:, middle + 1 :]


def split_and_reverse_cartesians(x: Array) -> tuple[Array, Array]:
    """Split cartesians into left (reversed) and right halves sharing 3 atoms.

    Reference: ``misc/backmapping.py:217-256``.
    """
    split = x.shape[1] // 2
    return x[:, split + 1 :: -1], x[:, split - 1 :]


#: test hook: force the batched-halves branch regardless of backend
#: (lets the CPU suite validate the TPU-only code path)
_FORCE_BATCHED_HALVES = False


def _batched_halves() -> bool:
    """Whether to fold both half-chain ``_one_way`` calls into ONE call at
    2x batch. The backmap fwd+bwd is LAUNCH-bound on TPU (~314 fusion
    kernels at 512 residues, and batch-64 measured *slower* than batch-256
    — docs/perf512_micro_r4.json), so halving the call count is the lever.
    TPU-gated: padding the shorter half changes the associative-scan tree
    length, which perturbs last-bit f32 numerics — the CPU default path
    must stay bit-identical to the stored determinism references."""
    if _FORCE_BATCHED_HALVES:
        return True
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover - backend probing never fails
        return False


def dihedrals_to_cartesian(dihedrals: Array, cartesians: Array) -> Array:
    """Full both-ways dihedral application: the chain center stays planar and
    both tails curl into 3D.

    Reference: ``misc/backmapping.py:259-307``.

    On TPU both half-chains run as ONE ``_one_way`` call at 2x batch (the
    shorter half padded with an extrapolated atom + zero dihedral whose
    output row is sliced away): one associative scan / one suffix-sum
    einsum / one adjoint instead of two, for a launch-bound computation.
    """
    cartesians_left, cartesians_right = split_and_reverse_cartesians(cartesians)
    dihedrals_left, dihedrals_right = split_and_reverse_dihedrals(dihedrals)
    nl = dihedrals_left.shape[1]
    nr = dihedrals_right.shape[1]
    if nl and nr and _batched_halves():
        n = max(nl, nr)
        B = dihedrals.shape[0]

        def pad(dih: Array, cart: Array) -> tuple[Array, Array]:
            k = n - dih.shape[1]
            if not k:
                return dih, cart
            dih = jnp.concatenate(
                [dih, jnp.zeros((B, k), dih.dtype)], axis=1
            )
            # extrapolate along the final bond: pad atoms stay distinct, so
            # the adjoint's 1/|u| terms never divide by zero (the padded
            # rows are sliced off below; their cotangents are zero)
            last_bond = cart[:, -1:, :] - cart[:, -2:-1, :]
            steps = jnp.arange(1, k + 1, dtype=cart.dtype)[None, :, None]
            cart = jnp.concatenate(
                [cart, cart[:, -1:, :] + steps * last_bond], axis=1
            )
            return dih, cart

        dl, cl = pad(dihedrals_left, cartesians_left)
        dr, cr = pad(dihedrals_right, cartesians_right)
        both = _one_way(
            jnp.concatenate([dl, dr], axis=0),
            jnp.concatenate([cl, cr], axis=0),
        )
        new_left = both[:B, : nl + 3]
        new_right = both[B:, : nr + 3]
    else:
        new_left = dihedral_to_cartesian_one_way(
            dihedrals_left, cartesians_left
        )
        new_right = dihedral_to_cartesian_one_way(
            dihedrals_right, cartesians_right
        )
    return jnp.concatenate([new_left[:, ::-1], new_right[:, 3:]], axis=1)


def backmap(distances: Array, angles: Array, dihedrals: Array) -> Array:
    """The BackMapLayer computation: distances+angles+dihedrals -> xyz.

    Matches ``models/layers.py:913-987``:
      1. reduce distances to their batch mean (shape (1, n_bonds)) —
         the raw values: the reference computes a negative-distance
         guard but never feeds it into the mean (dead code there),
      2. chain_in_plane,
      3. add pi to dihedrals and curl both tails into 3D.

    Args:
        distances: ``(batch, n_atoms - 1)``.
        angles: ``(batch, n_atoms - 2)``.
        dihedrals: ``(batch, n_atoms - 3)``.

    Returns:
        ``(batch, n_atoms, 3)``.

    Examples:
        >>> import jax.numpy as jnp
        >>> from encodermap_tpu.ops.backmap import backmap
        >>> d = jnp.full((2, 4), 0.15)           # 5 atoms -> 4 bonds
        >>> a = jnp.full((2, 3), 2.0)            # 3 bond angles
        >>> t = jnp.zeros((2, 2))                # 2 dihedrals
        >>> xyz = backmap(d, a, t)
        >>> xyz.shape
        (2, 5, 3)
        >>> bond = jnp.linalg.norm(xyz[0, 1] - xyz[0, 0])
        >>> bool(jnp.isclose(bond, 0.15, atol=1e-5))
        True
    """
    # NOTE: the reference computes a `fixed_distances` guard (negative/zero
    # -> batch mean) but then averages the RAW distances — the guard is
    # dead code there (``models/layers.py:964-971``). Averaging raw
    # distances here keeps bit-level parity on degenerate inputs.
    mean_lengths = jnp.mean(distances, axis=0, keepdims=True)
    mean_lengths = jnp.broadcast_to(
        mean_lengths, (angles.shape[0],) + mean_lengths.shape[1:]
    )
    chain = chain_in_plane(mean_lengths, angles)
    return dihedrals_to_cartesian(dihedrals + pi, chain)


# ----------------------------------------------------------------------------
# sp2 atom guessing (amide H / carbonyl O) and merging
# ----------------------------------------------------------------------------


def guess_sp2_atom(
    cartesians: Array,
    indices: Sequence[int],
    angle_to_previous: float,
    bond_length: float,
) -> Array:
    """Place sp2-bonded atoms (H on N, O on C) by rotating the previous-bond
    vector about the local plane normal.

    Reference: ``misc/backmapping.py:1920-1941``. Vectorized over the index
    list instead of a Python loop.
    """
    idx = np.asarray(indices, dtype=np.int64)
    prev_vec = cartesians[:, idx - 1] - cartesians[:, idx]
    next_idx = np.where(idx + 1 < cartesians.shape[1], idx + 1, idx - 2)
    next_vec = cartesians[:, next_idx] - cartesians[:, idx]
    normal = jnp.cross(prev_vec, next_vec)
    normal = normal / jnp.linalg.norm(normal, axis=-1, keepdims=True)
    angles = jnp.full(prev_vec.shape[:-1], angle_to_previous, cartesians.dtype)
    R = rotation_matrices(normal, angles)
    bond_vec = jnp.einsum("bnj,bnjk->bnk", prev_vec, R, precision=jax.lax.Precision.HIGHEST)
    bond_vec = bond_vec * (
        bond_length / jnp.linalg.norm(bond_vec, axis=-1, keepdims=True)
    )
    return cartesians[:, idx] + bond_vec


def guess_amide_H(cartesians: Array, N_indices: Sequence[int]) -> Array:
    """Amide H at 123 deg / 1.10 A from each backbone N (except the first).

    Reference: ``misc/backmapping.py:1944-1945``.
    """
    return guess_sp2_atom(cartesians, list(N_indices)[1:], 123 / 180 * pi, 1.10)


def guess_amide_O(cartesians: Array, C_indices: Sequence[int]) -> Array:
    """Carbonyl O at 121 deg / 1.24 A from each backbone C.

    Reference: ``misc/backmapping.py:1948-1949``.
    """
    return guess_sp2_atom(cartesians, list(C_indices), 121 / 180 * pi, 1.24)


def merge_cartesians(
    central_cartesians: Array,
    N_indices: Sequence[int],
    O_indices: Sequence[int],
    H_cartesians: Array,
    O_cartesians: Array,
) -> Array:
    """Interleave guessed H/O atoms back into the backbone chain.

    Reference: ``misc/backmapping.py:1973-1990``. The gather order is
    precomputed on host (static topology), executed as one device gather.
    """
    n_central = central_cartesians.shape[1]
    N_set = set(list(N_indices)[1:])
    O_set = set(O_indices)
    source = []  # (which_array, index)
    h_i = o_i = 0
    source.append((0, 0))
    for i in range(1, n_central):
        source.append((0, i))
        if i in N_set:
            source.append((1, h_i))
            h_i += 1
        elif i in O_set:
            source.append((2, o_i))
            o_i += 1
    arrays = [central_cartesians, H_cartesians, O_cartesians]
    parts = [arrays[a][:, j : j + 1] for a, j in source]
    out = jnp.concatenate(parts, axis=1)
    assert out.shape[1] == n_central + H_cartesians.shape[1] + O_cartesians.shape[1]
    return out


# ----------------------------------------------------------------------------
# multimer backmapping (experimental in the reference)
# ----------------------------------------------------------------------------


def backmap_multimer(
    protein_lengths: Sequence[int],
    distances: Array,
    angles: Array,
    dihedrals: Array,
    matrices: Array,
) -> Array:
    """Backmap a multimer: each protein's chain is rebuilt independently and
    proteins 2..N are placed by predicted homogeneous transforms.

    Re-designs ``BackMapLayerTransformations``
    (``/root/reference/encodermap/models/layers.py:990-1092``; experimental
    there, with broken slice bookkeeping — this implements the documented
    intent): inputs are per-protein internal coordinates concatenated
    protein-by-protein, i.e. distances has sum(3 L_i - 1) entries, angles
    sum(3 L_i - 2), dihedrals sum(3 L_i - 3). Bond lengths are batch-means
    per protein, like the monomer BackMapLayer.

    Args:
        protein_lengths: residues per protein.
        distances: ``(B, sum 3L_i - 1)``.
        angles: ``(B, sum 3L_i - 2)``.
        dihedrals: ``(B, sum 3L_i - 3)``.
        matrices: ``(B, n_proteins - 1, 4, 4)`` homogeneous transforms
            (row-vector convention: ``[xyz, 1] @ M``).

    Returns:
        ``(B, sum 3L_i, 3)`` coordinates.
    """
    outs = []
    d0 = a0 = di0 = 0
    for i, L in enumerate(protein_lengths):
        nd, na, ndi = 3 * L - 1, 3 * L - 2, 3 * L - 3
        lengths = jnp.mean(distances[:, d0 : d0 + nd], axis=0, keepdims=True)
        lengths = jnp.broadcast_to(
            lengths, (angles.shape[0],) + lengths.shape[1:]
        )
        chain = chain_in_plane(lengths, angles[:, a0 : a0 + na])
        xyz = dihedrals_to_cartesian(
            dihedrals[:, di0 : di0 + ndi] + pi, chain
        )
        if i != 0:
            M = matrices[:, i - 1]  # (B, 4, 4)
            ones = jnp.ones(xyz.shape[:-1] + (1,), xyz.dtype)
            homo = jnp.concatenate([xyz, ones], axis=-1)
            xyz = jnp.einsum(
                "bnj,bjk->bnk", homo, M,
                precision=jax.lax.Precision.HIGHEST,
            )[..., :3]
        outs.append(xyz)
        d0 += nd
        a0 += na
        di0 += ndi
    return jnp.concatenate(outs, axis=1)
