# encodermap_tpu/ops/pallas_scan.py
"""Pallas TPU kernel for the backmapping hot loop: quaternion prefix scan +
bond rotation + position cumsum, all resident in VMEM.

``jax.lax.associative_scan`` lowers to log2(n) rounds of slice/concat HLOs
whose intermediates round-trip through HBM; for the (batch, n) quaternion
scans of ``ops/backmap.py`` the whole working set is a few MB, so one kernel
that performs every Hillis-Steele round in VMEM removes ~log2(n) HBM
round-trips. The kernel fuses the three stages of
``dihedral_to_cartesian_one_way`` (reference loop:
``misc/backmapping.py:1873-1912``):

    1. inclusive prefix composition of per-bond quaternions
       (c_i = B_0 (x) ... (x) B_i, identity-padded shifts),
    2. rotation of the planar bond vectors by the prefixes
       (bond j uses c_{min(j, n-1)} — the last atom shares the final
       rotation),
    3. prefix sum of the rotated bonds (relative positions).

Everything is 2-D (batch-tile, n) structure-of-arrays with static shapes;
shifts are static concat+slice, so the kernel is fully vectorizable by
Mosaic.

Measured on a v5e chip at (batch 512, 456 atoms): 2.46M conf/s vs 2.61M for
the XLA ``associative_scan`` path — XLA's O(n)-work scan beats this kernel's
O(n log n) Hillis-Steele rounds despite the extra HBM round-trips, so
``ops/backmap.py`` does NOT route here by default; the kernel is kept as
tested infrastructure for shapes/generations where the balance flips (very
long chains at small batch, where VMEM residency wins).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["quat_chain_positions", "quat_chain_positions_reference"]


def _compose(f, g):
    """Hamilton product f (x) g; R(f (x) g) = R(f) R(g) (g applied last)."""
    fw, fx, fy, fz = f
    gw, gx, gy, gz = g
    return (
        fw * gw - fx * gx - fy * gy - fz * gz,
        fw * gx + fx * gw + fy * gz - fz * gy,
        fw * gy - fx * gz + fy * gw + fz * gx,
        fw * gz + fx * gy - fy * gx + fz * gw,
    )


def _rotate(q, v):
    w, x, y, z = q
    vx, vy, vz = v
    tx = 2.0 * (y * vz - z * vy)
    ty = 2.0 * (z * vx - x * vz)
    tz = 2.0 * (x * vy - y * vx)
    return (
        vx + w * tx + (y * tz - z * ty),
        vy + w * ty + (z * tx - x * tz),
        vz + w * tz + (x * ty - y * tx),
    )


def _shift_right(comp, s, fill):
    """comp[:, i] <- comp[:, i-s], filling the first s lanes with ``fill``."""
    pad = jnp.full(comp.shape[:1] + (s,), fill, comp.dtype)
    return jnp.concatenate([pad, comp[:, :-s]], axis=1)


def _kernel(qw, qx, qy, qz, bx, by, bz, ox, oy, oz, *, n: int):
    """One batch tile. Quaternion refs are (tile, n); bonds/outputs (tile, n+1)."""
    q = (qw[...], qx[...], qy[...], qz[...])
    s = 1
    while s < n:
        shifted = (
            _shift_right(q[0], s, 1.0),
            _shift_right(q[1], s, 0.0),
            _shift_right(q[2], s, 0.0),
            _shift_right(q[3], s, 0.0),
        )
        q = _compose(shifted, q)
        s *= 2
    # bond j (j = 0..n) rotates with prefix min(j, n-1): append the final
    # prefix once more.
    q_ext = tuple(jnp.concatenate([c, c[:, n - 1: n]], axis=1) for c in q)
    r = _rotate(q_ext, (bx[...], by[...], bz[...]))
    # prefix-sum the rotated bonds (relative positions)
    s = 1
    m = n + 1
    while s < m:
        r = tuple(c + _shift_right(c, s, 0.0) for c in r)
        s *= 2
    ox[...], oy[...], oz[...] = r


@functools.partial(jax.jit, static_argnames=("interpret",))
def quat_chain_positions(
    q: tuple, bonds: tuple, interpret: bool = False
) -> tuple:
    """Relative chain positions from per-bond quaternions and planar bonds.

    Args:
        q: 4-tuple of ``(batch, n)`` quaternion components (one per
            dihedral).
        bonds: 3-tuple of ``(batch, n+1)`` planar bond-vector components.
        interpret: run the kernel in interpreter mode (CPU testing).

    Returns:
        3-tuple of ``(batch, n+1)``: cumulative sums of rotated bonds, i.e.
        position of atom (k+2) relative to atom 1.
    """
    from jax.experimental import pallas as pl

    B, n = q[0].shape
    # batch tile: keep the VMEM working set of ~14 (tile, n) f32 planes
    # within a few MB
    tile = B
    budget = 4 * 1024 * 1024
    while tile > 8 and tile * (n + 1) * 4 * 14 > budget:
        tile //= 2
    while B % tile:
        tile //= 2
    grid = (B // tile,)

    qspec = pl.BlockSpec((tile, n), lambda i: (i, 0))
    bspec = pl.BlockSpec((tile, n + 1), lambda i: (i, 0))
    out_shape = tuple(
        jax.ShapeDtypeStruct((B, n + 1), bonds[0].dtype) for _ in range(3)
    )
    return pl.pallas_call(
        functools.partial(_kernel, n=n),
        grid=grid,
        in_specs=[qspec] * 4 + [bspec] * 3,
        out_specs=[bspec] * 3,
        out_shape=out_shape,
        interpret=interpret,
    )(*q, *bonds)


def quat_chain_positions_reference(q: tuple, bonds: tuple) -> tuple:
    """Pure-JAX oracle with identical semantics (associative_scan + cumsum)."""
    q_cum = jax.lax.associative_scan(_compose, q, axis=1)
    q_ext = tuple(jnp.concatenate([c, c[:, -1:]], axis=1) for c in q_cum)
    r = _rotate(q_ext, bonds)
    return tuple(jnp.cumsum(c, axis=1) for c in r)
