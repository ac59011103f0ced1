# encodermap_tpu/ops/cartesian_analytic.py
"""Analytic-VJP evaluation of the ADC cartesian-cost stages for LARGE
proteins — the round-4 winner of the >=320-residue campaign
(``docs/perf_r4.md``).

The dense-matrix losses (``losses.cartesian_loss_matrix`` +
``cartesian_distance_loss_matrix``) win below ~320 selected atoms but their
autodiff backward saves ``(B, n, n)`` residuals (sign / 1/d factors — 268 MB
each at n = 512, batch 256) whose HBM round-trips dominate past that scale.
Measured alternatives at 512 CA atoms, batch 256, fwd+bwd on v5e
(``docs/perf512_micro_r4.json``):

* dense pair (production r3): 2839 us
* blocked remat scan (``ops/blocked_cartesian``): loses at every scale —
  full-step 6206 vs 5395 us dense at 512 res; its per-block recompute costs
  more than the saved traffic (it remains ONLY as the documented
  memory-bounded fallback for systems whose ``(B, n^2)`` rows cannot
  materialize at all)
* Pallas tile kernels: rejected with numbers (``docs/mosaic_findings.md``)
* THIS module — hand-written VJPs that recompute the distance matrices
  inside fused reduction expressions, storing only the ``(B, n, 3)``
  coordinates between passes: cart 1548 us + Gram-sigmoid 1600 us,
  fused ~2400 us.

The cartesian cost's backward collapses to four ``(B, n, n) -> (B, n)``
reductions: with ``w_ij = c_ij / d^out_ij`` (``c`` the cost-variant
coefficient) and distances symmetric,

    d acc / d x_i = 2 * (x_i * sum_j w_ij - sum_j w_ij x_j).

The CA-pair sigmoid loss consumes only the Gram matrix ``G[i, j] =
<D_i, D_j>_F`` of the *input* rows (gradient-free: its high-D side is
training data) — ONE ``(B, n^2) x (n^2, B)`` MXU matmul at HIGH (3-pass
bf16) precision, which is bit-identical to HIGHEST on these all-positive
rows at MD scales (measured at lysozyme scale, scripts/precision_and_scale.py).

Value parity with the dense forms is exact up to f32 summation order;
gradients are validated against an f64 oracle (``tests/test_cartesian_analytic.py``)
— per the round-3 rule, NOT against XLA autodiff, whose own f32 entries
carry ~5e-3 cancellation noise at this scale.

Reference for the loss math being reproduced:
``/root/reference/encodermap/loss_functions/loss_functions.py:873-1067``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .distances import component_plane_dists

__all__ = ["cartesian_cost_analytic", "input_row_gram", "MIN_ANALYTIC_ATOMS"]

Array = jax.Array

#: selected-atom count at/above which the ADC loss assembly switches from
#: the dense (B, n, n) matrices to the analytic-VJP forms. Crossover
#: measured on v5e (batch 256, CA selection): dense wins at 158 (484 us
#: full step vs 560+ alternatives), analytic wins at 512 — see
#: docs/perf_r4.md.
MIN_ANALYTIC_ATOMS = 320

_HIGH = jax.lax.Precision.HIGH


def _dmat(x: Array) -> Array:
    """(B, n, n) pairwise distances; component-plane layout + the shared
    :func:`ops.distances.sqrt_guard` diagonal convention (single-sourced —
    the dense-vs-analytic loss equality depends on it)."""
    return component_plane_dists(x, x)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def cartesian_cost_analytic(out_xyz: Array, inp_xyz: Array,
                            variant: str = "mean_abs") -> Array:
    """UN-normalized cartesian cost between the full distance matrices of
    ``inp_xyz`` (training data — no gradient) and ``out_xyz`` (backmapped —
    the gradient path), with a hand-written backward that never stores a
    ``(B, n, n)`` residual.

    Returns ``sum |D_in - D_out|`` (mean_abs), ``sum (.)^2`` (mean_square)
    or per-sample ``(B,)`` squared sums (mean_norm) — exactly what
    ``losses.cartesian_loss_matrix`` reduces before normalization.
    """
    diff = _dmat(inp_xyz) - _dmat(out_xyz)
    if variant == "mean_abs":
        return jnp.sum(jnp.abs(diff))
    if variant == "mean_square":
        return jnp.sum(jnp.square(diff))
    if variant == "mean_norm":
        return jnp.sum(jnp.square(diff), axis=(1, 2))
    raise ValueError(f"cost variant {variant!r} not available")


def _cost_fwd(out_xyz, inp_xyz, variant):
    # residuals: just the coordinates — both matrices are recomputed inside
    # the backward's fused reductions
    return cartesian_cost_analytic(out_xyz, inp_xyz, variant), (out_xyz, inp_xyz)


def _cost_bwd(variant, res, g):
    out_xyz, inp_xyz = res
    d_out = _dmat(out_xyz)
    delta = d_out - _dmat(inp_xyz)
    if variant == "mean_abs":
        c = jnp.sign(delta)
    else:  # mean_square / mean_norm share the quadratic coefficient
        c = 2.0 * delta
    if variant == "mean_norm":
        # g is (B,): per-sample cotangents of the squared sums
        c = c * g[:, None, None]
        gscale = 1.0
    else:
        gscale = g
    w = jnp.where(d_out > 0.0, c / jnp.maximum(d_out, 1e-16), 0.0)
    row_w = jnp.sum(w, axis=2)  # (B, n)
    comps = []
    for ax in range(3):
        xc = out_xyz[..., ax]
        wx = jnp.sum(w * xc[:, None, :], axis=2)  # (B, n)
        comps.append(2.0 * gscale * (xc * row_w - wx))
    return jnp.stack(comps, axis=-1), jnp.zeros_like(inp_xyz)


cartesian_cost_analytic.defvjp(_cost_fwd, _cost_bwd)


def input_row_gram(inp_xyz: Array) -> Array:
    """``(B, B)`` Gram matrix ``G[i, j] = <D_i, D_j>_F`` of the input
    distance-matrix rows — everything the CA-pair sigmoid loss needs from
    the high-D side (``||v_i - v_j||^2 = G_ii + G_jj - 2 G_ij``; consume
    with ``ops.blocked_cartesian.sigmoid_from_gram``).

    ONE MXU matmul over the flattened rows. HIGH (3-pass bf16) precision:
    no gradient flows through the high-D side, and the rows are
    all-positive distances, where HIGH was measured bit-identical to
    HIGHEST at lysozyme scale (scripts/precision_and_scale.py).
    """
    B = inp_xyz.shape[0]
    v = _dmat(inp_xyz).reshape(B, -1)
    return jax.lax.dot_general(
        v, v, (((1,), (1,)), ((), ())), precision=_HIGH
    )
