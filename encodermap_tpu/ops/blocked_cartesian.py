# encodermap_tpu/ops/blocked_cartesian.py
"""Blocked evaluation of the ADC cartesian-cost stages for LARGE proteins.

The dense-matrix cartesian losses (``losses.cartesian_loss_matrix`` +
``losses.cartesian_distance_loss_matrix``) materialize two full ``(B, n, n)``
CA-distance matrices per step. That design WINS up to ~320 residues (a dense
reduction backward beats a triu-index scatter by ~60x on TPU, see
``docs/adc_ablation_r3.json``) but cliffs beyond it: at n = 512, batch 256,
each matrix is 268 MB, the step becomes HBM-traffic-bound (~5.5 ms, 47k
samples/s — ``docs/adc_scale_r3.json``), and memory caps batch growth. The
reference's own perf TODO points at the same O(n^2) pairwise stages
(``/root/reference/encodermap/misc/backmapping.py:1077-1078``).

This module re-evaluates the SAME math blockwise at the XLA level (a
previous matrix-free Pallas tile kernel lost to XLA's fusions at every
scale — ``docs/mosaic_findings.md``; this is the other lever the round-3
verdict asked for). MEASURED OUTCOME (round 4): the blocked scan also
loses ON SPEED at every scale — its per-block recompute costs more than
the saved HBM traffic (512 CA: 6206 us full step vs 5395 dense / ~4950
analytic; 1024 CA: 18852 vs 15749 — ``docs/perf_r4.md``). The production
large-protein path is ``ops.cartesian_analytic`` (hand-written VJPs, no
(B, n, n) residuals); this module remains ONLY as the memory-bounded
fallback past ``MIN_BLOCKED_ATOMS``, where even the analytic path's
``(B, n^2)`` Gram rows are too large:

* a ``lax.scan`` over row-blocks of the atom axis computes ``(B, R, n)``
  distance-row slabs for input and backmapped coordinates, immediately
  reduces them into the cartesian-cost accumulator, and accumulates the
  ``(B, B)`` Gram matrix ``G[i, j] = <D_i, D_j>_F`` of the *input*
  distance-matrix rows (all the CA-pair sigmoid loss needs — the high-D
  side of sketch-map's cost only ever enters through pairwise distances
  ``||v_i - v_j||^2 = G_ii + G_jj - 2 G_ij``);
* the scan body is wrapped in ``jax.checkpoint``: backward RECOMPUTES each
  block's distance slabs instead of storing them, so peak memory is
  ``O(B * R * n)`` per block plus the ``(B, B)`` carry — the full matrices
  never exist in either pass;
* gradients only ever flow to the backmapped coordinates (the input side is
  training data and the latent enters through the separately-computed low-D
  sigmoid), exactly as in the dense path.

Value-equality with the dense forms is exact up to f32 summation order
(tested in ``tests/test_blocked_cartesian.py``); the dense path remains the
default below ``MIN_BLOCKED_ATOMS`` so every stored determinism reference
(trp-cage / asp7 / 158-residue lysozyme curves) keeps bit-identical history.

Reference for the loss math being reproduced:
``/root/reference/encodermap/loss_functions/loss_functions.py:873-1067``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .distances import component_plane_dists, sqrt_guard

__all__ = ["blocked_cartesian_terms", "sigmoid_from_gram", "MIN_BLOCKED_ATOMS"]

Array = jax.Array

#: atom count at/above which the ADC loss assembly falls back to the
#: blocked scan FOR MEMORY: on speed it LOSES to both the dense matrices
#: and the analytic VJPs at every scale measured (512 CA: 6206 us full
#: step vs 5395 dense; 1024 CA: 18852 vs 15749 — docs/perf_r4.md), but it
#: is the only path whose peak memory is O(B*R*n): the analytic path's
#: input-row Gram still materializes (B, n^2) f32 rows (4.3 GB at
#: n = 1536, batch 256), which crowds a 16 GB chip once autodiff
#: residuals for the rest of the step are added.
MIN_BLOCKED_ATOMS = 1536

_HIGH = jax.lax.Precision.HIGH


def _row_dists(blk: Array, full: Array) -> Array:
    """Distances from a row-block of atoms to ALL atoms: (B, R, n).
    Component-plane layout + the shared :func:`ops.distances.sqrt_guard`
    convention, so blocked and dense paths agree on the diagonal."""
    return component_plane_dists(blk, full)


def blocked_cartesian_terms(
    inp_xyz: Array,
    out_xyz: Array,
    variant: str = "mean_abs",
    block: int = 128,
    with_gram: bool = True,
) -> Tuple[Array, Array]:
    """Cartesian-cost reduction + input-row Gram, never materializing (B,n,n).

    Args:
        inp_xyz: ``(B, n, 3)`` selected (e.g. CA) input coordinates. No
            gradient flows to them (training data).
        out_xyz: ``(B, n, 3)`` backmapped coordinates — the gradient path.
        variant: ``mean_abs`` / ``mean_square`` accumulate a scalar;
            ``mean_norm`` accumulates per-sample ``(B,)`` row sums.
        block: row-block size R; n is zero-padded up to a multiple and the
            padded rows are masked out of every reduction.
        with_gram: also accumulate ``G[i, j] = <D_i, D_j>_F`` over the
            INPUT distance matrices (skipped — and its matmuls dead-coded —
            when the caller has no CA-sigmoid loss).

    Returns:
        ``(acc, gram)``: ``acc`` is the UN-normalized reduction over the
        full matrices — ``sum |D_in - D_out|`` (mean_abs), ``sum (.)^2``
        (mean_square) or per-sample ``(B,)`` squared sums (mean_norm) —
        exactly what ``losses.cartesian_loss_matrix`` reduces before its
        ``/(2 n_pairs B)`` normalization; ``gram`` is ``(B, B)`` (zeros when
        ``with_gram=False``).
    """
    B, n, _ = inp_xyz.shape
    nb = -(-n // block)
    pad = nb * block - n
    if pad:
        zpad = ((0, 0), (0, pad), (0, 0))
        inp_p = jnp.pad(inp_xyz, zpad)
        out_p = jnp.pad(out_xyz, zpad)
    else:
        inp_p, out_p = inp_xyz, out_xyz
    # (nb, B, R, 3) row blocks; columns stay the full unpadded atom set
    inp_blocks = jnp.moveaxis(inp_p.reshape(B, nb, block, 3), 1, 0)
    out_blocks = jnp.moveaxis(out_p.reshape(B, nb, block, 3), 1, 0)
    row_valid = (jnp.arange(nb * block) < n).astype(inp_xyz.dtype)
    masks = row_valid.reshape(nb, block)

    per_sample = variant == "mean_norm"
    acc0 = jnp.zeros((B,) if per_sample else (), inp_xyz.dtype)
    gram0 = jnp.zeros((B, B), inp_xyz.dtype)

    def body(carry, xs):
        acc, gram = carry
        in_blk, out_blk, mask = xs
        d_in = _row_dists(in_blk, inp_xyz)  # (B, R, n)
        d_out = _row_dists(out_blk, out_xyz)
        m = mask[None, :, None]
        diff = (d_in - d_out) * m
        if variant == "mean_square":
            acc = acc + jnp.sum(jnp.square(diff))
        elif variant == "mean_abs":
            acc = acc + jnp.sum(jnp.abs(diff))
        elif variant == "mean_norm":
            acc = acc + jnp.sum(jnp.square(diff), axis=(1, 2))
        else:
            raise ValueError(f"cost variant {variant!r} not available")
        if with_gram:
            v = (d_in * m).reshape(B, -1)
            # f32 accumulation; HIGH (3-pass bf16) matmul passes — measured
            # bit-identical loss values at lysozyme scale for this
            # gradient-free side (docs/perf_r3.md)
            gram = gram + jax.lax.dot_general(
                v, v, (((1,), (1,)), ((), ())), precision=_HIGH
            )
        return (acc, gram), None

    (acc, gram), _ = jax.lax.scan(
        jax.checkpoint(body), (acc0, gram0), (inp_blocks, out_blocks, masks)
    )
    return acc, gram


def sigmoid_from_gram(gram: Array, latent: Array, params: tuple) -> Array:
    """Sketch-map sigmoid cost with the high-D pairwise distances derived
    from a precomputed Gram matrix of the high-D rows.

    ``||v_i - v_j||^2 = G_ii + G_jj - 2 G_ij`` with the same clamp /
    exact-zero-diagonal conventions as ``ops.distances.pairwise_dist``'s
    Gram path, then the reference's cost
    ``mean((sig_h(d_h) - sig_l(d_l))^2)`` over the full (B, B) grids
    (``loss_functions.py:301-369``).
    """
    from .distances import pairwise_dist, sigmoid

    sig_h, a_h, b_h, sig_l, a_l, b_l = params
    s = jnp.diagonal(gram)
    d2 = jnp.maximum(s[:, None] + s[None, :] - 2.0 * gram, 0.0)
    d2 = d2 * (1.0 - jnp.eye(d2.shape[0], dtype=d2.dtype))
    dist_h = sqrt_guard(d2)
    dist_l = pairwise_dist(latent)
    return jnp.mean(
        jnp.square(
            sigmoid(sig_h, a_h, b_h)(dist_h) - sigmoid(sig_l, a_l, b_l)(dist_l)
        )
    )
