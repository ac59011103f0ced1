# encodermap_tpu/ops/pallas_sigmoid.py
"""Fused Pallas TPU kernel for the sketch-map sigmoid distance loss.

The loss (``losses.sigmoid_loss``; reference
``loss_functions/loss_functions.py:301-369``) is

    loss = mean_{ij} ( s_h(||h_i - h_j||_per) - s_l(||l_i - l_j||) )^2

The pure-XLA path materializes two (B, B) distance matrices in HBM. This
kernel walks (i, j) tiles with a 2-D sequential grid, holding only one
(TILE_I, TILE_J) block of the interaction in VMEM and fusing periodic
distance, both sigmoids, the squared difference, and the reduction —
O(TILE^2) memory instead of O(B^2), enabling very large sketch-map batches.

Mosaic-friendly structure: everything stays 2-D. Euclidean distances use the
Gram identity ``|a|^2 - 2 a.b + |b|^2`` (one MXU matmul per tile); periodic
distances accumulate squared min-image component differences with a static
unroll over feature columns.

A custom VJP provides the backward pass as a second fused kernel. Only the
latent side receives gradients — the high-dimensional side is the input
batch (the reference likewise never differentiates through it):

    d loss / d l_k = (4 / B^2) * sum_j (s_l - s_h)_kj * s_l'(d_kj)
                     * (l_k - l_j) / d_kj

(factor 4 = 2 from the square x 2 from the ordered pairs (k,j), (j,k)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["fused_sigmoid_loss", "fused_or_reference", "available"]

_TILE_I = 256
_TILE_J = 512

#: test hook: run the pallas_call in interpret mode (CPU-executable) so the
#: REAL kernel math — Gram-identity distances, SMEM accumulation, grid
#: plumbing — is exercised by the suite, not just its plain-JAX mirrors
_INTERPRET = False


def available() -> bool:
    """Whether the fused kernel can run on the current default backend."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _sig(r, sig, a, b):
    coeff = 2.0 ** (a / b) - 1.0
    return 1.0 - (1.0 + coeff * (r / sig) ** a) ** (-b / a)


def _sig_prime(r, sig, a, b):
    """d/dr of the sketch-map sigmoid (guarded at r=0)."""
    coeff = 2.0 ** (a / b) - 1.0
    r_safe = jnp.maximum(r, 1e-12)
    u = 1.0 + coeff * (r_safe / sig) ** a
    return (b / a) * u ** (-b / a - 1.0) * coeff * a * (r_safe ** (a - 1.0)) / (
        sig**a
    )


def _dist2_euclid(xi, xj):
    """(T, d) x (Tj, d) -> (T, Tj) squared distances via the Gram identity.

    precision=HIGHEST is mandatory: Mosaic's DEFAULT matmul is single-pass
    bf16 (~2^-9 relative error — docs/mosaic_findings.md), far above the
    1e-5 parity bar for distance values feeding the loss."""
    dot = jnp.dot(xi, xj.T, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    ni = jnp.sum(xi * xi, axis=1, keepdims=True)
    nj = jnp.sum(xj * xj, axis=1)[None, :]
    return jnp.maximum(ni - 2.0 * dot + nj, 0.0)


def _dist_l(li, lj):
    d2 = _dist2_euclid(li, lj)
    mask = (d2 == 0.0).astype(d2.dtype)
    d = jnp.sqrt(d2 + mask * 1e-16) * (1.0 - mask)
    return d, mask


def _dist_h(hi, hj, periodicity: float, n_feat: int):
    """(T, D) x (Tj, D) -> (T, Tj) distances with the reference's guards."""
    if periodicity == float("inf"):
        d2 = _dist2_euclid(hi, hj)
        mask = (d2 == 0.0).astype(d2.dtype)
        return jnp.sqrt(d2 + mask * 1e-16) * (1.0 - mask)

    T, Tj = hi.shape[0], hj.shape[0]
    # static unroll over feature columns (Mosaic lacks dynamic_slice; n_feat
    # is static and small for angular CVs)
    d2 = jnp.zeros((T, Tj), jnp.float32)
    for k in range(n_feat):
        diff = jnp.abs(hi[:, k : k + 1] - hj[:, k : k + 1].T)
        diff = jnp.minimum(diff, periodicity - diff)
        diff = diff + (diff == 0.0).astype(diff.dtype) * 1e-12
        d2 = d2 + diff * diff
    return jnp.sqrt(d2) + 1e-12


def _tiles_fg(hi, hj, li, lj, params, periodicity, n_feat):
    """Shared tile math: returns (sig difference, f-factor tile pieces)."""
    sig_h, a_h, b_h, sig_l, a_l, b_l = params
    d_h = _dist_h(hi, hj, periodicity, n_feat)
    d_l, zero_mask = _dist_l(li, lj)
    s_h = _sig(d_h, sig_h, a_h, b_h)
    s_l = _sig(d_l, sig_l, a_l, b_l)
    return d_l, zero_mask, s_h, s_l


def _fwd_kernel(hi_ref, hj_ref, li_ref, lj_ref, out_ref, *, params,
                periodicity, n_total, n_feat):
    import jax.experimental.pallas as pl

    i = pl.program_id(0)
    j = pl.program_id(1)
    _, _, s_h, s_l = _tiles_fg(
        hi_ref[:], hj_ref[:], li_ref[:], lj_ref[:], params, periodicity,
        n_feat,
    )
    partial = jnp.sum((s_h - s_l) ** 2) / (n_total * n_total)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        out_ref[0, 0] = 0.0

    out_ref[0, 0] += partial


def _bwd_kernel(hi_ref, hj_ref, li_ref, lj_ref, grad_ref, *, params,
                periodicity, n_total, n_feat):
    import jax.experimental.pallas as pl

    j = pl.program_id(1)
    sig_l, a_l, b_l = params[3:]
    li = li_ref[:]
    lj = lj_ref[:]
    d_l, zero_mask, s_h, s_l = _tiles_fg(
        hi_ref[:], hj_ref[:], li, lj, params, periodicity, n_feat
    )
    sp_l = _sig_prime(d_l, sig_l, a_l, b_l)
    d_l_safe = jnp.where(d_l == 0.0, 1.0, d_l)
    f = (s_l - s_h) * sp_l / d_l_safe * (1.0 - zero_mask)
    f = f * (4.0 / (n_total * n_total))
    # grad_i += sum_j f_ij (l_i - l_j) = (sum_j f_ij) l_i - f @ l_j
    row = jnp.sum(f, axis=1, keepdims=True)
    # gradient contraction: HIGHEST, like hand_step in pallas_train.py —
    # bf16 here puts ~1e-3 relative noise on latent gradients
    contrib = row * li - jnp.dot(f, lj, preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)

    @pl.when(j == 0)
    def _():
        grad_ref[:] = jnp.zeros_like(grad_ref)

    grad_ref[:] += contrib


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_sigmoid_loss(h, l, params, periodicity):
    """Sketch-map sigmoid loss, fused on TPU via Pallas.

    Requires ``B % 512 == 0`` (use :func:`fused_or_reference` for automatic
    routing/fallback).

    WARNING: the custom VJP returns EXACT ZEROS for ``h`` — the
    high-dimensional side is the input batch, which training never
    differentiates (the reference likewise treats it as constant). Do NOT
    route through this kernel if your ``h`` depends on trainable
    parameters: the XLA path produces real h-gradients and this one
    silently drops them (training behavior would change discontinuously
    at the ``fused_or_reference`` batch-size threshold).

    Args:
        h: ``(B, D)`` high-dimensional batch (non-differentiable side).
        l: ``(B, d)`` latent batch (gradients flow here).
        params: static 6-tuple (sig_h, a_h, b_h, sig_l, a_l, b_l).
        periodicity: static float (inf for non-periodic).
    """
    return _fwd_impl(h, l, params, periodicity)


def _grid_specs(h, l):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = h.shape[0]
    grid = (n // _TILE_I, n // _TILE_J)
    in_specs = [
        pl.BlockSpec((_TILE_I, h.shape[1]), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((_TILE_J, h.shape[1]), lambda i, j: (j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((_TILE_I, l.shape[1]), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((_TILE_J, l.shape[1]), lambda i, j: (j, 0),
                     memory_space=pltpu.VMEM),
    ]
    return grid, in_specs


def _fwd_impl(h, l, params, periodicity):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = h.shape[0]
    assert n % _TILE_J == 0, (
        f"fused kernel requires B % {_TILE_J} == 0, got {n}"
    )
    h = h.astype(jnp.float32)
    l = l.astype(jnp.float32)
    grid, in_specs = _grid_specs(h, l)

    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, params=params, periodicity=periodicity, n_total=n,
            n_feat=h.shape[1],
        ),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM),
        interpret=_INTERPRET,
    )(h, h, l, l)
    return out[0, 0]


def _vjp_fwd(h, l, params, periodicity):
    return _fwd_impl(h, l, params, periodicity), (h, l)


def _vjp_bwd(params, periodicity, res, g):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, l = res
    n = h.shape[0]
    h32 = h.astype(jnp.float32)
    l32 = l.astype(jnp.float32)
    grid, in_specs = _grid_specs(h32, l32)

    grad = pl.pallas_call(
        functools.partial(
            _bwd_kernel, params=params, periodicity=periodicity, n_total=n,
            n_feat=h.shape[1],
        ),
        out_shape=jax.ShapeDtypeStruct(l32.shape, jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((_TILE_I, l32.shape[1]), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=_INTERPRET,
    )(h32, h32, l32, l32)
    return (jnp.zeros_like(h), (grad * g).astype(l.dtype))


fused_sigmoid_loss.defvjp(_vjp_fwd, _vjp_bwd)


def fused_or_reference(h, l, params, periodicity, min_batch: int = 16384,
                       h_precision: str = "highest"):
    """Route to the fused kernel only where it wins.

    Measured on a v5e chip: at B <= 8192 XLA's fused O(B^2) path is equally
    fast or faster (1.2 vs 1.4 ms at B=2048; 4.7 vs 6.0 ms at B=8192), so the
    Pallas kernel's value is MEMORY: it runs in O(B) while XLA materializes
    B^2 matrices (e.g. B=128k would need ~130 GB). Default routing therefore
    uses Pallas only for very large batches (or when callers lower
    ``min_batch`` explicitly).

    ``h_precision`` sets the MXU precision of the high-dimensional side's
    Gram matmul (no gradient ever flows there — the reference likewise
    treats the input batch as constant), so callers with very wide ``h``
    can drop to "high" (3-pass bf16) for half the MXU passes."""
    n = h.shape[0]
    if available() and n >= min_batch and n % _TILE_J == 0:
        return fused_sigmoid_loss(h, l, params, periodicity)
    from .distances import pairwise_dist, pairwise_dist_periodic, sigmoid

    sig_h, a_h, b_h, sig_l, a_l, b_l = params
    if periodicity == float("inf"):
        # high-dim h routes through the Gram identity inside pairwise_dist:
        # one MXU matmul vs a (B, B, d) VPU difference tensor — measured
        # 3.8x faster fwd+bwd at (B=256, d=190) on v5e
        dist_h = pairwise_dist(h, precision=h_precision)
    else:
        # min-image has no bilinear form -> full-matrix VPU path. An
        # upper-triangle-only variant (half the elementwise work) was
        # measured 8x SLOWER on v5e: 32k-row irregular gathers do not
        # vectorize on TPU. Keep the dense broadcasted form XLA fuses.
        dist_h = pairwise_dist_periodic(h, periodicity)
    dist_l = pairwise_dist(l)
    return jnp.mean(
        jnp.square(sigmoid(sig_h, a_h, b_h)(dist_h) -
                   sigmoid(sig_l, a_l, b_l)(dist_l))
    )


# test-support helpers (plain-JAX mirrors of the kernel math)
def _dist_h_tile(hi, hj, periodicity):
    if periodicity != float("inf"):
        d = jnp.abs(hi[:, None, :] - hj[None, :, :])
        d = jnp.minimum(d, periodicity - d)
        mask = (d == 0.0).astype(d.dtype)
        d = d + mask * 1e-12
        return jnp.sqrt(jnp.sum(d * d, axis=-1)) + 1e-12
    diff = hi[:, None, :] - hj[None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    mask = (d2 == 0.0).astype(d2.dtype)
    return jnp.sqrt(d2 + mask * 1e-16) * (1.0 - mask)


def _dist_l_tile(li, lj):
    diff = li[:, None, :] - lj[None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    mask = (d2 == 0.0).astype(d2.dtype)
    return jnp.sqrt(d2 + mask * 1e-16) * (1.0 - mask), mask
