# encodermap_tpu/losses.py
"""EncoderMap loss functions as pure, jittable scalar functions.

Re-implements the closure factories of
``/root/reference/encodermap/loss_functions/loss_functions.py:200-1067`` as
plain functions of arrays + static parameters. The TensorBoard-gating
``tf.cond(write_bool, ...)`` wrappers of the reference are unnecessary here:
the jitted train step returns every individual cost as a metric, and the host
decides what/when to log.

Loss inventory (names and formulas match the reference):

* ``sigmoid_loss``            — sketch-map cost between high-D and latent pairwise dists
* ``distance_loss``           — sigmoid_loss * distance_cost_scale
* ``cartesian_distance_loss`` — sigmoid_loss (non-periodic) on CA pairwise dists vs latent
* ``cartesian_loss``          — mean-abs/square/norm between in/out pairwise dists with soft-start scale
* ``auto_loss``               — periodic distance between input and reconstruction
* ``dihedral/angle/side_dihedral_loss`` — periodic mean-abs family with /reference *scale
* ``center_loss``             — mean(latent**2) * scale
* ``regularization_loss``     — l2_reg_constant * sum of squared kernels
"""

from __future__ import annotations

from math import pi
from typing import Optional, Union

import jax
import jax.numpy as jnp

from .ops.distances import periodic_distance as _periodic_distance
from .ops.pallas_sigmoid import fused_or_reference
from .parameters import ADCParameters, Parameters

__all__ = [
    "sigmoid_loss",
    "distance_loss",
    "cartesian_distance_loss",
    "cartesian_distance_loss_matrix",
    "cartesian_loss",
    "cartesian_loss_matrix",
    "cartesian_losses_analytic",
    "cartesian_losses_blocked",
    "auto_loss",
    "angle_loss",
    "dihedral_loss",
    "side_dihedral_loss",
    "center_loss",
    "regularization_loss",
    "periodic_diff_cost",
    "soft_start_scale",
    "reconstruction_loss",
    "loss_combinator",
]

Array = jax.Array


def periodic_diff_cost(
    y_true: Array, y_pred: Array, periodicity: float, variant: str
) -> Array:
    """The mean_abs/mean_square/mean_norm family over periodic differences.

    Reference: e.g. ``loss_functions.py:596-610``.

    Examples:
        >>> import jax.numpy as jnp
        >>> from math import pi
        >>> from encodermap_tpu.losses import periodic_diff_cost
        >>> a = jnp.asarray([[0.1]]); b = jnp.asarray([[2 * pi - 0.1]])
        >>> round(float(periodic_diff_cost(a, b, 2 * pi, "mean_abs")), 5)
        0.2
    """
    d = _periodic_distance(y_true, y_pred, periodicity)
    if variant == "mean_square":
        return jnp.mean(jnp.square(d))
    if variant == "mean_abs":
        return jnp.mean(jnp.abs(d))
    if variant == "mean_norm":
        return jnp.mean(jnp.linalg.norm(d, axis=1))
    raise ValueError(f"cost variant {variant!r} not available")


def sigmoid_loss(
    y_true: Array,
    y_pred: Array,
    dist_sig_parameters: tuple,
    periodicity: float,
    h_precision: str = "highest",
) -> Array:
    """Sketch-map sigmoid cost between all-pairs distances of ``y_true``
    (high-D, optionally periodic) and ``y_pred`` (latent, Euclidean).

    Reference: ``loss_functions.py:301-369``.
    """
    # Large batches on TPU route through the fused Pallas kernel (identical
    # math, O(1) memory in batch); small batches / CPU use the XLA path.
    return fused_or_reference(
        y_true, y_pred, tuple(dist_sig_parameters), periodicity,
        h_precision=h_precision,
    )


def distance_loss(y_true: Array, latent: Array, p: Parameters) -> Array:
    """``sigmoid_loss * distance_cost_scale``; 0 if the scale is None.

    Reference: ``loss_functions.py:200-298``.
    """
    if p.distance_cost_scale is None:
        return jnp.asarray(0.0, jnp.float32)
    cost = sigmoid_loss(y_true, latent, p.dist_sig_parameters, p.periodicity)
    return cost * p.distance_cost_scale


def cartesian_distance_loss(
    inp_pairwise: Array, latent: Array, p: ADCParameters
) -> Array:
    """Sigmoid loss between CA pairwise distances (non-periodic) and latent.

    Reference: ``loss_functions.py:873-944``.
    """
    if p.cartesian_distance_cost_scale is None:
        return jnp.asarray(0.0, jnp.float32)
    cost = sigmoid_loss(
        inp_pairwise, latent, p.cartesian_dist_sig_parameters, float("inf")
    )
    return cost * p.cartesian_distance_cost_scale


def cartesian_distance_loss_matrix(
    inp_mat: Array, latent: Array, p: ADCParameters
) -> Array:
    """:func:`cartesian_distance_loss` fed with the FULL ``(B, n, n)``
    CA-distance matrices (already computed for the cartesian cost) instead
    of flat upper-triangle vectors.

    Exactly the same loss value: every unordered pair appears twice in a
    matrix row and the diagonal is zero, so the batch-pairwise row
    distances scale by exactly ``sqrt(2)`` — and sketch-map's sigmoid
    absorbs that via ``sig -> sqrt(2) sig`` (its shape coefficient depends
    only on a, b):

        sig(sqrt(2) r; sqrt(2) sig, a, b) == sig(r; sig, a, b).

    Why: the flat form needs a 2 x (B, n(n-1)/2, 3) static triu gather of
    the coordinates first — ~40 % of the whole 158-residue ADC step on
    v5e (irregular gathers are POISON on TPU; see docs/adc_ablation_r3).
    The matrix rows are gather-free. The (B, B) Gram over the n^2-wide
    rows runs at "high" (3-pass bf16) MXU precision: no gradient flows
    through the high-D side, and at lysozyme scale (d = 158^2, 40 nm
    coordinate spans) the resulting loss is BIT-IDENTICAL to the
    HIGHEST-precision value (measured on v5e,
    scripts/precision_and_scale.py).
    """
    if p.cartesian_distance_cost_scale is None:
        return jnp.asarray(0.0, jnp.float32)
    B = inp_mat.shape[0]
    cost = sigmoid_loss(
        inp_mat.reshape(B, -1), latent, _matrix_sig_params(p), float("inf"),
        h_precision="high",
    )
    return cost * p.cartesian_distance_cost_scale


def _matrix_sig_params(p: "ADCParameters") -> tuple:
    """``cartesian_dist_sig_parameters`` adjusted for FULL-distance-matrix
    rows: the high-D sig scales by ``sqrt(2)`` because every unordered pair
    appears twice in a matrix row (diagonal zero), so row-space distances
    are exactly ``sqrt(2)`` x the triu form's, and sketch-map's sigmoid
    absorbs that via ``sig(sqrt(2) r; sqrt(2) sig, a, b) == sig(r; sig, a,
    b)`` (full proof in :func:`cartesian_distance_loss_matrix`). The low-D
    triplet is latent-space and unscaled. Single-sourced here because the
    matrix/analytic/blocked routes must stay exactly equivalent."""
    from math import sqrt

    sig_h, a_h, b_h, sig_l, a_l, b_l = p.cartesian_dist_sig_parameters
    return (sig_h * sqrt(2.0), a_h, b_h, sig_l, a_l, b_l)


def soft_start_scale(p: ADCParameters, step: Array) -> Array:
    """The soft-start cartesian cost scale as a pure function of the global
    step (the reference drives this with the ``IncreaseCartesianCost``
    callback mutating a Keras variable, ``callbacks/callbacks.py:532-606``):

    * step <  a: 0
    * a <= step <= b: cartesian_cost_scale * (step - a) / (b - a)
    * step >  b: cartesian_cost_scale

    Examples:
        >>> import jax.numpy as jnp
        >>> from encodermap_tpu import ADCParameters
        >>> from encodermap_tpu.losses import soft_start_scale
        >>> p = ADCParameters(cartesian_cost_scale=1.0,
        ...                   cartesian_cost_scale_soft_start=(10, 20))
        >>> [float(soft_start_scale(p, jnp.asarray(s))) for s in (5, 15, 25)]
        [0.0, 0.5, 1.0]
    """
    scale = p.cartesian_cost_scale if p.cartesian_cost_scale is not None else 0.0
    a, b = p.cartesian_cost_scale_soft_start
    if a is None or b is None:
        return jnp.asarray(scale, jnp.float32)
    step_f = step.astype(jnp.float32)
    if a == b:
        # instant switch-on: (step - a)/0 would be NaN exactly at step == a
        frac = (step_f >= a).astype(jnp.float32)
    else:
        frac = jnp.clip((step_f - a) / float(b - a), 0.0, 1.0)
    return jnp.asarray(scale, jnp.float32) * frac


def cartesian_loss(
    inp_pairwise: Array,
    out_pairwise: Array,
    p: ADCParameters,
    scale: Union[Array, float, None] = None,
) -> Array:
    """Mean-abs/square/norm between input and backmapped pairwise distances,
    divided by the reference constant and multiplied by the (possibly
    soft-started) scale.

    Reference: ``loss_functions.py:947-1067``.
    """
    if p.cartesian_cost_variant == "mean_square":
        cost = jnp.mean(jnp.square(inp_pairwise - out_pairwise))
    elif p.cartesian_cost_variant == "mean_abs":
        cost = jnp.mean(jnp.abs(inp_pairwise - out_pairwise))
    elif p.cartesian_cost_variant == "mean_norm":
        cost = jnp.mean(jnp.linalg.norm(inp_pairwise - out_pairwise, axis=1))
    else:
        raise ValueError(
            f"cartesian_cost_variant {p.cartesian_cost_variant!r} not available"
        )
    cost = cost / p.cartesian_cost_reference
    if scale is None:
        scale = p.cartesian_cost_scale if p.cartesian_cost_scale is not None else 0.0
    return cost * scale


def cartesian_loss_matrix(
    inp_mat: Array,
    out_mat: Array,
    p: ADCParameters,
    scale: Union[Array, float, None] = None,
) -> Array:
    """:func:`cartesian_loss` evaluated from FULL ``(B, n, n)`` distance
    matrices instead of flat upper-triangle vectors.

    Mathematically identical to the flat form (each off-diagonal pair
    appears twice, the diagonal contributes zero — normalization accounts
    for both), but the backward pass through the *backmapped* coordinates
    is a dense reduction instead of a 2x-n(n-1)/2 index scatter, which on
    TPU is the difference between ~30 us and ~2 ms at 158 residues
    (measured v5e, batch 256).
    """
    n = inp_mat.shape[-1]
    n_pairs = n * (n - 1) // 2
    B = inp_mat.shape[0]
    diff = inp_mat - out_mat
    if p.cartesian_cost_variant == "mean_square":
        cost = jnp.sum(jnp.square(diff)) / (2 * n_pairs * B)
    elif p.cartesian_cost_variant == "mean_abs":
        cost = jnp.sum(jnp.abs(diff)) / (2 * n_pairs * B)
    elif p.cartesian_cost_variant == "mean_norm":
        row = jnp.sum(jnp.square(diff), axis=(-1, -2)) / 2.0
        cost = jnp.mean(jnp.sqrt(row))
    else:
        raise ValueError(
            f"cartesian_cost_variant {p.cartesian_cost_variant!r} not available"
        )
    cost = cost / p.cartesian_cost_reference
    if scale is None:
        scale = p.cartesian_cost_scale if p.cartesian_cost_scale is not None else 0.0
    return cost * scale


def cartesian_losses_analytic(
    inp_xyz: Array,
    out_xyz: Array,
    latent: Array,
    p: ADCParameters,
    scale: Union[Array, float, None] = None,
) -> tuple[Array, Array]:
    """``(cartesian_loss, cartesian_distance_loss)`` for LARGE proteins via
    hand-written VJPs (``ops.cartesian_analytic``): the backward recomputes
    the distance matrices inside fused reductions instead of storing
    ``(B, n, n)`` residuals, and the CA-pair sigmoid consumes a single
    HIGH-precision MXU Gram of the input rows. Same values as
    :func:`cartesian_loss_matrix` + :func:`cartesian_distance_loss_matrix`
    up to f32 summation order; the round-4 production path at >= 320
    selected atoms (dense autodiff wins below, ``docs/perf_r4.md``).

    Args:
        inp_xyz / out_xyz: ``(B, n, 3)`` SELECTED (CA) input / backmapped
            coordinates. No gradient flows to the input side.
        latent: ``(B, d)`` latent points for the CA-pair sigmoid loss.
    """
    from .ops.blocked_cartesian import sigmoid_from_gram
    from .ops.cartesian_analytic import (
        cartesian_cost_analytic,
        input_row_gram,
    )

    inp_xyz = jax.lax.stop_gradient(inp_xyz)
    acc = cartesian_cost_analytic(out_xyz, inp_xyz, p.cartesian_cost_variant)
    B, n, _ = inp_xyz.shape
    n_pairs = n * (n - 1) // 2
    if p.cartesian_cost_variant in ("mean_square", "mean_abs"):
        cost = acc / (2 * n_pairs * B)
    else:  # mean_norm: per-sample full-matrix squared sums
        cost = jnp.mean(jnp.sqrt(acc / 2.0))
    cost = cost / p.cartesian_cost_reference
    if scale is None:
        scale = p.cartesian_cost_scale if p.cartesian_cost_scale is not None else 0.0
    cart = cost * scale

    if p.cartesian_distance_cost_scale is None:
        return cart, jnp.asarray(0.0, jnp.float32)
    cdist = sigmoid_from_gram(input_row_gram(inp_xyz), latent,
                              _matrix_sig_params(p))
    return cart, cdist * p.cartesian_distance_cost_scale


def cartesian_losses_blocked(
    inp_xyz: Array,
    out_xyz: Array,
    latent: Array,
    p: ADCParameters,
    scale: Union[Array, float, None] = None,
    block: int = 128,
) -> tuple[Array, Array]:
    """``(cartesian_loss, cartesian_distance_loss)`` for LARGE proteins,
    computed blockwise so the ``(B, n, n)`` distance matrices never
    materialize (``ops.blocked_cartesian``; same values as
    :func:`cartesian_loss_matrix` + :func:`cartesian_distance_loss_matrix`
    up to f32 summation order).

    Args:
        inp_xyz / out_xyz: ``(B, n, 3)`` SELECTED (CA) input / backmapped
            coordinates.
        latent: ``(B, d)`` latent points for the CA-pair sigmoid loss.
    """
    from .ops.blocked_cartesian import blocked_cartesian_terms, sigmoid_from_gram

    want_sigmoid = p.cartesian_distance_cost_scale is not None
    acc, gram = blocked_cartesian_terms(
        inp_xyz, out_xyz, variant=p.cartesian_cost_variant, block=block,
        with_gram=want_sigmoid,
    )
    B, n, _ = inp_xyz.shape
    n_pairs = n * (n - 1) // 2
    if p.cartesian_cost_variant in ("mean_square", "mean_abs"):
        cost = acc / (2 * n_pairs * B)
    else:  # mean_norm: per-sample full-matrix squared sums
        cost = jnp.mean(jnp.sqrt(acc / 2.0))
    cost = cost / p.cartesian_cost_reference
    if scale is None:
        scale = p.cartesian_cost_scale if p.cartesian_cost_scale is not None else 0.0
    cart = cost * scale

    if not want_sigmoid:
        return cart, jnp.asarray(0.0, jnp.float32)
    cdist = sigmoid_from_gram(gram, latent, _matrix_sig_params(p))
    return cart, cdist * p.cartesian_distance_cost_scale


def auto_loss(y_true: Array, y_pred: Array, p: Parameters) -> Array:
    """Autoencoding cost over periodic distances. Reference:
    ``loss_functions.py:553-628``."""
    if p.auto_cost_scale is None:
        return jnp.asarray(0.0, jnp.float32)
    cost = periodic_diff_cost(y_true, y_pred, p.periodicity, p.auto_cost_variant)
    return cost * p.auto_cost_scale


def _angle_family(
    y_true: Array,
    y_pred: Array,
    p: ADCParameters,
    scale: Optional[float],
    variant: str,
    reference: float,
) -> Array:
    if scale is None:
        return jnp.asarray(0.0, jnp.float32)
    cost = periodic_diff_cost(y_true, y_pred, p.periodicity, variant)
    return cost / reference * scale


def dihedral_loss(y_true: Array, y_pred: Array, p: ADCParameters) -> Array:
    """Reference: ``loss_functions.py:631-712``."""
    return _angle_family(
        y_true, y_pred, p,
        p.dihedral_cost_scale, p.dihedral_cost_variant, p.dihedral_cost_reference,
    )


def angle_loss(y_true: Array, y_pred: Array, p: ADCParameters) -> Array:
    """Reference: ``loss_functions.py:790-870``."""
    return _angle_family(
        y_true, y_pred, p,
        p.angle_cost_scale, p.angle_cost_variant, p.angle_cost_reference,
    )


def side_dihedral_loss(y_true: Array, y_pred: Array, p: ADCParameters) -> Array:
    """Reference: ``loss_functions.py:715-787``."""
    return _angle_family(
        y_true, y_pred, p,
        p.side_dihedral_cost_scale, p.side_dihedral_cost_variant,
        p.side_dihedral_cost_reference,
    )


def center_loss(latent: Array, p: Parameters) -> Array:
    """``mean(latent**2) * center_cost_scale``. Reference:
    ``loss_functions.py:372-451``."""
    if p.center_cost_scale is None:
        return jnp.asarray(0.0, jnp.float32)
    return jnp.mean(jnp.square(latent)) * p.center_cost_scale


def regularization_loss(l2_kernel_sum: Array, p: Parameters) -> Array:
    """Keras ``regularizers.l2`` semantics: ``const * sum(w**2)`` summed over
    all kernel matrices. Reference: ``loss_functions.py:454-508`` (via
    ``model.losses``)."""
    return p.l2_reg_constant * l2_kernel_sum


def reconstruction_loss(model=None):
    """Loss factory for custom training loops: plain mean-squared
    reconstruction error (reference ``loss_functions.py:511-551``).

    Returns ``loss(y_true, y_pred=None)``; when ``y_pred`` is omitted the
    provided ``model`` (any callable, e.g. a
    :class:`~encodermap_tpu.models.sequential.SequentialModel`) is called
    on ``y_true``. Pure JAX — jittable and differentiable.
    """

    def reconstruction_loss_func(y_true: Array, y_pred: Array = None) -> Array:
        if y_pred is None:
            if model is None:
                raise ValueError(
                    "reconstruction_loss needs either a model at factory "
                    "time or y_pred at call time"
                )
            y_pred = model(y_true)
        return jnp.mean(jnp.square(y_pred - y_true))

    return reconstruction_loss_func


def loss_combinator(*losses):
    """Combine loss closures into one summed loss
    (reference ``loss_functions.py:146-198``): each entry is called as
    ``loss(y_true, y_pred)`` and the scalar results are added."""

    def combined_loss_func(y_true: Array, y_pred: Array = None) -> Array:
        return sum(loss(y_true, y_pred) for loss in losses)

    return combined_loss_func
