# encodermap_tpu/ops/distances.py
"""Distance kernels: Euclidean, periodic, and pairwise variants.

Pure-JAX re-implementations of the reference's distance math
(``/root/reference/encodermap/misc/distances.py:66-255``) with identical
epsilon/gradient-guard semantics:

* ``pairwise_dist`` computes direct coordinate differences (pure VPU work;
  see its docstring for why the reference's Gram-matrix identity is a bad
  fit for d = 2-3) and protects the sqrt-at-zero gradient by adding 1e-16
  under the mask and re-zeroing afterwards.
* ``pairwise_dist_periodic`` adds 1e-12 to exact-zero component distances
  before the reduction and 1e-12 to the final sqrt.
* ``sigmoid`` is sketch-map's sigmoid ``1 - (1 + (2^(a/b)-1)(r/sig)^a)^(-b/a)``.

All functions are jit-/vmap-/grad-safe and shape-polymorphic in the batch
dimension only through retracing (static shapes inside a trace, as XLA
requires).
"""

from __future__ import annotations

from functools import partial
from math import pi
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "sigmoid",
    "periodic_distance",
    "periodic_distance_np",
    "pairwise_dist",
    "pairwise_dist_periodic",
    "triu_indices_mask",
    "sqrt_guard",
    "component_plane_dists",
]

Array = jax.Array


def sqrt_guard(d2: Array) -> Array:
    """``sqrt(d2)`` with an exact zero value AND zero gradient where
    ``d2 == 0`` (+1e-16 under the mask, then re-zero). This is THE diagonal
    convention of every distance-matrix producer in the package
    (:func:`pairwise_dist`, ``ops.cartesian_analytic``,
    ``ops.blocked_cartesian``) — single-sourced because the
    dense-vs-analytic-vs-blocked loss-equality guarantees depend on all
    paths guarding identically."""
    mask = (d2 == 0.0).astype(d2.dtype)
    return jnp.sqrt(d2 + mask * 1e-16) * (1.0 - mask)


def component_plane_dists(a: Array, b: Array) -> Array:
    """Euclidean distances ``(..., R, n)`` between the length-3 rows of
    ``a`` ``(..., R, 3)`` and ``b`` ``(..., n, 3)``, accumulated as three
    component-plane broadcasts: a stacked ``(..., R, n, 3)`` difference
    tensor would put the 3 in the TPU lane axis and idle 125/128 lanes
    (measured 58x on the backmap scan). XLA fuses the planes into the
    consumer; nothing here forces a materialization. Shares
    :func:`sqrt_guard`'s diagonal convention."""
    d2 = None
    for c in range(3):
        diff = a[..., c][..., :, None] - b[..., c][..., None, :]
        sq = diff * diff
        d2 = sq if d2 is None else d2 + sq
    return sqrt_guard(d2)


def sigmoid(sig: float, a: float, b: float) -> Callable[[Array], Array]:
    """Returns sketch-map's sigmoid function with parameters closed over.

    Reference: ``misc/distances.py:66-88``.
    """

    coeff = 2.0 ** (a / b) - 1.0

    def func(r):
        return 1.0 - (1.0 + coeff * (r / sig) ** a) ** (-b / a)

    return func


def sig_value(r, sig, a, b):
    """Sketch-map sigmoid on precomputed distances (array-in form of
    :func:`sigmoid`). SINGLE-SOURCED here for the fused Pallas trainer and
    the analytic-adjoint oracle — the wave-10 missing-c gradient bug had
    to be fixed in two drifted copies; never fork this again."""
    c = 2.0 ** (a / b) - 1.0
    return 1.0 - (1.0 + c * (r / sig) ** a) ** (-b / a)


def dsig_over_r(r2, r, sig, a, b):
    """``s'(r)/r`` with the a==2 smooth form (no r=0 singularity) and a
    general guarded form otherwise. ``r2`` is r**2 (exact zero on the
    diagonal). Shared by ``ops/pallas_train.py`` and
    ``ops/adc_adjoint.py`` (see :func:`sig_value`)."""
    c = 2.0 ** (a / b) - 1.0
    if a == 2:
        base = 1.0 + c * r2 / sig**2
        return (b * c / sig**2) * base ** (-b / a - 1.0)
    r_safe = jnp.where(r2 == 0.0, 1.0, r)
    t = (r_safe / sig) ** a
    # base is (1 + c*t) — matching the forward sigmoid (a missing c here
    # silently scaled gradients 2-4x for a != 2; cf.
    # pallas_sigmoid._sig_prime)
    out = b * c * t * (1.0 + c * t) ** (-b / a - 1.0) / jnp.square(r_safe)
    return jnp.where(r2 == 0.0, 0.0, out)


def _sigmoid_doctest():
    """
    Example:
        >>> from encodermap_tpu.ops.distances import sigmoid
        >>> f = sigmoid(sig=1.0, a=2, b=2)
        >>> round(float(f(1.0)), 6)  # r == sig -> 0.5 by construction
        0.5
    """


def periodic_distance_np(
    a: np.ndarray, b: np.ndarray, periodicity: float = 2 * pi
) -> np.ndarray:
    """NumPy min-image distance between points in a periodic space.

    Reference: ``misc/distances.py:91-110``.

    Example:
        >>> import numpy as np
        >>> from encodermap_tpu.ops.distances import periodic_distance_np
        >>> round(float(periodic_distance_np(3.0, -3.0)), 6)
        0.283185
    """
    d = np.abs(b - a)
    return np.minimum(d, periodicity - d)


def periodic_distance(a: Array, b: Array, periodicity: float = 2 * pi) -> Array:
    """Min-image distance ``min(|b-a|, P-|b-a|)`` between points in a
    periodic space; pass ``float('inf')`` for no periodicity.

    Reference: ``misc/distances.py:113-141``.
    """
    d = jnp.abs(b - a)
    if periodicity == float("inf"):
        return d
    return jnp.minimum(d, periodicity - d)


def pairwise_dist_periodic(positions: Array, periodicity: float) -> Array:
    """All-pairs distance of 2-D ``(n_points, n_dims)`` periodic data.

    High-dim inputs (d >= 16) use the min-image decomposition

        ``min(|δ|, P-|δ|)^2 = δ^2 - 2P * relu(|δ| - P/2)``

    whose δ^2 term is the Gram identity — one HIGHEST-precision MXU
    matmul — leaving only the cheap relu correction on the VPU: measured
    2.15x faster fwd+bwd at (256, 1259) on v5e with a bit-identical loss
    value. Low-dim inputs keep the reference's exact elementwise form
    incl. its +1e-12 guard on exactly-zero component distances (the
    decomposition drops that per-component shift; the resulting distance
    differs only for identical points, where both forms are ~1e-12 and
    the sigmoid contribution vanishes).

    Reference: ``misc/distances.py:144-176``.
    """
    assert positions.ndim == 2, "positions must be (n_points, n_dims)"
    # periodicity=inf degenerates to plain Euclidean; the decomposition
    # below would produce inf * 0 = NaN in the correction term, so only
    # finite periodicities take it (the elementwise fallback handles inf
    # exactly like the reference: min-image of inf is |b - a|)
    if positions.shape[-1] >= _GRAM_MIN_DIM and np.isfinite(periodicity):
        sq = jnp.sum(jnp.square(positions), axis=-1)
        gram = jnp.einsum(
            "nd,md->nm", positions, positions,
            precision=jax.lax.Precision.HIGHEST,
        )
        delta2 = sq[:, None] + sq[None, :] - 2.0 * gram
        corr = (2.0 * periodicity) * jnp.einsum(
            "nmd->nm",
            jax.nn.relu(
                jnp.abs(positions[:, None, :] - positions[None, :, :])
                - periodicity / 2
            ),
        )
        d2 = jnp.maximum(delta2 - corr, 0.0)
        n = d2.shape[0]
        d2 = d2 * (1.0 - jnp.eye(n, dtype=d2.dtype))
        return sqrt_guard(d2) + 1e-12
    vecs = periodic_distance(
        positions[:, None, :], positions[None, :, :], periodicity
    )
    mask = (vecs == 0.0).astype(positions.dtype)
    vecs = vecs + mask * 1e-12
    dists = jnp.sqrt(jnp.sum(jnp.square(vecs), axis=2)) + 1.0e-12
    return dists


def triu_indices_mask(n: int) -> np.ndarray:
    """Boolean (n, n) mask selecting the strict upper triangle, matching the
    reference's ``flat=True`` ordering (``misc/distances.py:235-242``)."""
    mask = np.ones((n, n), dtype=bool)
    mask[np.tril_indices(n)] = False
    return mask


#: feature dim at/above which the full-matrix path switches to the Gram
#: identity (one MXU matmul). Below it, direct differences are faster
#: (the K=d matmul leaves the MXU idle at d=2-3) and exact.
_GRAM_MIN_DIM = 16


_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}


@partial(jax.jit, static_argnames=("squared", "flat", "precision", "method"))
def pairwise_dist(
    positions: Array,
    squared: bool = False,
    flat: bool = False,
    precision: str = "highest",
    method: str = "auto",
) -> Array:
    """All-pairs Euclidean distance.

    Low-dim inputs (latent spaces, xyz) use direct coordinate differences:
    the Gram-matrix identity ``||a-b||^2 = ||a||^2 - 2<a,b> + ||b||^2``
    maps to a K=d batched matmul, which for d = 2-3 leaves the MXU idle and
    loses precision to cancellation. High-dim inputs (d >= 16: the
    feature/pair vectors of the sigmoid losses) DO take the Gram identity
    — one HIGHEST-precision MXU matmul instead of materializing the
    (b, n, n, d) difference tensor on the VPU; this is also the
    formulation the reference itself uses (``misc/distances.py:179-255``).
    For ``flat=True`` only the n*(n-1)/2 upper-triangle pairs are ever
    materialized (two static gathers), halving memory traffic in forward
    and backward.

    Args:
        positions: ``(n, d)`` or batched ``(b, n, d)`` points.
        squared: return squared distances.
        flat: return only the strict upper triangle (pdist-like), flattened
            row-major — matches the reference's ``flat=True``.
        precision: MXU precision for the Gram matmul — "highest" (6-pass,
            default), "high" (3-pass bf16, ~f32-accurate for well-scaled
            data at half the MXU cost), or "default".
        method: "auto" picks Gram for d >= 16 and direct differences below;
            "gram"/"direct" force a path (e.g. Gram for xyz when n is large
            enough that the ``(b, n, n, 3)`` difference tensor's HBM
            traffic dominates). Ignored when ``flat``.

    Returns:
        ``(b, n, n)`` matrix, or ``(b, n*(n-1)/2)`` when ``flat``. A 2-D input
        becomes ``(1, n, n)`` — the reference keeps the batched shape for 2-D
        inputs and we reproduce that.

    Reference: ``misc/distances.py:179-255``.
    """
    if positions.ndim == 2:
        positions = positions[None]

    use_gram = (
        method == "gram"
        or (method == "auto" and positions.shape[-1] >= _GRAM_MIN_DIM)
    )
    if flat:
        n = positions.shape[1]
        iu = np.triu_indices(n, k=1)
        # per-component gathers keep the pair axis in lanes (see below)
        d2 = None
        for c in range(positions.shape[-1]):
            comp = positions[..., c]
            sq = jnp.square(comp[:, iu[0]] - comp[:, iu[1]])
            d2 = sq if d2 is None else d2 + sq
    elif use_gram:
        sq = jnp.sum(jnp.square(positions), axis=-1)
        gram = jnp.einsum(
            "bnd,bmd->bnm", positions, positions,
            precision=_PRECISIONS[precision],
        )
        d2 = sq[:, :, None] + sq[:, None, :] - 2.0 * gram
        # cancellation can leave tiny negatives / a nonzero diagonal;
        # clamp and pin the diagonal to an exact 0 so the grad guard and
        # the reference's zero-diagonal semantics hold
        d2 = jnp.maximum(d2, 0.0)
        n = d2.shape[-1]
        eye = jnp.eye(n, dtype=d2.dtype)
        d2 = d2 * (1.0 - eye)
    else:
        # component-wise accumulation: d = 2-3 here, and a stacked
        # (b, n, n, d) difference tensor puts d in the TPU lane axis
        # (125/128 lanes idle); per-component (b, n, n) planes keep the
        # VPU full in forward AND backward
        d2 = None
        for c in range(positions.shape[-1]):
            comp = positions[..., c]
            sq = jnp.square(comp[:, :, None] - comp[:, None, :])
            d2 = sq if d2 is None else d2 + sq

    if squared:
        return d2

    return sqrt_guard(d2)
