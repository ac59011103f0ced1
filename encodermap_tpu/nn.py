# encodermap_tpu/nn.py
"""Minimal functional NN layer: parameter pytrees + pure apply functions.

The reference builds Keras ``Dense`` stacks
(``/root/reference/encodermap/models/models.py:3189-3220``) with
``VarianceScaling()`` kernels, ``RandomNormal(0.1, 0.05)`` biases and L2
kernel regularization. Here the same math is expressed as explicit pytrees so
that

* the whole train step jits into a single XLA computation,
* parameter sharding (tensor parallelism over the hidden dim) is a matter of
  tree-mapping ``NamedSharding`` onto the pytree,
* checkpointing is a flat dict of arrays with no framework lock-in.

Matmuls go through :func:`dense_apply`, which optionally casts to bfloat16
for the MXU while accumulating in float32.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "ACTIVATIONS",
    "dense_init",
    "dense_apply",
    "mlp_init",
    "mlp_apply",
    "l2_sum",
]

Array = jax.Array
Params = dict[str, Any]

ACTIVATIONS: dict[str, Optional[Callable[[Array], Array]]] = {
    "": None,
    "linear": None,
    "tanh": jnp.tanh,
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
    "softplus": jax.nn.softplus,
    "elu": jax.nn.elu,
    "gelu": jax.nn.gelu,
    "swish": jax.nn.swish,
    "leaky_relu": jax.nn.leaky_relu,
}


def dense_init(
    key: jax.Array,
    in_dim: int,
    out_dim: int,
    dtype: Any = jnp.float32,
    kernel_initializer: str = "VarianceScaling",
    bias_initializer: str = "RandomNormal",
) -> Params:
    """One dense layer's parameters.

    Defaults reproduce the reference's initializer choices
    (``models/models.py:3182-3186``): ``VarianceScaling()`` == scale 1.0,
    fan_in, truncated normal; bias ``RandomNormal(mean=0.1, stddev=0.05)``.
    """
    k_kernel, k_bias = jax.random.split(key)
    if kernel_initializer == "VarianceScaling":
        init = jax.nn.initializers.variance_scaling(
            1.0, "fan_in", "truncated_normal"
        )
        kernel = init(k_kernel, (in_dim, out_dim), dtype)
    elif kernel_initializer == "ones":
        kernel = jnp.ones((in_dim, out_dim), dtype)
    elif kernel_initializer == "glorot_uniform":
        kernel = jax.nn.initializers.glorot_uniform()(k_kernel, (in_dim, out_dim), dtype)
    else:
        raise ValueError(f"unknown kernel initializer {kernel_initializer!r}")
    if bias_initializer == "RandomNormal":
        bias = 0.1 + 0.05 * jax.random.normal(k_bias, (out_dim,), dtype)
    elif bias_initializer == "ones":
        bias = jnp.ones((out_dim,), dtype)
    elif bias_initializer == "zeros":
        bias = jnp.zeros((out_dim,), dtype)
    else:
        raise ValueError(f"unknown bias initializer {bias_initializer!r}")
    return {"kernel": kernel, "bias": bias}


def dense_apply(
    params: Params,
    x: Array,
    activation: Optional[Callable[[Array], Array]] = None,
    compute_dtype: Any = None,
) -> Array:
    """``act(x @ kernel + bias)`` with optional bf16 matmul / fp32 accumulate."""
    kernel = params["kernel"]
    bias = params["bias"]
    if compute_dtype is not None and compute_dtype != kernel.dtype:
        # bf16 on the MXU with f32 accumulation
        x = x.astype(compute_dtype)
        kernel = kernel.astype(compute_dtype)
        precision = None
    else:
        # true f32: the platform default may use reduced-precision passes
        precision = jax.lax.Precision.HIGHEST
    y = jnp.dot(x, kernel, preferred_element_type=jnp.float32, precision=precision)
    y = y.astype(jnp.float32) + bias.astype(jnp.float32)
    if activation is not None:
        y = activation(y)
    return y


def mlp_init(
    key: jax.Array,
    dims: Sequence[int],
    dtype: Any = jnp.float32,
    **kwargs: Any,
) -> list[Params]:
    """A stack of dense layers: ``dims = [in, h1, h2, ..., out]``."""
    keys = jax.random.split(key, len(dims) - 1)
    return [
        dense_init(k, d_in, d_out, dtype, **kwargs)
        for k, d_in, d_out in zip(keys, dims[:-1], dims[1:])
    ]


def mlp_apply(
    layers: Sequence[Params],
    x: Array,
    activations: Sequence[Optional[Callable[[Array], Array]]],
    compute_dtype: Any = None,
) -> Array:
    """Apply a dense stack with one activation per layer."""
    assert len(layers) == len(activations), (len(layers), len(activations))
    for lp, act in zip(layers, activations):
        x = dense_apply(lp, x, act, compute_dtype)
    return x


def l2_sum(layers_tree: Any) -> Array:
    """Sum of squared kernel weights (biases excluded), matching Keras'
    ``regularizers.l2``: ``loss = const * sum(w**2)`` per layer. The constant
    is applied by the caller."""
    leaves = []

    def visit(node):
        if isinstance(node, dict) and "kernel" in node:
            leaves.append(jnp.sum(jnp.square(node["kernel"])))
        elif isinstance(node, dict):
            for v in node.values():
                visit(v)
        elif isinstance(node, (list, tuple)):
            for v in node:
                visit(v)

    visit(layers_tree)
    total = jnp.asarray(0.0, jnp.float32)
    for leaf in leaves:
        total = total + leaf
    return total
