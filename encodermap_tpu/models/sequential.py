# encodermap_tpu/models/sequential.py
"""The plain MLP autoencoder used by :class:`EncoderMap`.

Functional re-design of the reference's ``SequentialModel``
(``/root/reference/encodermap/models/models.py:3099-3401``):

* layer stack: ``n_neurons + n_neurons[-2::-1]`` + a final layer restoring the
  input dim, activations ``act[1:] + act[-2::-1]`` + linear output,
* periodic inputs are rescaled to 2*pi and doubled via (sin, cos); periodic
  outputs halve via atan2 and rescale back (``models.py:3331-3359``),
* the bottleneck is the smallest layer; everything before it (inclusive) is
  the encoder.

Everything here is a pure function of ``(params, x)`` with the static
``Parameters`` closed over, so the composite train step jits to one XLA
program.
"""

from __future__ import annotations

from math import pi
from typing import Any

import jax
import jax.numpy as jnp

from ..nn import ACTIVATIONS, l2_sum, mlp_apply, mlp_init
from ..parameters import Parameters

__all__ = [
    "layer_stack",
    "init_params",
    "densify",
    "encode",
    "decode",
    "forward",
    "regularization_sum",
    "SequentialModel",
    "gen_sequential_model",
]

Array = jax.Array


def layer_stack(p: Parameters, input_dim: int) -> tuple[list, list, int]:
    """Compute (encoder_layer_data, decoder_layer_data, effective_input_dim).

    Each layer datum is ``(n_units, activation_name)``. Mirrors
    ``models/models.py:3128-3160``.
    """
    eff_input_dim = input_dim * 2 if p.periodicity < float("inf") else input_dim
    acts = list(p.activation_functions)
    layer_data = list(
        zip(
            list(p.n_neurons) + list(p.n_neurons[-2::-1]),
            acts[1:] + acts[-2::-1],
        )
    )
    layer_data.append((eff_input_dim, ""))
    neurons = [d[0] for d in layer_data]
    bottleneck_index = neurons.index(min(neurons)) + 1
    encoder_layers = layer_data[:bottleneck_index]
    decoder_layers = layer_data[bottleneck_index:]
    return encoder_layers, decoder_layers, eff_input_dim


def init_params(
    key: jax.Array, p: Parameters, input_dim: int, dtype: Any = jnp.float32,
    sparse: bool = False,
) -> dict:
    """Initialize {"encoder": [...], "decoder": [...]} parameter pytree.

    ``sparse=True`` (NaN-padded ragged-ensemble inputs) adds a trainable
    square Dense densifier applied to the zero-filled raw inputs before
    the periodic fold-in — the masked-dense equivalent of the reference's
    sparse-input Dense layer (``models.py:3165-3177``); with zero-filling,
    ``x @ W`` equals the reference's sparse-dense matmul exactly."""
    enc_layers, dec_layers, eff_in = layer_stack(p, input_dim)
    k_enc, k_dec, k_sp = jax.random.split(key, 3)
    enc_dims = [eff_in] + [d[0] for d in enc_layers]
    dec_dims = [enc_dims[-1]] + [d[0] for d in dec_layers]
    params = {
        "encoder": mlp_init(k_enc, enc_dims, dtype),
        "decoder": mlp_init(k_dec, dec_dims, dtype),
    }
    if sparse:
        from ..nn import dense_init

        params["densifier"] = dense_init(k_sp, input_dim, input_dim, dtype)
    return params


def densify(params: dict, x: Array) -> Array:
    """Zero-fill NaNs and apply the densifier when the model has one (else
    identity). The densified vector is both the encoder input AND the
    reconstruction target, mirroring the ADC sparse path."""
    if "densifier" not in params:
        return x
    from ..nn import dense_apply

    return dense_apply(params["densifier"], jnp.nan_to_num(x))


def _acts(layer_data: list) -> list:
    return [ACTIVATIONS[name] for _, name in layer_data]


def encode(params: dict, p: Parameters, x: Array) -> Array:
    """Periodic fold-in (scale to 2*pi, sin/cos doubling) + encoder MLP.

    Reference: ``models/models.py:3331-3347``.
    """
    enc_layers, _, _ = layer_stack(p, _orig_input_dim(params, p))
    if p.periodicity < float("inf"):
        if p.periodicity != 2 * pi:
            x = x / p.periodicity * 2 * pi
        x = jnp.concatenate([jnp.sin(x), jnp.cos(x)], axis=1)
    compute_dtype = jnp.bfloat16 if p.compute_dtype == "bfloat16" else None
    return mlp_apply(params["encoder"], x, _acts(enc_layers), compute_dtype)


def decode(params: dict, p: Parameters, z: Array) -> Array:
    """Decoder MLP + periodic fold-out (atan2 halving, rescale).

    Reference: ``models/models.py:3349-3359``.
    """
    _, dec_layers, _ = layer_stack(p, _orig_input_dim(params, p))
    compute_dtype = jnp.bfloat16 if p.compute_dtype == "bfloat16" else None
    x = mlp_apply(params["decoder"], z, _acts(dec_layers), compute_dtype)
    if p.periodicity < float("inf"):
        s, c = jnp.split(x, 2, axis=1)
        x = jnp.arctan2(s, c)
        if p.periodicity != 2 * pi:
            x = x / (2 * pi) * p.periodicity
    return x


def forward(params: dict, p: Parameters, x: Array) -> Array:
    """Full autoencoder pass: encode then decode."""
    return decode(params, p, encode(params, p, x))


def regularization_sum(params: dict) -> Array:
    """Sum of squared kernels over encoder+decoder (for the L2 loss) —
    densifiers carry no regularizer, matching the reference's sparse
    Dense layers."""
    return l2_sum({"encoder": params["encoder"], "decoder": params["decoder"]})


def _orig_input_dim(params: dict, p: Parameters) -> int:
    """Recover the original (pre-sin/cos) input dim from the param shapes."""
    eff = params["encoder"][0]["kernel"].shape[0]
    return eff // 2 if p.periodicity < float("inf") else eff


class SequentialModel:
    """A self-contained model bundle: parameter pytree + the pure apply
    functions above, with keras-like conveniences (``model(x)``,
    ``model.encoder(x)``, ``model.decoder(z)``).

    The functional equivalent of the reference's ``SequentialModel``
    (``models/models.py:3099-3401``) for users building custom training
    loops; `EncoderMap` itself composes the pure functions directly.
    Mutating ``model.params`` (e.g. assigning the pytree an optimizer
    produced) is the intended update mechanism.
    """

    def __init__(self, input_shape: int, parameters: Parameters = None,
                 sparse: bool = False, seed: int = None) -> None:
        self.p = parameters if parameters is not None else Parameters()
        self.input_shape = int(input_shape)
        self.sparse = bool(sparse)
        if seed is None:
            seed = self.p.seed if self.p.seed is not None else 0
        self.params = init_params(
            jax.random.PRNGKey(seed), self.p, self.input_shape, sparse=sparse
        )

    def encoder(self, x) -> Array:
        x = jnp.asarray(x, jnp.float32)
        if self.sparse:
            x = densify(self.params, x)  # densify zero-fills NaNs itself
        return encode(self.params, self.p, x)

    def decoder(self, z) -> Array:
        return decode(self.params, self.p, jnp.asarray(z, jnp.float32))

    def __call__(self, x) -> Array:
        return self.decoder(self.encoder(x))


def gen_sequential_model(input_shape: int, parameters=None,
                         sparse: bool = False):
    """Model factory with the reference's signature
    (``models/models.py:256-288``): returns a :class:`SequentialModel`
    bundle for ``Parameters``; for ``ADCParameters`` the reference's
    ``ADCSequentialModel`` is subsumed by the functional ADC graph — use
    :func:`encodermap_tpu.models.adc.gen_functional_model`."""
    from ..parameters import ADCParameters

    if parameters is None:
        parameters = Parameters()
    if isinstance(parameters, ADCParameters):
        raise TypeError(
            "For ADCParameters use gen_functional_model (the reference's "
            "ADCSequentialModel is @testing-gated and subsumed by the "
            "functional graph)."
        )
    if not isinstance(parameters, Parameters):
        raise TypeError(
            f"parameters must be encodermap Parameters or ADCParameters, "
            f"got {type(parameters)}"
        )
    return SequentialModel(input_shape, parameters, sparse=sparse)
