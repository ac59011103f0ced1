# encodermap_tpu/models/adc.py
"""The AngleDihedralCartesian (ADC) model: internal-coordinate autoencoder
with in-graph backmapping.

Functional re-design of the reference's functional-API graph
(``/root/reference/encodermap/models/models.py:385-1060``, class at
``:2152-2523``). Input order is always (angles, central_dihedrals,
cartesians, distances[, side_dihedrals]); the forward pass produces
(out_angles, out_dihedrals[, out_side_dihedrals], back_cartesians,
inp_pairwise, out_pairwise) exactly like the reference so the loss assembly
(``models.py:2260-2459``) carries over one-to-one.

Architecture (non-sidechain-reconstruction path):

  per-group unit-circle projection (sin||cos)  [PeriodicInput, layers.py:175]
        -> concat -> encoder MLP -> latent
        -> decoder MLP -> split by group -> atan2   [PeriodicOutput, :1094]
  out_angles = batch-mean of input angles when not trained  [MeanAngles, :1129]
  BackMap: mean bond lengths -> chain_in_plane -> dihedrals+pi -> 3D scan
  PairwiseDistances of the CA slice of input and backmapped cartesians

Everything is a pure function of (params, inputs) with static Parameters.
"""

from __future__ import annotations

from math import pi
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..nn import ACTIVATIONS, l2_sum, mlp_apply, mlp_init
from ..ops.backmap import backmap as backmap_op
from ..ops.distances import pairwise_dist
from ..parameters import ADCParameters

__all__ = ["ADCShapes", "init_params", "encode", "decode", "forward",
           "cartesian_pwd_slice", "regularization_sum",
           "ADCFunctionalModel", "gen_functional_model",
           "multimer_lengths_list", "validate_multimer"]

Array = jax.Array


class ADCShapes(NamedTuple):
    """Static input dims: n angles, n dihedrals, n cartesian atoms,
    n distances, n side dihedrals (0 = no sidechain training)."""

    n_angles: int
    n_dihedrals: int
    n_cartesians: int
    n_distances: int
    n_side_dihedrals: int = 0

    @classmethod
    def from_data(cls, angles, dihedrals, cartesians, distances,
                  side_dihedrals=None) -> "ADCShapes":
        return cls(
            n_angles=angles.shape[1],
            n_dihedrals=dihedrals.shape[1],
            n_cartesians=cartesians.shape[1],
            n_distances=distances.shape[1],
            n_side_dihedrals=0 if side_dihedrals is None else side_dihedrals.shape[1],
        )


def multimer_lengths_list(p: ADCParameters) -> list[int]:
    """Normalize ``p.multimer_lengths`` to a per-protein residue-count list
    (empty when multimer training is off).

    Mirrors the reference's handling (``models/models.py:846-859``): a
    plain sequence is used as-is; a dict (topology class -> lengths) must
    hold identical length lists for every class. Only the
    ``"homogeneous_transformation"`` mode exists (the reference gates a
    second, tensorflow-graphics-based mode behind an import it never
    uses, ``models.py:564-575``)."""
    if p.multimer_training is None:
        return []
    if p.multimer_training != "homogeneous_transformation":
        raise ValueError(
            f"multimer_training must be None or 'homogeneous_transformation'"
            f", got {p.multimer_training!r}"
        )
    ml = p.multimer_lengths
    if ml is None:
        raise ValueError(
            "multimer_training='homogeneous_transformation' needs "
            "multimer_lengths (residues per protein, or a dict of "
            "topology class -> lengths)"
        )
    if isinstance(ml, dict):
        if p.multimer_topology_classes is not None:
            missing = [t for t in p.multimer_topology_classes if t not in ml]
            if missing:
                raise ValueError(
                    f"multimer_lengths has no entry for topology "
                    f"classes {missing}"
                )
        keys = list(ml)
        first = [int(x) for x in ml[keys[0]]]
        for k in keys[1:]:
            if [int(x) for x in ml[k]] != first:
                # the reference asserts element-wise equality across
                # topology classes (models.py:850-856)
                raise ValueError(
                    "multimer training with multiple topology classes "
                    "requires the same number of residues per protein in "
                    f"all classes; {keys[0]!r} has {first}, {k!r} has "
                    f"{[int(x) for x in ml[k]]}"
                )
        return first
    return [int(x) for x in ml]


def validate_multimer(
    p: ADCParameters, shapes: ADCShapes, sparse: bool = False
) -> list[int]:
    """Check the multimer configuration against the input shapes — the
    reference's ``_unpack_and_assert_input_shapes_multimers``
    (``models/models.py:1198-1260``). Returns the lengths list."""
    lengths = multimer_lengths_list(p)
    if not lengths:
        return lengths
    if not p.use_backbone_angles:
        raise ValueError(
            "multimer training requires use_backbone_angles=True "
            "(reference models.py:1211-1214)"
        )
    if not p.use_sidechains:
        raise ValueError(
            "multimer training requires use_sidechains=True "
            "(reference models.py:1215-1218)"
        )
    if p.reconstruct_sidechains:
        raise ValueError(
            "multimer training and reconstruct_sidechains are mutually "
            "exclusive (reference models.py:1108-1111)"
        )
    if sparse:
        raise ValueError(
            "multimer training does not support NaN-padded (sparse) CVs "
            "(reference models.py:1108-1111)"
        )
    n_at = sum(3 * L for L in lengths)
    n_d = sum(3 * L - 1 for L in lengths)
    n_a = sum(3 * L - 2 for L in lengths)
    n_di = sum(3 * L - 3 for L in lengths)
    if (shapes.n_cartesians, shapes.n_distances, shapes.n_angles,
            shapes.n_dihedrals) != (n_at, n_d, n_a, n_di):
        raise ValueError(
            f"multimer_lengths {lengths} expect per-protein concatenated "
            f"internal coordinates with {n_at} atoms / {n_d} distances / "
            f"{n_a} angles / {n_di} dihedrals; the data has "
            f"{shapes.n_cartesians} / {shapes.n_distances} / "
            f"{shapes.n_angles} / {shapes.n_dihedrals}"
        )
    return lengths


def _multimer_pairwise_dim(p: ADCParameters, shapes: ADCShapes) -> int:
    """Width of the flat pairwise-distance block the encoder additionally
    sees in multimer mode (``models.py:836-865``: relative protein
    placement is not recoverable from internal coordinates, so the
    encoder gets the ``cartesian_pwd_*``-sliced pair distances)."""
    n_sel = len(range(*_ca_slice_spec(p).indices(shapes.n_cartesians)))
    return n_sel * (n_sel - 1) // 2


def _encoder_in_dim(p: ADCParameters, shapes: ADCShapes) -> int:
    dim = 2 * shapes.n_dihedrals
    if p.use_backbone_angles:
        dim += 2 * shapes.n_angles
    if p.use_sidechains:
        dim += 2 * shapes.n_side_dihedrals
    if p.multimer_training is not None:
        dim += _multimer_pairwise_dim(p, shapes)
    return dim


def decoder_splits(p: ADCParameters, shapes: ADCShapes) -> list[int]:
    """Sizes of the decoder-output groups (in unit-circle space), following
    ``_concatenate_inputs`` (``models.py:1942-2025``)."""
    if not p.use_backbone_angles:
        if p.use_sidechains:
            # the reference raises for this combination too
            # (``models.py:2019-2025``) — silently dropping the sidechain
            # group would build a decoder narrower than the encoder input
            raise ValueError(
                "use_sidechains=True requires use_backbone_angles=True "
                "(the reference rejects this combination as well)"
            )
        return [2 * shapes.n_dihedrals]
    splits = [2 * shapes.n_angles, 2 * shapes.n_dihedrals]
    if p.use_sidechains:
        splits.append(2 * shapes.n_side_dihedrals)
    if p.multimer_training is not None:
        # the decoder's 4th group is the (n_proteins - 1) homogeneous
        # transforms, flattened — the reference swaps the encoder's
        # pairwise-distance split for this width (models.py:1487-1488)
        splits.append((len(multimer_lengths_list(p)) - 1) * 16)
    return splits


def init_params(
    key: jax.Array, p: ADCParameters, shapes: ADCShapes, dtype: Any = jnp.float32,
    sparse: bool = False,
) -> dict:
    """Initialize the ADC parameter pytree (+ densifiers in sparse mode)."""
    in_dim = _encoder_in_dim(p, shapes)
    out_dim = sum(decoder_splits(p, shapes))
    k_enc, k_dec, k_sp = jax.random.split(key, 3)
    enc_dims = [in_dim] + list(p.n_neurons)
    dec_dims = [p.n_neurons[-1]] + list(p.n_neurons[-2::-1]) + [out_dim]
    params = {
        "encoder": mlp_init(k_enc, enc_dims, dtype),
        "decoder": mlp_init(k_dec, dec_dims, dtype),
    }
    if sparse:
        # Per-input trainable densifiers, the masked-dense equivalent of the
        # reference's sparse-tensor Dense layers (``models.py:2667-2950``):
        # NaNs are zero-filled and passed through a square Dense layer whose
        # output covers the missing entries. With zero-filling, x @ W equals
        # the reference's sparse-dense matmul exactly.
        from ..nn import dense_init

        keys = jax.random.split(k_sp, 5)
        dens = {
            "dihedrals": dense_init(keys[0], shapes.n_dihedrals,
                                    shapes.n_dihedrals, dtype),
            "angles": dense_init(keys[1], shapes.n_angles, shapes.n_angles,
                                 dtype),
            "cartesians": dense_init(keys[2], shapes.n_cartesians * 3,
                                     shapes.n_cartesians * 3, dtype),
            "distances": dense_init(keys[3], shapes.n_distances,
                                    shapes.n_distances, dtype),
        }
        if shapes.n_side_dihedrals:
            dens["side_dihedrals"] = dense_init(
                keys[4], shapes.n_side_dihedrals, shapes.n_side_dihedrals,
                dtype,
            )
        params["densifiers"] = dens
    return params


def densify_inputs(params: dict, p: ADCParameters, inputs: tuple) -> tuple:
    """Fill NaNs with 0 and pass each input through its densifier Dense
    layer (identity when the model has no densifiers)."""
    if "densifiers" not in params:
        return tuple(jnp.nan_to_num(x) for x in inputs)
    from ..nn import dense_apply

    dens = params["densifiers"]
    angles, dihedrals, cartesians, distances = inputs[:4]
    B = angles.shape[0]

    def _dens(name, x):
        # encode() fills unused slots with (B, 0) placeholders — a
        # densifier must never touch those (its Dense expects the real
        # CV width and would fail the contraction)
        if x.size == 0:
            return x
        return dense_apply(dens[name], jnp.nan_to_num(x))

    cart = jnp.nan_to_num(cartesians).reshape(B, -1)
    out = [
        _dens("angles", angles),
        _dens("dihedrals", dihedrals),
        _dens("cartesians", cart).reshape(B, -1, 3)
        if cart.size else cartesians,
        _dens("distances", distances),
    ]
    if len(inputs) >= 5 and "side_dihedrals" in dens:
        out.append(_dens("side_dihedrals", inputs[4]))
    elif len(inputs) >= 5:
        out.append(jnp.nan_to_num(inputs[4]))
    return tuple(out)


def _encoder_activations(p: ADCParameters) -> list:
    return [ACTIVATIONS[a] for a in p.activation_functions[1:]]


def _decoder_activations(p: ADCParameters) -> list:
    # mirrored activations; the final entry ("") maps to a linear output
    return [ACTIVATIONS[a] for a in p.activation_functions[-2::-1]]


def _unit_circle(x: Array, periodicity: float) -> Array:
    """PeriodicInput: rescale to 2*pi, emit sin||cos (``layers.py:203-215``)."""
    if periodicity != 2 * pi:
        x = x / periodicity * 2 * pi
    return jnp.concatenate([jnp.sin(x), jnp.cos(x)], axis=1)


def _from_unit_circle(x: Array, periodicity: float) -> Array:
    """PeriodicOutput: atan2 halving, rescale back (``layers.py:1117-1126``)."""
    s, c = jnp.split(x, 2, axis=1)
    out = jnp.arctan2(s, c)
    if periodicity != 2 * pi:
        out = out / (2 * pi) * periodicity
    return out


def encode(params: dict, p: ADCParameters, inputs: tuple) -> Array:
    """Encoder: unit-circle projections of the trained groups, concatenated
    in (angles, dihedrals, side_dihedrals) order, through the MLP."""
    angles, dihedrals = inputs[0], inputs[1]
    side = inputs[4] if len(inputs) >= 5 else None
    groups = []
    if p.use_backbone_angles:
        groups.append(_unit_circle(angles, p.periodicity))
    groups.append(_unit_circle(dihedrals, p.periodicity))
    if p.use_sidechains:
        assert side is not None, "use_sidechains=True requires side_dihedrals input"
        groups.append(_unit_circle(side, p.periodicity))
    if p.multimer_training is not None:
        # relative protein placement is invisible to internal coordinates;
        # the encoder additionally sees the (rotation/translation
        # invariant) pairwise distances of the input cartesians
        # (models.py:836-865 + encoder_input_list.append at :895)
        groups.append(cartesian_pwd_slice(p, inputs[2]))
    x = jnp.concatenate(groups, axis=1) if len(groups) > 1 else groups[0]
    compute_dtype = jnp.bfloat16 if p.compute_dtype == "bfloat16" else None
    return mlp_apply(params["encoder"], x, _encoder_activations(p), compute_dtype)


def decode(
    params: dict, p: ADCParameters, latent: Array, shapes: ADCShapes
) -> tuple:
    """Decoder MLP + per-group PeriodicOutput. Returns (angles_or_None,
    dihedrals, side_dihedrals_or_None); in multimer mode a 4th element —
    the ``(B, n_proteins - 1, 4, 4)`` homogeneous transforms (raw linear
    outputs, not unit-circle; reference ``models.py:1523-1532``)."""
    compute_dtype = jnp.bfloat16 if p.compute_dtype == "bfloat16" else None
    out = mlp_apply(params["decoder"], latent, _decoder_activations(p), compute_dtype)
    splits = decoder_splits(p, shapes)
    if not p.use_backbone_angles:
        return None, _from_unit_circle(out, p.periodicity), None
    offsets = np.cumsum(splits)[:-1].tolist()
    parts = jnp.split(out, offsets, axis=1)
    out_angles = _from_unit_circle(parts[0], p.periodicity)
    out_dihedrals = _from_unit_circle(parts[1], p.periodicity)
    out_side = (
        _from_unit_circle(parts[2], p.periodicity) if p.use_sidechains else None
    )
    if p.multimer_training is not None:
        n_proteins = len(multimer_lengths_list(p))
        matrices = parts[3].reshape(latent.shape[0], n_proteins - 1, 4, 4)
        return out_angles, out_dihedrals, out_side, matrices
    return out_angles, out_dihedrals, out_side


def _ca_slice_spec(p: ADCParameters) -> slice:
    """The atom slice used for the pairwise-distance costs.

    Reference-exact semantics (``models/layers.py:1252-1266`` slices with
    the raw parameter values): ``None`` passes through, so the
    out-of-the-box default (all three ``cartesian_pwd_*`` = None) uses
    EVERY central-chain atom. Selecting CA atoms of an N-CA-C backbone
    takes ``cartesian_pwd_start=1, cartesian_pwd_step=3``, exactly as the
    reference's own examples set it
    (``examples/dihedral_to_cartesian_diubi.py:54-57``)."""
    return slice(p.cartesian_pwd_start, p.cartesian_pwd_stop,
                 p.cartesian_pwd_step)


def _ca_slice(p: ADCParameters, cartesians: Array) -> Array:
    return cartesians[:, _ca_slice_spec(p)]


def cartesian_pwd_slice(p: ADCParameters, cartesians: Array) -> Array:
    """``cartesian_pwd_*`` atom slice -> flat upper-triangle pairwise dists
    (``models/layers.py:1252-1266``; all atoms by default, CAs with
    ``start=1, step=3``)."""
    return pairwise_dist(_ca_slice(p, cartesians), flat=True)


def cartesian_pwd_matrix(p: ADCParameters, cartesians: Array) -> Array:
    """Same atom slice as :func:`cartesian_pwd_slice` but returning the FULL
    ``(B, n, n)`` distance matrix. Used for the cartesian loss on the
    *backmapped* coordinates: the dense matrix's backward is a reduction,
    whereas the flat triu gather's backward is an index scatter that costs
    ~2 ms at 158 residues on TPU (the forward values are identical pairs)."""
    return pairwise_dist(_ca_slice(p, cartesians))


def forward(params: dict, p: ADCParameters, inputs: tuple, shapes: ADCShapes
            ) -> tuple:
    """Full ADC forward pass.

    Args:
        inputs: (angles, dihedrals, cartesians, distances[, side_dihedrals]).

    Returns:
        (out_angles, out_dihedrals, out_side_dihedrals_or_None,
         back_cartesians, inp_pairwise, out_pairwise, latent)

    Note:
        ``out_pairwise`` (flat upper-triangle pairs of the backmapped CAs)
        mirrors the reference model's output contract
        (``models.py:385-1060``); the training losses differentiate
        through the dense-matrix form instead (``cartesian_loss_matrix``),
        so inside the jitted train step this output is dead code XLA
        eliminates — it is kept for API/inspection parity.
    """
    angles, dihedrals, cartesians, distances = inputs[:4]

    latent = encode(params, p, inputs)
    decoded = decode(params, p, latent, shapes)
    out_angles, out_dihedrals, out_side = decoded[:3]
    if not p.use_backbone_angles:
        # MeanAngles: tile the batch mean (``layers.py:1152-1160``)
        mean = jnp.mean(angles, axis=0, keepdims=True)
        out_angles = jnp.broadcast_to(mean, angles.shape)

    if p.multimer_training is not None:
        # per-protein chains rebuilt independently, proteins 2..N placed
        # by the decoder's homogeneous transforms (the reference's
        # BackMapLayerTransformations branch, models.py:946-953)
        from ..ops.backmap import backmap_multimer

        back_cartesians = backmap_multimer(
            multimer_lengths_list(p), distances, out_angles, out_dihedrals,
            decoded[3],
        )
    else:
        back_cartesians = backmap_op(distances, out_angles, out_dihedrals)
    inp_pair = cartesian_pwd_slice(p, cartesians)
    out_pair = cartesian_pwd_slice(p, back_cartesians)
    return (
        out_angles,
        out_dihedrals,
        out_side,
        back_cartesians,
        inp_pair,
        out_pair,
        latent,
    )


def regularization_sum(params: dict) -> Array:
    """L2 over encoder+decoder kernels only — densifiers carry no
    regularizer, matching the reference's sparse Dense layers."""
    return l2_sum({"encoder": params["encoder"], "decoder": params["decoder"]})


# ----------------------------------------------------------------------------
# sidechain-reconstruction variant (reference: reconstruct_sidechains=True,
# 7 inputs, 4 decoder groups, BackMapLayerWithSidechains)
# ----------------------------------------------------------------------------


class ADCSidechainShapes(NamedTuple):
    """Static input dims for the 7-input sidechain-reconstruction model."""

    n_central_angles: int
    n_central_dihedrals: int
    n_all_cartesians: int
    n_central_distances: int
    n_side_angles: int
    n_side_dihedrals: int
    n_side_distances: int

    @classmethod
    def from_data(cls, ca, cdi, ac, cd, sa, sdi, sd) -> "ADCSidechainShapes":
        return cls(ca.shape[1], cdi.shape[1], ac.shape[1], cd.shape[1],
                   sa.shape[1], sdi.shape[1], sd.shape[1])


def sidechain_decoder_splits(shapes: ADCSidechainShapes) -> list[int]:
    """Groups: central angles, central dihedrals, side angles, side
    dihedrals (reference ``_concatenate_inputs_reconstruct_sidechains``)."""
    return [
        2 * shapes.n_central_angles,
        2 * shapes.n_central_dihedrals,
        2 * shapes.n_side_angles,
        2 * shapes.n_side_dihedrals,
    ]


def init_sidechain_params(
    key: jax.Array, p: ADCParameters, shapes: ADCSidechainShapes,
    dtype: Any = jnp.float32,
) -> dict:
    """Initialize the sidechain-reconstruction parameter pytree."""
    in_dim = sum(sidechain_decoder_splits(shapes))
    out_dim = in_dim
    k_enc, k_dec = jax.random.split(key)
    enc_dims = [in_dim] + list(p.n_neurons)
    dec_dims = [p.n_neurons[-1]] + list(p.n_neurons[-2::-1]) + [out_dim]
    return {
        "encoder": mlp_init(k_enc, enc_dims, dtype),
        "decoder": mlp_init(k_dec, dec_dims, dtype),
    }


def encode_sidechains(params: dict, p: ADCParameters, inputs: tuple) -> Array:
    """Encoder over (central_angles, central_dihedrals, side_angles,
    side_dihedrals) unit-circle projections."""
    ca, cdi = inputs[0], inputs[1]
    sa, sdi = inputs[4], inputs[5]
    x = jnp.concatenate(
        [
            _unit_circle(ca, p.periodicity),
            _unit_circle(cdi, p.periodicity),
            _unit_circle(sa, p.periodicity),
            _unit_circle(sdi, p.periodicity),
        ],
        axis=1,
    )
    compute_dtype = jnp.bfloat16 if p.compute_dtype == "bfloat16" else None
    return mlp_apply(params["encoder"], x, _encoder_activations(p),
                     compute_dtype)


def decode_sidechains(
    params: dict, p: ADCParameters, latent: Array,
    shapes: ADCSidechainShapes,
) -> tuple:
    """Decoder -> (central_angles, central_dihedrals, side_angles,
    side_dihedrals)."""
    compute_dtype = jnp.bfloat16 if p.compute_dtype == "bfloat16" else None
    out = mlp_apply(params["decoder"], latent, _decoder_activations(p),
                    compute_dtype)
    splits = sidechain_decoder_splits(shapes)
    parts = jnp.split(out, np.cumsum(splits)[:-1].tolist(), axis=1)
    return tuple(_from_unit_circle(x, p.periodicity) for x in parts)


def sidechain_pwd_indices(p: ADCParameters, spec) -> np.ndarray:
    """Atoms for the pairwise-distance costs in reconstruct mode: the CA
    slice of the backbone plus the last atom of each sidechain branch.

    DELIBERATE DIVERGENCE from the reference walk it replaces
    (``PairwiseDistances.__init__``, ``layers.py:1183-1208``): the
    reference advances ``atom = n_res*3 + 1`` by ``+= n_sc`` per branch,
    which lands ``branch_rank - 2`` atoms off the true branch end (and
    indexes past the array for single-branch topologies). This
    implementation realizes the documented intent — each branch's LAST
    atom — like ``backmap_multimer`` does for its broken reference.
    Unlike the plain-backbone costs, ``cartesian_pwd_*=None`` here keeps
    the CA default (1::3): the reference's reconstruct mode hardcodes the
    CA+branch-end selection regardless of those parameters."""
    from ..ops.backmap_sidechains import _side_atoms_per_res

    n_backbone = spec.n_residues * 3
    start = p.cartesian_pwd_start if p.cartesian_pwd_start is not None else 1
    step = p.cartesian_pwd_step if p.cartesian_pwd_step is not None else 3
    idx = list(np.arange(n_backbone)[start : p.cartesian_pwd_stop : step])
    lens = _side_atoms_per_res(spec)
    # branch-end atoms: walk the per-residue branch column layout
    col = n_backbone
    for r in range(1, spec.n_residues + 1):
        # branch ATOMS of residue r (_side_atoms_per_res returns v+1 for
        # v dihedrals; 0 when the residue has none)
        n_sc = int(lens[r - 1])
        if n_sc == 0:
            continue
        idx.append(col + n_sc - 1)
        col += n_sc
    return np.asarray(idx, np.int64)





def forward_sidechains(
    params: dict, p: ADCParameters, inputs: tuple,
    shapes: ADCSidechainShapes, spec,
) -> tuple:
    """Full forward for the sidechain-reconstruction model.

    Args:
        inputs: (central_angles, central_dihedrals, all_cartesians,
                 central_distances, side_angles, side_dihedrals,
                 side_distances).

    Returns:
        (out_central_angles, out_central_dihedrals, out_side_angles,
         out_side_dihedrals, back_cartesians, inp_pair, out_pair, latent)
    """
    from ..ops.backmap_sidechains import backmap_sidechains_fast

    (central_angles, central_dihedrals, all_cartesians, central_distances,
     side_angles, side_dihedrals, side_distances) = inputs

    latent = encode_sidechains(params, p, inputs)
    out_ca, out_cdi, out_sa, out_sdi = decode_sidechains(
        params, p, latent, shapes
    )
    back = backmap_sidechains_fast(
        spec, central_distances, out_ca, out_cdi,
        side_distances, out_sa, out_sdi,
    )
    pwd_idx = sidechain_pwd_indices(p, spec)
    inp_pair = pairwise_dist(all_cartesians[:, pwd_idx], flat=True)
    out_pair = pairwise_dist(back[:, pwd_idx], flat=True)
    return out_ca, out_cdi, out_sa, out_sdi, back, inp_pair, out_pair, latent


class ADCFunctionalModel:
    """Self-contained ADC model bundle: parameter pytree + the pure apply
    functions above, with keras-like conveniences —
    ``model(inputs)`` runs the full forward pass (same output tuple as
    :func:`forward`), ``model.encoder(inputs)`` / ``model.decoder(latent)``
    run the halves.

    The functional equivalent of the reference's ``ADCFunctionalModel``
    (``models/models.py:2152-2523``) for custom training loops;
    `AngleDihedralCartesianEncoderMap` composes the pure functions
    directly. ``inputs`` is the usual tuple
    ``(angles, dihedrals, cartesians, distances[, side_dihedrals])``.
    """

    def __init__(self, input_shapes, parameters: ADCParameters = None,
                 sparse: bool = False, seed: int = None) -> None:
        self.p = parameters if parameters is not None else ADCParameters()
        a, d, c, dist = input_shapes[:4]
        side = input_shapes[4] if len(input_shapes) >= 5 else None
        self.shapes = ADCShapes(
            n_angles=int(np.atleast_1d(a)[-1]),
            n_dihedrals=int(np.atleast_1d(d)[-1]),
            # cartesians may be given as (n_atoms, 3) or n_atoms
            n_cartesians=int(np.atleast_1d(c)[0]),
            n_distances=int(np.atleast_1d(dist)[-1]),
            n_side_dihedrals=(
                0 if side is None else int(np.atleast_1d(side)[-1])
            ),
        )
        self.sparse = bool(sparse)
        # surface invalid multimer configs as the validator's clear
        # ValueError here, not as an opaque parts[3] IndexError inside
        # decode() (the trainer validates too, adc_autoencoder.py; direct
        # gen_functional_model users must get the same check)
        validate_multimer(self.p, self.shapes, sparse=self.sparse)
        if seed is None:
            seed = self.p.seed if self.p.seed is not None else 0
        self.params = init_params(
            jax.random.PRNGKey(seed), self.p, self.shapes, sparse=sparse
        )

    def _prep(self, inputs: tuple) -> tuple:
        inputs = tuple(jnp.asarray(x, jnp.float32) for x in inputs)
        if self.sparse:
            inputs = densify_inputs(self.params, self.p, inputs)
        return inputs

    def encoder(self, inputs: tuple) -> Array:
        return encode(self.params, self.p, self._prep(inputs))

    def decoder(self, latent) -> tuple:
        return decode(self.params, self.p, jnp.asarray(latent, jnp.float32),
                      self.shapes)

    def __call__(self, inputs: tuple) -> tuple:
        return forward(self.params, self.p, self._prep(inputs), self.shapes)


def gen_functional_model(input_shapes, parameters: ADCParameters = None,
                         sparse: bool = False, seed: int = None
                         ) -> "ADCFunctionalModel":
    """Model factory with the reference's core signature
    (``models/models.py:385-1060``): ``input_shapes`` is the per-input
    shape tuple ``((n_angles,), (n_dihedrals,), (n_cartesians, 3),
    (n_distances,)[, (n_side_dihedrals,)])``. The reference's extra
    keras-specific kwargs (kernel/bias initializer literals,
    ``write_summary``, ``use_experimental_model``) have no counterpart —
    initialization is a seeded PRNG pytree and summaries live in the
    training loop."""
    return ADCFunctionalModel(input_shapes, parameters, sparse=sparse,
                              seed=seed)
