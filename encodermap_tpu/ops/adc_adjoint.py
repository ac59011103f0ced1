# encodermap_tpu/ops/adc_adjoint.py
"""Hand-derived analytic adjoint of the full ADC training step.

``hand_adc_step`` is the complete forward + closed-form backward of the
7-loss ADC training step in plain JAX — encoder/decoder MLP with
unit-circle periodicity, the batch-mean-bond planar chain, the two-way
quaternion dihedral curl (using the analytic one-way adjoint of
``ops/backmap.py``), CA pairwise distances, and the loss stack of
``train/adc_autoencoder.py::_loss_terms`` (reference
``models.py:2260-2459``).

Every pullback is closed-form:

* periodic mean-abs losses: the min-image branch flips the sign of the
  subgradient past P/2;
* atan2 fold-out: d atan2(s, c) = (c, -s) / (s^2 + c^2);
* cartesian loss -> CA positions: signed unit pair vectors scattered to
  the two endpoints;
* dihedral curl: the suffix-sum adjoint of ``ops/backmap._one_way_bwd``,
  applied per half-chain with the reversal bookkeeping of
  ``split_and_reverse_*``;
* chain-in-plane: three more suffix sums through the alternating-sign
  heading cumsum.

Role: machine-precision gradient oracle for the production autodiff path
(``tests/test_adc_adjoint.py`` checks it against float64 autodiff) and the
ground truth that validated the (since removed) fused Pallas ADC kernel.
That kernel measured only ~15% over XLA on v5e and was deleted in favor of
the XLA path; the portable Mosaic lessons live in
``docs/mosaic_findings.md``.
"""

from __future__ import annotations

import functools
from math import pi
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["hand_adc_step"]

_dot = functools.partial(
    jax.lax.dot_general, precision=jax.lax.Precision.HIGHEST
)


def _mm(a, b):
    return _dot(a, b, (((1,), (0,)), ((), ())))


def _mm_t1(a, b):
    return _dot(a, b, (((0,), (0,)), ((), ())))


def _mm_t2(a, b):
    return _dot(a, b, (((1,), (1,)), ((), ())))


# --------------------------------------------------------------------------
# building blocks shared with ops/backmap.py: the SoA quaternion primitives
# are imported (one source of truth); the *_fwd/*_bwd functions below are
# deliberately DIFFERENT formulations from backmap's custom_vjp pair — they
# keep every intermediate so the loss pullbacks compose in closed form —
# and their agreement with the production op is what the tests assert.
# --------------------------------------------------------------------------

from .backmap import (  # noqa: E402
    _quat_compose as _quat_mul,
    _quat_conj,
    _quat_rotate as _quat_rot,
)


def _rev_cumsum(x, axis=1):
    return jnp.flip(jnp.cumsum(jnp.flip(x, axis), axis), axis)


def _one_way_fwd(d, x):
    """ops/backmap._one_way_impl in local form. x: (B, n+3, 3)."""
    u = x[:, 2:-1, :] - x[:, 1:-2, :]
    ulen = jnp.sqrt(jnp.sum(jnp.square(u), axis=-1, keepdims=True))
    axis = u / ulen
    half = 0.5 * d
    s = jnp.sin(half)
    q = (jnp.cos(half), s * axis[..., 0], s * axis[..., 1], s * axis[..., 2])
    q_scan = jax.lax.associative_scan(_quat_mul, q, axis=1)
    q_ext = tuple(jnp.concatenate([c, c[:, -1:]], axis=1) for c in q_scan)
    bonds = x[:, 2:, :] - x[:, 1:-1, :]
    r = jnp.stack(
        _quat_rot(q_ext, (bonds[..., 0], bonds[..., 1], bonds[..., 2])),
        axis=-1,
    )
    out = jnp.concatenate(
        [x[:, :2, :], x[:, 1:2, :] + jnp.cumsum(r, axis=1)], axis=1
    )
    return out, (q_scan, q_ext, r, axis, ulen, d)


def _one_way_bwd(res, g):
    """The analytic adjoint (same math as ops/backmap._one_way_bwd)."""
    q_scan, q_ext, r, axis, ulen, d = res
    B, n = d.shape
    G = _rev_cumsum(g[:, 2:, :])
    q_conj = _quat_conj(q_ext)
    b_bar = jnp.stack(
        _quat_rot(q_conj, (G[..., 0], G[..., 1], G[..., 2])), axis=-1
    )
    t = jnp.cross(r, G)
    T = _rev_cumsum(t)
    a_fin = r[:, :n, :] / ulen
    d_bar = jnp.sum(a_fin * T[:, :n, :], axis=-1)

    outer = r[..., :, None] * G[..., None, :]
    M = _rev_cumsum(outer)[:, :n]
    q_i = tuple(c[:, :n] for c in q_scan)
    ident = lambda c, v: jnp.concatenate(
        [jnp.full((B, 1), v, c.dtype), c[:, : n - 1]], axis=1
    )
    q_im1 = (ident(q_scan[0], 1.0),) + tuple(ident(c, 0.0) for c in q_scan[1:])

    def rot_cols(q, Mm):
        cols = [
            _quat_rot(q, (Mm[..., 0, c], Mm[..., 1, c], Mm[..., 2, c]))
            for c in range(3)
        ]
        return jnp.stack(
            [jnp.stack([cols[c][rr] for c in range(3)], axis=-1)
             for rr in range(3)],
            axis=-2,
        )

    halfN = rot_cols(_quat_conj(q_i), M)
    N = jnp.swapaxes(
        rot_cols(_quat_conj(q_im1), jnp.swapaxes(halfN, -1, -2)), -1, -2
    )
    vee = jnp.stack(
        [N[..., 1, 2] - N[..., 2, 1], N[..., 2, 0] - N[..., 0, 2],
         N[..., 0, 1] - N[..., 1, 0]], axis=-1,
    )
    sin_d = jnp.sin(d)[..., None]
    cos_d = jnp.cos(d)[..., None]
    Na = jnp.einsum("...ij,...j->...i", N, axis,
                    precision=jax.lax.Precision.HIGHEST)
    NTa = jnp.einsum("...ji,...j->...i", N, axis,
                     precision=jax.lax.Precision.HIGHEST)
    a_bar = sin_d * vee + (1.0 - cos_d) * (Na + NTa)
    u_bar = (a_bar - axis * jnp.sum(axis * a_bar, axis=-1, keepdims=True)) / ulen

    x_bar = jnp.zeros((B, n + 3, 3), g.dtype)
    x_bar = x_bar.at[:, 0].set(g[:, 0])
    x_bar = x_bar.at[:, 1].set(g[:, 1] + jnp.sum(g[:, 2:], axis=1))
    x_bar = x_bar.at[:, 2:].add(b_bar)
    x_bar = x_bar.at[:, 1:-1].add(-b_bar)
    x_bar = x_bar.at[:, 2:-1].add(u_bar)
    x_bar = x_bar.at[:, 1:-2].add(-u_bar)
    return d_bar, x_bar


def _chain_in_plane_fwd(lengths, angles):
    """ops/backmap.chain_in_plane with the intermediates kept."""
    n_bonds = lengths.shape[-1]
    n_angles = angles.shape[-1]
    dtype = jnp.result_type(lengths, angles)
    signs_a = jnp.asarray(
        np.where(np.arange(n_angles) % 2 == 0, -1.0, 1.0), dtype
    )
    s = signs_a[None, :] * (pi - angles)
    csum = jnp.cumsum(s, axis=-1)
    sign_i = jnp.asarray(
        np.where(np.arange(1, n_bonds) % 2 == 0, 1.0, -1.0), dtype
    )
    heading = jnp.concatenate(
        [jnp.zeros((angles.shape[0], 1), dtype), sign_i[None, :] * csum],
        axis=-1,
    )
    y_sign = jnp.asarray(
        np.where(np.arange(n_bonds) % 2 == 0, 1.0, -1.0), dtype
    )
    dx = lengths * jnp.cos(heading)
    dy = lengths * jnp.sin(heading) * y_sign[None, :]
    zeros = jnp.zeros((dx.shape[0], 1), dtype)
    xs = jnp.concatenate([zeros, jnp.cumsum(dx, axis=-1)], axis=-1)
    ys = jnp.concatenate([zeros, jnp.cumsum(dy, axis=-1)], axis=-1)
    chain = jnp.stack([xs, ys, jnp.zeros_like(xs)], axis=-1)
    return chain, (lengths, heading, signs_a, sign_i, y_sign)


def _chain_in_plane_bwd(res, g):
    """Angle pullback of the planar chain (lengths carry no parameter
    gradients — they come from the input distances)."""
    lengths, heading, signs_a, sign_i, y_sign = res
    # positions are prefix sums of the bond steps
    dxb = _rev_cumsum(g[:, 1:, 0])
    dyb = _rev_cumsum(g[:, 1:, 1])
    h_bar = lengths * (
        -jnp.sin(heading) * dxb + jnp.cos(heading) * y_sign[None, :] * dyb
    )
    # heading_i = sign_i * csum_{i-1} for i >= 1
    c_bar = sign_i[None, :] * h_bar[:, 1:]
    s_bar = _rev_cumsum(c_bar)
    return -signs_a[None, :] * s_bar


def _backmap_fwd(distances, angles, dihedrals):
    # raw-distance mean, matching ops/backmap.backmap (the reference's
    # negative-distance guard is dead code; see that docstring)
    mean_lengths = jnp.broadcast_to(
        jnp.mean(distances, axis=0, keepdims=True),
        (angles.shape[0], distances.shape[1]),
    )
    chain, cres = _chain_in_plane_fwd(mean_lengths, angles)
    d = dihedrals + pi
    n = d.shape[1]
    middle = n // 2
    if n % 2 == 0:
        d_left, d_right = d[:, middle - 1::-1], d[:, middle:]
    else:
        d_left, d_right = d[:, middle::-1], d[:, middle + 1:]
    split = chain.shape[1] // 2
    c_left = chain[:, split + 1::-1]
    c_right = chain[:, split - 1:]
    new_left, res_l = _one_way_fwd(d_left, c_left)
    new_right, res_r = _one_way_fwd(d_right, c_right)
    out = jnp.concatenate([new_left[:, ::-1], new_right[:, 3:]], axis=1)
    return out, (cres, res_l, res_r, split, middle, n)


def _backmap_bwd(res, g):
    cres, res_l, res_r, split, middle, n = res
    n_atoms = g.shape[1]
    g_left = g[:, : split + 2][:, ::-1]
    g_right = jnp.concatenate(
        [jnp.zeros((g.shape[0], 3, 3), g.dtype), g[:, split + 2:]], axis=1
    )
    dl_bar, xl_bar = _one_way_bwd(res_l, g_left)
    dr_bar, xr_bar = _one_way_bwd(res_r, g_right)
    chain_bar = jnp.zeros((g.shape[0], n_atoms, 3), g.dtype)
    chain_bar = chain_bar.at[:, : split + 2].add(xl_bar[:, ::-1])
    chain_bar = chain_bar.at[:, split - 1:].add(xr_bar)
    ang_bar = _chain_in_plane_bwd(cres, chain_bar)
    d_bar = jnp.zeros((g.shape[0], n), g.dtype)
    if n % 2 == 0:
        d_bar = d_bar.at[:, middle - 1::-1].set(dl_bar)
        d_bar = d_bar.at[:, middle:].set(dr_bar)
    else:
        d_bar = d_bar.at[:, middle::-1].set(dl_bar)
        d_bar = d_bar.at[:, middle + 1:].set(dr_bar)
    return d_bar, ang_bar


# --------------------------------------------------------------------------
# periodic helpers
# --------------------------------------------------------------------------


def _periodic_mean_abs_and_grad(y_true, y_pred, periodicity, scale):
    """cost = scale * mean(min(|d|, P - |d|)), d = y_pred - y_true, and its
    gradient w.r.t. y_pred."""
    d = jnp.abs(y_pred - y_true)
    if periodicity == float("inf"):
        md = d
        flip = jnp.ones_like(d)
    else:
        flip = jnp.where(d <= periodicity - d, 1.0, -1.0)
        md = jnp.minimum(d, periodicity - d)
    cost = scale * jnp.mean(md)
    g = (scale / d.size) * flip * jnp.sign(y_pred - y_true)
    return cost, g


# single-sourced with the fused kernel (ops/distances.py) so oracle and
# kernel can never drift again (wave 34)
from .distances import dsig_over_r as _dsig_over_r, sig_value as _sig


def _batch_pairdist2_gram(x):
    """(B, B) squared distances over batch rows of features (Gram form —
    one MXU matmul; feature dims here are large enough to pay off)."""
    sq = jnp.sum(jnp.square(x), axis=1)
    dot = _mm_t2(x, x)
    d2 = sq[:, None] - 2.0 * dot + sq[None, :]
    return jnp.maximum(d2, 0.0)


def _batch_pairdist2_periodic(x, periodicity):
    """(B, B) squared MIN-IMAGE distances over batch rows of angular
    features — the oracle twin of ``ops.distances.pairwise_dist_periodic``
    (O(B^2 F) difference tensor; the oracle favors transparency over
    speed)."""
    d = jnp.abs(x[:, None, :] - x[None, :, :])
    d = jnp.minimum(d, periodicity - d)
    return jnp.sum(d * d, axis=-1)


def _sigmoid_loss_and_latgrad(feats, lat, params, scale,
                              periodicity=float("inf")):
    """cartesian_distance-style loss: sigmoid(batch-pairdist(feats)) vs
    sigmoid(batch-pairdist(lat)); returns (loss, d loss/d lat). The
    high-D side honors ``periodicity`` (the production distance cost is
    periodic over angular inputs, ``losses.distance_loss``); gradients
    only flow to ``lat``, so the high-D leg needs no pullback."""
    sig_h, a_h, b_h, sig_l, a_l, b_l = params
    B = feats.shape[0]
    if periodicity == float("inf"):
        dh2 = _batch_pairdist2_gram(feats)
    else:
        dh2 = _batch_pairdist2_periodic(feats, periodicity)
    # zero the diagonal without scatter (iota mask; Mosaic-safe)
    notdiag = (
        jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
        != jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    ).astype(dh2.dtype)
    dh2 = dh2 * notdiag
    mask_h = (dh2 == 0.0).astype(feats.dtype)
    dh = jnp.sqrt(dh2 + mask_h * 1e-16) * (1.0 - mask_h)
    dl2 = jnp.zeros((B, B), lat.dtype)
    for k in range(lat.shape[1]):
        col = lat[:, k]
        diff = col[:, None] - col[None, :]
        dl2 = dl2 + diff * diff
    mask_l = (dl2 == 0.0).astype(lat.dtype)
    dl = jnp.sqrt(dl2 + mask_l * 1e-16) * (1.0 - mask_l)
    sdiff = _sig(dl, sig_l, a_l, b_l) - _sig(dh, sig_h, a_h, b_h)
    loss = scale * jnp.mean(jnp.square(sdiff))
    M = (4.0 * scale / (B * B)) * sdiff * _dsig_over_r(dl2, dl, sig_l, a_l, b_l)
    row = jnp.sum(M, axis=1)
    g_lat = row[:, None] * lat - _mm(M, lat)
    return loss, g_lat


# --------------------------------------------------------------------------
# the full step
# --------------------------------------------------------------------------


def hand_adc_step(
    enc_w, enc_b, dec_w, dec_b,
    angles, dihedrals, ca_xyz, distances, side,
    step,
    *,
    hyper: dict,
):
    """Forward + hand-derived parameter gradients of the ADC train step.

    Args:
        enc_w/enc_b/dec_w/dec_b: MLP tensors (biases (d,)).
        angles/dihedrals/distances/side: the CV batch; ``side`` may be None.
        ca_xyz: (B, n_ca, 3) input CA positions (pre-sliced from the
            cartesians — only the pairwise-cost atoms are needed).
        step: scalar global step (for the soft-start cartesian scale).
        hyper: dict with periodicity, loss scales/references,
            cartesian_dist_sig_parameters, soft-start (a, b) or None,
            learning-rate-independent entries only.

    Returns:
        (g_enc_w, g_enc_b, g_dec_w, g_dec_b, metrics_dict)
    """
    h = hyper
    P = h["periodicity"]
    B = angles.shape[0]

    # ---------------- encoder
    def unit_circle(x):
        xs = x if P == 2 * pi else x / P * 2 * pi
        return jnp.concatenate([jnp.sin(xs), jnp.cos(xs)], axis=1)

    groups = [unit_circle(angles), unit_circle(dihedrals)]
    raw_groups = [angles, dihedrals]
    if side is not None:
        groups.append(unit_circle(side))
        raw_groups.append(side)
    x0 = jnp.concatenate(groups, axis=1)

    acts_e = [x0]
    n_enc = len(enc_w)
    for i in range(n_enc):
        z = _mm(acts_e[-1], enc_w[i]) + enc_b[i]
        acts_e.append(jnp.tanh(z) if i < n_enc - 1 else z)
    lat = acts_e[-1]

    acts_d = [lat]
    n_dec = len(dec_w)
    for i in range(n_dec):
        z = _mm(acts_d[-1], dec_w[i]) + dec_b[i]
        acts_d.append(jnp.tanh(z) if i < n_dec - 1 else z)
    dec_out = acts_d[-1]

    # ---------------- periodic fold-out per group
    nA, nD = angles.shape[1], dihedrals.shape[1]
    nS = side.shape[1] if side is not None else 0
    sizes = [2 * nA, 2 * nD] + ([2 * nS] if side is not None else [])
    offs = np.cumsum([0] + sizes)

    outs = []
    trig = []  # (s, c, norm2) per group for the backward
    for k, nk in enumerate((nA, nD) + ((nS,) if side is not None else ())):
        blk = dec_out[:, offs[k]:offs[k + 1]]
        s_, c_ = blk[:, :nk], blk[:, nk:]
        o = jnp.arctan2(s_, c_)
        if P != 2 * pi:
            o = o / (2 * pi) * P
        outs.append(o)
        trig.append((s_, c_, s_ * s_ + c_ * c_))
    out_angles, out_dihedrals = outs[0], outs[1]
    out_side = outs[2] if side is not None else None

    # ---------------- geometry
    back, bres = _backmap_fwd(distances, out_angles, out_dihedrals)
    ca_back = back[:, h["ca_start"]::h["ca_step"], :]
    iu = h["pair_iu"]
    def flat_pairs(pos):
        diff = pos[:, iu[0], :] - pos[:, iu[1], :]
        d2 = jnp.sum(jnp.square(diff), axis=-1)
        mask = (d2 == 0.0).astype(pos.dtype)
        return jnp.sqrt(d2 + mask * 1e-16) * (1.0 - mask), diff
    inp_pair, _ = flat_pairs(ca_xyz)
    out_pair, out_diff = flat_pairs(ca_back)

    # ---------------- losses
    metrics = {}
    dih_cost, g_out_dih = _periodic_mean_abs_and_grad(
        dihedrals, out_dihedrals, P,
        h["dihedral_cost_scale"] / h["dihedral_cost_reference"],
    )
    ang_cost, g_out_ang = _periodic_mean_abs_and_grad(
        angles, out_angles, P,
        h["angle_cost_scale"] / h["angle_cost_reference"],
    )
    metrics["dihedral_loss"] = dih_cost
    metrics["angle_loss"] = ang_cost
    if side is not None:
        side_cost, g_out_side = _periodic_mean_abs_and_grad(
            side, out_side, P,
            h["side_dihedral_cost_scale"] / h["side_dihedral_cost_reference"],
        )
        metrics["side_dihedral_loss"] = side_cost

    # soft-start cartesian scale
    if h["soft_start"] is None:
        cscale = jnp.asarray(h["cartesian_cost_scale"], jnp.float32)
    else:
        a, b = h["soft_start"]
        if a == b:
            # instant switch-on, like losses.soft_start_scale: /0 would
            # NaN exactly at step == a
            frac = (step >= a).astype(jnp.float32)
        else:
            frac = jnp.clip((step - a) / float(b - a), 0.0, 1.0)
        cscale = h["cartesian_cost_scale"] * frac
    pair_n = inp_pair.size
    cart_cost = cscale / h["cartesian_cost_reference"] * jnp.mean(
        jnp.abs(inp_pair - out_pair)
    )
    metrics["cartesian_loss"] = cart_cost

    cd_loss, g_lat_cd = _sigmoid_loss_and_latgrad(
        inp_pair, lat, h["cartesian_dist_sig_parameters"],
        h["cartesian_distance_cost_scale"],
    )
    metrics["cartesian_distance_loss"] = cd_loss

    if h["distance_cost_scale"] is not None:
        enc_inp = jnp.concatenate(raw_groups, axis=1)
        d_loss, g_lat_d = _sigmoid_loss_and_latgrad(
            enc_inp, lat, h["dist_sig_parameters"], h["distance_cost_scale"],
            periodicity=P,
        )
    else:
        d_loss, g_lat_d = jnp.asarray(0.0, jnp.float32), 0.0
    metrics["distance_loss"] = d_loss

    center = h["center_cost_scale"] * jnp.mean(jnp.square(lat))
    metrics["center_loss"] = center
    reg = h["l2_reg_constant"] * (
        sum(jnp.sum(jnp.square(w)) for w in enc_w)
        + sum(jnp.sum(jnp.square(w)) for w in dec_w)
    )
    metrics["regularization_loss"] = reg
    metrics["loss"] = sum(
        v for k, v in metrics.items()
    )
    metrics["cartesian_cost_scale"] = cscale

    # ---------------- backward
    # cartesian loss -> CA positions
    g_pair = (cscale / h["cartesian_cost_reference"] / pair_n) * jnp.sign(
        out_pair - inp_pair
    )
    safe = jnp.where(out_pair == 0.0, 1.0, out_pair)
    w_pair = (g_pair / safe)[..., None] * out_diff
    g_ca = jnp.zeros_like(ca_back)
    g_ca = g_ca.at[:, iu[0], :].add(w_pair)
    g_ca = g_ca.at[:, iu[1], :].add(-w_pair)

    # scatter CA grads into full-chain positions
    g_back = jnp.zeros_like(back)
    g_back = g_back.at[:, h["ca_start"]::h["ca_step"], :].set(g_ca)

    d_bar, a_bar = _backmap_bwd(bres, g_back)
    g_out_dih = g_out_dih + d_bar
    g_out_ang = g_out_ang + a_bar

    # fold the periodic-output pullbacks into the decoder cotangent
    g_blocks = []
    outs_g = [g_out_ang, g_out_dih] + (
        [g_out_side] if side is not None else []
    )
    for (s_, c_, n2), go in zip(trig, outs_g):
        if P != 2 * pi:
            go = go / (2 * pi) * P
        g_blocks.append(jnp.concatenate(
            [go * c_ / n2, -go * s_ / n2], axis=1
        ))
    g_dec_out = jnp.concatenate(g_blocks, axis=1)

    # decoder backprop
    g_dec_w = [None] * n_dec
    g_dec_b = [None] * n_dec
    delta = g_dec_out
    for i in range(n_dec - 1, -1, -1):
        if i < n_dec - 1:
            a = acts_d[i + 1]
            delta = delta * (1.0 - a * a)
        g_dec_w[i] = _mm_t1(acts_d[i], delta)
        g_dec_b[i] = jnp.sum(delta, axis=0)
        delta = _mm_t2(delta, dec_w[i])
    g_lat = delta + g_lat_cd + g_lat_d
    g_lat = g_lat + (2.0 * h["center_cost_scale"] / lat.size) * lat

    # encoder backprop
    g_enc_w = [None] * n_enc
    g_enc_b = [None] * n_enc
    delta = g_lat
    for i in range(n_enc - 1, -1, -1):
        if i < n_enc - 1:
            a = acts_e[i + 1]
            delta = delta * (1.0 - a * a)
        g_enc_w[i] = _mm_t1(acts_e[i], delta)
        g_enc_b[i] = jnp.sum(delta, axis=0)
        if i > 0:
            delta = _mm_t2(delta, enc_w[i])

    for i in range(n_enc):
        g_enc_w[i] = g_enc_w[i] + 2.0 * h["l2_reg_constant"] * enc_w[i]
    for i in range(n_dec):
        g_dec_w[i] = g_dec_w[i] + 2.0 * h["l2_reg_constant"] * dec_w[i]

    return g_enc_w, g_enc_b, g_dec_w, g_dec_b, metrics

