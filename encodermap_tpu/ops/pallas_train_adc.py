# encodermap_tpu/ops/pallas_train_adc.py
"""Fused AngleDihedralCartesian train step (small-protein fast path).

Stage A of the fused-ADC design: ``hand_adc_step`` is the full forward +
hand-derived backward of the 7-loss ADC training step in plain JAX —
encoder/decoder MLP with unit-circle periodicity, the batch-mean-bond
planar chain, the two-way quaternion dihedral curl (using the analytic
one-way adjoint of ``ops/backmap.py``), CA pairwise distances, and the
loss stack of ``train/adc_autoencoder.py::_loss_terms`` (reference
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

The Pallas kernel (stage B, ``adc_fused_chunk``) ports this math with
Mosaic-friendly structure-of-arrays shapes: reversals and atom selections
are constant-matrix matmuls (no flip/strided-slice primitives), scans are
Hillis-Steele shift chains, atan2 is a Remez polynomial (no atan
primitive), sigmoids are evaluated from squared distances (even
exponents — no sqrt), parameters live VMEM-resident across the grid with
the initial values DMA'd from HBM once.

MEASURED OUTCOME (v5e, trp-cage scale, batch 256): the fused kernel runs
at ~93 us/step vs ~113 us for the XLA path — only ~15% ahead, and the
in-kernel MLP matmuls must drop to bf16 (Mosaic lowers only
DEFAULT/HIGHEST, and HIGHEST's 6 passes dominate at in_dim ~310). Unlike
the EncoderMap case (ops/pallas_train.py, 3x), the ADC step's cost is
spread over hundreds of small geometry/sigmoid ops that Mosaic executes
no faster than XLA's fusions, and the hand-derived backward is no faster
than autodiff at the XLA level either (112.9 vs ~113 us — the custom
backmap VJP already removed autodiff's only expensive transpose). The
trainers therefore do NOT route here; the module stays as tested
infrastructure: machine-precision analytic adjoints of the full ADC step
and a working fused-kernel recipe for a future hardware generation where
the op-overhead balance differs.
"""

from __future__ import annotations

import functools
from math import pi
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["hand_adc_step", "adc_fused_available"]

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
# building blocks shared with ops/backmap.py semantics
# --------------------------------------------------------------------------


def _rev_cumsum(x, axis=1):
    return jnp.flip(jnp.cumsum(jnp.flip(x, axis), axis), axis)


def _quat_mul(f, g):
    fw, fx, fy, fz = f
    gw, gx, gy, gz = g
    return (
        fw * gw - fx * gx - fy * gy - fz * gz,
        fw * gx + fx * gw + fy * gz - fz * gy,
        fw * gy - fx * gz + fy * gw + fz * gx,
        fw * gz + fx * gy - fy * gx + fz * gw,
    )


def _quat_rot(q, v):
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


def _quat_conj(q):
    w, x, y, z = q
    return (w, -x, -y, -z)


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
    fixed = jnp.where(
        distances < 1e-5, jnp.ones_like(distances) * jnp.mean(distances),
        distances,
    )
    mean_lengths = jnp.broadcast_to(
        jnp.mean(fixed, axis=0, keepdims=True),
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


def _sig(r, sig, a, b):
    c = 2.0 ** (a / b) - 1.0
    return 1.0 - (1.0 + c * (r / sig) ** a) ** (-b / a)


def _dsig_over_r(r2, r, sig, a, b):
    c = 2.0 ** (a / b) - 1.0
    if a == 2:
        return (b * c / sig**2) * (1.0 + c * r2 / sig**2) ** (-b / a - 1.0)
    r_safe = jnp.where(r2 == 0.0, 1.0, r)
    t = (r_safe / sig) ** a
    out = b * c * t * (1.0 + t) ** (-b / a - 1.0) / jnp.square(r_safe)
    return jnp.where(r2 == 0.0, 0.0, out)


def _batch_pairdist2_gram(x):
    """(B, B) squared distances over batch rows of features (Gram form —
    one MXU matmul; feature dims here are large enough to pay off)."""
    sq = jnp.sum(jnp.square(x), axis=1)
    dot = _mm_t2(x, x)
    d2 = sq[:, None] - 2.0 * dot + sq[None, :]
    return jnp.maximum(d2, 0.0)


def _sigmoid_loss_and_latgrad(feats, lat, params, scale):
    """cartesian_distance-style loss: sigmoid(batch-pairdist(feats)) vs
    sigmoid(batch-pairdist(lat)); returns (loss, d loss/d lat)."""
    sig_h, a_h, b_h, sig_l, a_l, b_l = params
    B = feats.shape[0]
    dh2 = _batch_pairdist2_gram(feats)
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
            enc_inp, lat, h["dist_sig_parameters"], h["distance_cost_scale"]
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


def adc_fused_available(p, shapes) -> bool:
    """Eligibility of the fused ADC path (stage B kernel)."""
    try:
        if jax.default_backend() not in ("tpu", "axon"):
            return False
    except Exception:  # pragma: no cover
        return False
    if p.reconstruct_sidechains or not p.use_backbone_angles:
        return False
    if p.model_api != "functional":
        return False
    for v in (p.dihedral_cost_variant, p.angle_cost_variant,
              p.cartesian_cost_variant, p.side_dihedral_cost_variant):
        if v != "mean_abs":
            return False
    if p.auto_cost_scale not in (None, 0):
        return False
    acts = list(p.activation_functions)
    if acts[0] != "" or any(a != "tanh" for a in acts[1:-1]) or acts[-1] != "":
        return False
    # VMEM budget: the kernel materializes (B, n_pairs) matrices
    n_ca = (shapes.n_cartesians - (p.cartesian_pwd_start or 1)
            + (p.cartesian_pwd_step or 3) - 1) // (p.cartesian_pwd_step or 3)
    n_pairs = n_ca * (n_ca - 1) // 2
    return n_pairs <= 4096


# --------------------------------------------------------------------------
# Stage B: structure-of-arrays formulation (Mosaic-safe: no flip / cumsum /
# strided-slice / atan2 primitives — reversals and selections are constant
# matmuls, scans are Hillis-Steele shifts, atan2 is a Remez polynomial)
# --------------------------------------------------------------------------


def _hs_prefix(x):
    """Inclusive prefix sum over lanes via log2 shift-adds."""
    n = x.shape[1]
    s = 1
    while s < n:
        pad = jnp.zeros(x.shape[:1] + (s,), x.dtype)
        x = x + jnp.concatenate([pad, x[:, :-s]], axis=1)
        s *= 2
    return x


def _hs_suffix(x):
    """Inclusive suffix sum over lanes via log2 shift-adds."""
    n = x.shape[1]
    s = 1
    while s < n:
        pad = jnp.zeros(x.shape[:1] + (s,), x.dtype)
        x = x + jnp.concatenate([x[:, s:], pad], axis=1)
        s *= 2
    return x


def _quat_prefix(q):
    """Inclusive prefix composition of quaternions (B_0 (x) ... (x) B_i)."""
    n = q[0].shape[1]
    s = 1
    while s < n:
        def shift(comp, fill):
            pad = jnp.full(comp.shape[:1] + (s,), fill, comp.dtype)
            return jnp.concatenate([pad, comp[:, :-s]], axis=1)
        shifted = (shift(q[0], 1.0), shift(q[1], 0.0), shift(q[2], 0.0),
                   shift(q[3], 0.0))
        q = _quat_mul(shifted, q)
        s *= 2
    return q


_ATAN_COEFFS = (0.9999993329, -0.3332985605, 0.1994653599, -0.1390853351,
                0.0964200441, -0.0559098861, 0.0218612288, -0.0040540580)


def _poly_atan2(s, c):
    """atan2 via odd Remez polynomial on [0, 1] + range reduction
    (max err ~2.4e-7; Mosaic has no atan/atan2 primitive)."""
    ax, ay = jnp.abs(c), jnp.abs(s)
    hi = ay > ax
    num = jnp.where(hi, ax, ay)
    den = jnp.where(hi, ay, ax)
    den = jnp.where(den == 0.0, 1.0, den)
    z = num / den
    z2 = z * z
    acc = jnp.full_like(z, _ATAN_COEFFS[-1])
    for k in range(len(_ATAN_COEFFS) - 2, -1, -1):
        acc = acc * z2 + _ATAN_COEFFS[k]
    r = z * acc
    r = jnp.where(hi, (pi / 2) - r, r)
    r = jnp.where(c < 0.0, pi - r, r)
    return jnp.where(s < 0.0, -r, r)


def _mk_mm(contract, precision):
    def mm(a, b):
        return jax.lax.dot_general(
            a, b, (contract, ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32,
        )
    return mm


# geometry matmuls (reversals/selections are permutation-like and feed the
# telescoped rotation chain) stay exact f32
_mmh = _mk_mm(((1,), (0,)), jax.lax.Precision.HIGHEST)
_mmh_t1 = _mk_mm(((0,), (0,)), jax.lax.Precision.HIGHEST)
_mmh_t2 = _mk_mm(((1,), (1,)), jax.lax.Precision.HIGHEST)
# MLP / sigmoid-Gram matmuls: DEFAULT (bf16 inputs, f32 accumulation — the
# standard TPU training precision; Mosaic lowers only DEFAULT/HIGHEST and
# HIGHEST's 6 passes were measured to dominate the kernel at in_dim ~310)
_mmp = _mk_mm(((1,), (0,)), jax.lax.Precision.DEFAULT)
_mmp_t1 = _mk_mm(((0,), (0,)), jax.lax.Precision.DEFAULT)
_mmp_t2 = _mk_mm(((1,), (1,)), jax.lax.Precision.DEFAULT)


def _one_way_fwd_soa(d, x3):
    """SoA one-way curl. d: (B, n); x3: 3-tuple of (B, n+3) planes."""
    ux = tuple(c[:, 2:-1] - c[:, 1:-2] for c in x3)
    ulen = jnp.sqrt(ux[0] ** 2 + ux[1] ** 2 + ux[2] ** 2)
    axis = tuple(c / ulen for c in ux)
    half = 0.5 * d
    s = jnp.sin(half)
    q = (jnp.cos(half), s * axis[0], s * axis[1], s * axis[2])
    q_scan = _quat_prefix(q)
    q_ext = tuple(jnp.concatenate([c, c[:, -1:]], axis=1) for c in q_scan)
    bonds = tuple(c[:, 2:] - c[:, 1:-1] for c in x3)
    r = _quat_rot(q_ext, bonds)
    cums = tuple(_hs_prefix(c) for c in r)
    out = tuple(
        jnp.concatenate([x3[k][:, :2], x3[k][:, 1:2] + cums[k]], axis=1)
        for k in range(3)
    )
    return out, (q_scan, q_ext, r, axis, ulen, d)


def _one_way_bwd_soa(res, g3):
    """SoA analytic adjoint; g3: 3-tuple of (B, n+3) cotangent planes."""
    q_scan, q_ext, r, axis, ulen, d = res
    B, n = d.shape
    G = tuple(_hs_suffix(c[:, 2:]) for c in g3)
    b_bar = _quat_rot(_quat_conj(q_ext), G)
    # t = r x G
    t = (r[1] * G[2] - r[2] * G[1],
         r[2] * G[0] - r[0] * G[2],
         r[0] * G[1] - r[1] * G[0])
    T = tuple(_hs_suffix(c) for c in t)
    d_bar = sum(
        (r[k][:, :n] / ulen) * T[k][:, :n] for k in range(3)
    )

    # moment planes M[a][b] = suffix(r_a * G_b)[:, :n]
    M = [[_hs_suffix(r[a] * G[b])[:, :n] for b in range(3)] for a in range(3)]
    q_i = tuple(c[:, :n] for c in q_scan)
    q_im1 = (
        jnp.concatenate([jnp.ones((B, 1), d.dtype), q_scan[0][:, :n - 1]],
                        axis=1),
    ) + tuple(
        jnp.concatenate([jnp.zeros((B, 1), d.dtype), c[:, :n - 1]], axis=1)
        for c in q_scan[1:]
    )
    qc_i, qc_im1 = _quat_conj(q_i), _quat_conj(q_im1)
    # halfN = R_i^T M (rotate each column b)
    halfN = [[None] * 3 for _ in range(3)]
    for b in range(3):
        col = _quat_rot(qc_i, (M[0][b], M[1][b], M[2][b]))
        for a in range(3):
            halfN[a][b] = col[a]
    # N = halfN R_{i-1}: N[a][:] = R_{i-1}^T (row a of halfN)
    N = [[None] * 3 for _ in range(3)]
    for a in range(3):
        row = _quat_rot(qc_im1, (halfN[a][0], halfN[a][1], halfN[a][2]))
        for b in range(3):
            N[a][b] = row[b]
    vee = (N[1][2] - N[2][1], N[2][0] - N[0][2], N[0][1] - N[1][0])
    Na = tuple(sum(N[a][b] * axis[b] for b in range(3)) for a in range(3))
    NTa = tuple(sum(N[b][a] * axis[b] for b in range(3)) for a in range(3))
    sin_d, cos_d = jnp.sin(d), jnp.cos(d)
    a_bar = tuple(
        sin_d * vee[k] + (1.0 - cos_d) * (Na[k] + NTa[k]) for k in range(3)
    )
    dot_aa = sum(axis[k] * a_bar[k] for k in range(3))
    u_bar = tuple((a_bar[k] - axis[k] * dot_aa) / ulen for k in range(3))

    def pad(y, left, right):
        z = lambda w: jnp.zeros((B, w), y.dtype)
        parts = ([z(left)] if left else []) + [y] + ([z(right)] if right else [])
        return jnp.concatenate(parts, axis=1) if len(parts) > 1 else y

    x_bar = []
    for k in range(3):
        g = g3[k]
        total_tail = _hs_suffix(g[:, 2:])[:, :1]  # sum of g[:, 2:]
        xb = jnp.concatenate(
            [g[:, :1], g[:, 1:2] + total_tail, jnp.zeros((B, n + 1), g.dtype)],
            axis=1,
        )
        # bonds b_m = q_m - q_{m-1}, m = 2..n+2; axes u_i between 1+i, 2+i.
        # Mosaic has no scatter: slice-adds become zero-padded full-width adds.
        xb = xb + pad(b_bar[k], 2, 0) - pad(b_bar[k], 1, 1)
        xb = xb + pad(u_bar[k], 2, 1) - pad(u_bar[k], 1, 2)
        x_bar.append(xb)
    return d_bar, tuple(x_bar)


def _alt_sign(n, dtype, even_val, offset=0):
    """(1, n) alternating-sign row built from iota (Mosaic kernels cannot
    capture host constants)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1) + offset
    parity = (i % 2 == 0).astype(dtype)
    return parity * even_val + (1.0 - parity) * (-even_val)


def _chain_fwd_soa(lengths, angles):
    """SoA chain-in-plane: returns (xs, ys) planes + residuals."""
    B = angles.shape[0]
    n_bonds = lengths.shape[-1]
    n_angles = angles.shape[-1]
    dtype = angles.dtype
    signs_a = _alt_sign(n_angles, dtype, -1.0)
    s = signs_a * (pi - angles)
    csum = _hs_prefix(s)
    sign_i = _alt_sign(n_bonds - 1, dtype, 1.0, offset=1)
    heading = jnp.concatenate(
        [jnp.zeros((B, 1), dtype), sign_i * csum], axis=-1
    )
    y_sign = _alt_sign(n_bonds, dtype, 1.0)
    dx = lengths * jnp.cos(heading)
    dy = lengths * jnp.sin(heading) * y_sign
    zeros = jnp.zeros((B, 1), dtype)
    xs = jnp.concatenate([zeros, _hs_prefix(dx)], axis=-1)
    ys = jnp.concatenate([zeros, _hs_prefix(dy)], axis=-1)
    return (xs, ys, jnp.zeros_like(xs)), (lengths, heading, signs_a, sign_i,
                                          y_sign)


def _chain_bwd_soa(res, g3):
    lengths, heading, signs_a, sign_i, y_sign = res
    dxb = _hs_suffix(g3[0][:, 1:])
    dyb = _hs_suffix(g3[1][:, 1:])
    h_bar = lengths * (
        -jnp.sin(heading) * dxb + jnp.cos(heading) * y_sign * dyb
    )
    c_bar = sign_i * h_bar[:, 1:]
    s_bar = _hs_suffix(c_bar)
    return -signs_a * s_bar


def _backmap_fwd_soa(distances, angles, dihedrals, J_atoms_l, J_dih_l):
    """SoA backmap. Reversals are matmuls with constant antidiagonal
    matrices (Mosaic has no flip)."""
    fixed = jnp.where(
        distances < 1e-5, jnp.ones_like(distances) * jnp.mean(distances),
        distances,
    )
    mean_lengths = jnp.broadcast_to(
        jnp.mean(fixed, axis=0, keepdims=True),
        (angles.shape[0], distances.shape[1]),
    )
    chain, cres = _chain_fwd_soa(mean_lengths, angles)
    d = dihedrals + pi
    n = d.shape[1]
    middle = n // 2
    n_atoms = chain[0].shape[1]
    split = n_atoms // 2
    # left dihedrals: reversed prefix
    if n % 2 == 0:
        d_left = _mmh(d[:, :middle], J_dih_l)
        d_right = d[:, middle:]
    else:
        d_left = _mmh(d[:, :middle + 1], J_dih_l)
        d_right = d[:, middle + 1:]
    c_left = tuple(_mmh(c[:, :split + 2], J_atoms_l) for c in chain)
    c_right = tuple(c[:, split - 1:] for c in chain)
    new_left, res_l = _one_way_fwd_soa(d_left, c_left)
    new_right, res_r = _one_way_fwd_soa(d_right, c_right)
    out = tuple(
        jnp.concatenate(
            [_mmh(new_left[k], J_atoms_l.T), new_right[k][:, 3:]], axis=1
        )
        for k in range(3)
    )
    return out, (cres, res_l, res_r, split, middle, n, J_atoms_l, J_dih_l)


def _backmap_bwd_soa(res, g3):
    cres, res_l, res_r, split, middle, n, J_atoms_l, J_dih_l = res
    B = g3[0].shape[0]
    n_atoms = g3[0].shape[1]
    g_left = tuple(_mmh(c[:, :split + 2], J_atoms_l) for c in g3)
    zeros3 = jnp.zeros((B, 3), g3[0].dtype)
    g_right = tuple(
        jnp.concatenate([zeros3, c[:, split + 2:]], axis=1) for c in g3
    )
    dl_bar, xl_bar = _one_way_bwd_soa(res_l, g_left)
    dr_bar, xr_bar = _one_way_bwd_soa(res_r, g_right)
    chain_bar = []
    for k in range(3):
        left_part = _mmh(xl_bar[k], J_atoms_l.T)  # chain atoms 0..split+1
        cb = jnp.concatenate(
            [left_part, jnp.zeros((B, n_atoms - split - 2), g3[0].dtype)],
            axis=1,
        )
        cb = cb + jnp.concatenate(
            [jnp.zeros((B, split - 1), g3[0].dtype), xr_bar[k]], axis=1
        )
        chain_bar.append(cb)
    ang_bar = _chain_bwd_soa(cres, tuple(chain_bar))
    # un-reverse the left dihedral pullback
    dl_unrev = _mmh(dl_bar, J_dih_l.T)
    d_bar = jnp.concatenate([dl_unrev, dr_bar], axis=1)
    return d_bar, ang_bar


def _sig_from_r2(r2, sig, a, b):
    """Sketch-map sigmoid evaluated from SQUARED distances (even ``a``
    only): (r/sig)^a = (r2/sig^2)^(a/2) — no sqrt, no distance matrix."""
    assert a % 2 == 0, "even-exponent fast path"
    c = 2.0 ** (a / b) - 1.0
    return 1.0 - (1.0 + c * (r2 / sig**2) ** (a // 2)) ** (-b / a)


def _sigmoid_soa(feats, lat, params, scale):
    """Lean SoA sigmoid loss: everything works on squared distances (the
    exponents are even), so no sqrt and no guard masks — the adjoint is
    hand-derived and _dsig_over_r is already a function of r^2."""
    sig_h, a_h, b_h, sig_l, a_l, b_l = params
    B = feats.shape[0]
    sq = jnp.sum(jnp.square(feats), axis=1)
    dh2 = jnp.maximum(sq[:, None] - 2.0 * _mmp_t2(feats, feats) + sq[None, :],
                      0.0)
    dl2 = jnp.zeros((B, B), lat.dtype)
    for k in range(lat.shape[1]):
        col = lat[:, k]
        diff = col[:, None] - col[None, :]
        dl2 = dl2 + diff * diff
    sdiff = _sig_from_r2(dl2, sig_l, a_l, b_l) - _sig_from_r2(
        dh2, sig_h, a_h, b_h)
    loss = scale * jnp.mean(jnp.square(sdiff))
    M = (4.0 * scale / (B * B)) * sdiff * _dsig_over_r(dl2, None, sig_l,
                                                       a_l, b_l)
    row = jnp.sum(M, axis=1)
    g_lat = row[:, None] * lat - _mmp(M, lat)
    return loss, g_lat


def adc_soa_step(
    enc_w, enc_b, dec_w, dec_b,
    angles, dihedrals, ca3, distances, side,
    step,
    consts: dict,
    hyper: dict,
):
    """Full SoA forward + backward of the ADC step (kernel body math).

    Args:
        ca3: 3-tuple of (B, n_ca) input CA coordinate planes.
        consts: constant matrices {"J_atoms_l", "J_dih_l", "S_pair"}.
        hyper: same entries as :func:`hand_adc_step` (pair_iu unused here).

    Returns: (g_enc_w, g_enc_b, g_dec_w, g_dec_b, metrics list
        [dihedral, angle, side, cartesian, cartesian_distance, distance,
        center, reg, total, cscale]).
    """
    h = hyper
    P = h["periodicity"]
    B = angles.shape[0]
    S_pair = consts["S_pair"]

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
        z = _mmp(acts_e[-1], enc_w[i]) + enc_b[i]
        acts_e.append(jnp.tanh(z) if i < n_enc - 1 else z)
    lat = acts_e[-1]
    acts_d = [lat]
    n_dec = len(dec_w)
    for i in range(n_dec):
        z = _mmp(acts_d[-1], dec_w[i]) + dec_b[i]
        acts_d.append(jnp.tanh(z) if i < n_dec - 1 else z)
    dec_out = acts_d[-1]

    nA, nD = angles.shape[1], dihedrals.shape[1]
    nS = side.shape[1] if side is not None else 0
    sizes = [2 * nA, 2 * nD] + ([2 * nS] if side is not None else [])
    offs = np.cumsum([0] + sizes)
    outs, trig = [], []
    for k, nk in enumerate((nA, nD) + ((nS,) if side is not None else ())):
        blk = dec_out[:, offs[k]:offs[k + 1]]
        s_, c_ = blk[:, :nk], blk[:, nk:]
        o = _poly_atan2(s_, c_)
        if P != 2 * pi:
            o = o / (2 * pi) * P
        outs.append(o)
        trig.append((s_, c_, s_ * s_ + c_ * c_))
    out_angles, out_dihedrals = outs[0], outs[1]
    out_side = outs[2] if side is not None else None

    back3, bres = _backmap_fwd_soa(
        distances, out_angles, out_dihedrals,
        consts["J_atoms_l"], consts["J_dih_l"],
    )
    ca_back = tuple(_mmh(c, consts["C_ca"]) for c in back3)

    def flat_pairs(p3):
        diffs = tuple(_mmh(c, S_pair) for c in p3)
        d2 = diffs[0] ** 2 + diffs[1] ** 2 + diffs[2] ** 2
        mask = (d2 == 0.0).astype(d2.dtype)
        return jnp.sqrt(d2 + mask * 1e-16) * (1.0 - mask), diffs

    inp_pair, _ = flat_pairs(ca3)
    out_pair, out_diffs = flat_pairs(ca_back)

    metrics = []
    dih_cost, g_out_dih = _periodic_mean_abs_and_grad(
        dihedrals, out_dihedrals, P,
        h["dihedral_cost_scale"] / h["dihedral_cost_reference"])
    ang_cost, g_out_ang = _periodic_mean_abs_and_grad(
        angles, out_angles, P,
        h["angle_cost_scale"] / h["angle_cost_reference"])
    metrics += [dih_cost, ang_cost]
    if side is not None:
        side_cost, g_out_side = _periodic_mean_abs_and_grad(
            side, out_side, P,
            h["side_dihedral_cost_scale"] / h["side_dihedral_cost_reference"])
    else:
        side_cost = jnp.asarray(0.0, jnp.float32)
    metrics.append(side_cost)

    if h["soft_start"] is None:
        cscale = jnp.asarray(h["cartesian_cost_scale"], jnp.float32)
    else:
        a, b = h["soft_start"]
        cscale = h["cartesian_cost_scale"] * jnp.clip(
            (step - a) / float(b - a), 0.0, 1.0)
    cart_cost = cscale / h["cartesian_cost_reference"] * jnp.mean(
        jnp.abs(inp_pair - out_pair))
    metrics.append(cart_cost)

    cd_loss, g_lat_cd = _sigmoid_soa(
        inp_pair, lat, h["cartesian_dist_sig_parameters"],
        h["cartesian_distance_cost_scale"])
    metrics.append(cd_loss)
    if h["distance_cost_scale"] is not None:
        enc_inp = jnp.concatenate(raw_groups, axis=1)
        d_loss, g_lat_d = _sigmoid_soa(
            enc_inp, lat, h["dist_sig_parameters"], h["distance_cost_scale"])
    else:
        d_loss, g_lat_d = jnp.asarray(0.0, jnp.float32), 0.0
    metrics.append(d_loss)
    center = h["center_cost_scale"] * jnp.mean(jnp.square(lat))
    metrics.append(center)
    reg = h["l2_reg_constant"] * (
        sum(jnp.sum(jnp.square(w)) for w in enc_w)
        + sum(jnp.sum(jnp.square(w)) for w in dec_w))
    metrics.append(reg)
    total = sum(metrics)
    metrics.append(total)
    metrics.append(cscale)

    # ------------- backward
    pair_n = inp_pair.size
    g_pair = (cscale / h["cartesian_cost_reference"] / pair_n) * jnp.sign(
        out_pair - inp_pair)
    safe = jnp.where(out_pair == 0.0, 1.0, out_pair)
    w_over = g_pair / safe
    g_ca = tuple(_mmh_t2(w_over * out_diffs[k], S_pair) for k in range(3))
    g_back = tuple(_mmh_t2(g_ca[k], consts["C_ca"]) for k in range(3))

    d_bar, a_bar = _backmap_bwd_soa(bres, g_back)
    g_out_dih = g_out_dih + d_bar
    g_out_ang = g_out_ang + a_bar

    g_blocks = []
    outs_g = [g_out_ang, g_out_dih] + (
        [g_out_side] if side is not None else [])
    for (s_, c_, n2), go in zip(trig, outs_g):
        if P != 2 * pi:
            go = go / (2 * pi) * P
        g_blocks.append(jnp.concatenate([go * c_ / n2, -go * s_ / n2],
                                        axis=1))
    g_dec_out = jnp.concatenate(g_blocks, axis=1)

    g_dec_w = [None] * n_dec
    g_dec_b = [None] * n_dec
    delta = g_dec_out
    for i in range(n_dec - 1, -1, -1):
        if i < n_dec - 1:
            a = acts_d[i + 1]
            delta = delta * (1.0 - a * a)
        g_dec_w[i] = _mmp_t1(acts_d[i], delta)
        g_dec_b[i] = jnp.sum(delta, axis=0)
        delta = _mmp_t2(delta, dec_w[i])
    g_lat = delta + g_lat_cd + g_lat_d
    g_lat = g_lat + (2.0 * h["center_cost_scale"] / lat.size) * lat

    g_enc_w = [None] * n_enc
    g_enc_b = [None] * n_enc
    delta = g_lat
    for i in range(n_enc - 1, -1, -1):
        if i < n_enc - 1:
            a = acts_e[i + 1]
            delta = delta * (1.0 - a * a)
        g_enc_w[i] = _mmp_t1(acts_e[i], delta)
        g_enc_b[i] = jnp.sum(delta, axis=0)
        if i > 0:
            delta = _mmp_t2(delta, enc_w[i])
    for i in range(n_enc):
        g_enc_w[i] = g_enc_w[i] + 2.0 * h["l2_reg_constant"] * enc_w[i]
    for i in range(n_dec):
        g_dec_w[i] = g_dec_w[i] + 2.0 * h["l2_reg_constant"] * dec_w[i]
    return g_enc_w, g_enc_b, g_dec_w, g_dec_b, metrics


def make_adc_consts(n_atoms: int, n_dihedrals: int, ca_start: int,
                    ca_step: int) -> dict:
    """Constant matrices for the SoA formulation (reversals/selections as
    matmuls)."""
    split = n_atoms // 2
    middle = n_dihedrals // 2
    nl = split + 2
    ndl = middle if n_dihedrals % 2 == 0 else middle + 1
    ca_idx = np.arange(ca_start, n_atoms, ca_step)
    n_ca = len(ca_idx)
    iu = np.triu_indices(n_ca, k=1)
    S = np.zeros((n_ca, len(iu[0])), np.float32)
    S[iu[0], np.arange(len(iu[0]))] = 1.0
    S[iu[1], np.arange(len(iu[0]))] = -1.0
    C = np.zeros((n_atoms, n_ca), np.float32)
    C[ca_idx, np.arange(n_ca)] = 1.0
    return {
        "J_atoms_l": jnp.asarray(np.eye(nl, dtype=np.float32)[::-1].copy()),
        "J_dih_l": jnp.asarray(np.eye(ndl, dtype=np.float32)[::-1].copy()),
        "C_ca": jnp.asarray(C),
        "S_pair": jnp.asarray(S),
    }


def _adc_kernel(step0_ref, stream_ref,
                Jl_ref, Jd_ref, C_ref, S_ref,
                *refs, n_tensors: int, n_enc: int, hyper: dict,
                has_side: bool, widths: tuple):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n3 = 3 * n_tensors
    ins = refs[:n3]           # HBM residents (memory_space=HBM, no VMEM copy)
    outs = refs[n3:2 * n3]
    metrics_ref = refs[2 * n3]
    sem = refs[2 * n3 + 1]
    pid = pl.program_id(0)

    # one combined CV stream (separate streams would each pad their lane
    # dim to 128 in VMEM — 7 padded double-buffers cost >1 MB)
    stream = stream_ref[0]
    offs = np.cumsum([0] + list(widths))
    nA_, nD_, nS_, nDist_, n_ca = widths[0], widths[1], widths[2], widths[3], widths[4]
    ang = stream[:, offs[0]:offs[1]]
    dih = stream[:, offs[1]:offs[2]]
    side_v = stream[:, offs[2]:offs[3]]
    dist_v = stream[:, offs[3]:offs[4]]
    cax = stream[:, offs[4]:offs[5]]
    cay = stream[:, offs[5]:offs[6]]
    caz = stream[:, offs[6]:offs[7]]

    @pl.when(pid == 0)
    def _():
        # one-time DMA of the initial params/moments into the VMEM-resident
        # output blocks (keeping the inputs in HBM halves the param VMEM)
        for i in range(n3):
            cp = pltpu.make_async_copy(ins[i], outs[i], sem)
            cp.start()
            cp.wait()

    n_w = n_tensors // 2
    ws = [outs[i][...] for i in range(n_w)]
    bs = [outs[n_w + i][...] for i in range(n_w)]
    mu = [outs[n_tensors + i][...] for i in range(n_tensors)]
    nu = [outs[2 * n_tensors + i][...] for i in range(n_tensors)]
    enc_w, dec_w = ws[:n_enc], ws[n_enc:]
    enc_b, dec_b = bs[:n_enc], bs[n_enc:]

    consts = {"J_atoms_l": Jl_ref[...], "J_dih_l": Jd_ref[...],
              "C_ca": C_ref[...], "S_pair": S_ref[...]}
    t = step0_ref[0, 0] + pid.astype(jnp.float32)
    gew, geb, gdw, gdb, metrics = adc_soa_step(
        enc_w, enc_b, dec_w, dec_b,
        ang, dih, (cax, cay, caz), dist_v,
        side_v if has_side else None,
        t, consts, hyper,
    )
    grads = (list(gew) + list(gdw)
             + [g[None, :] for g in geb] + [g[None, :] for g in gdb])

    from .pallas_train import _adam_update

    t_adam = t + 1.0 - step0_ref[0, 0] + step0_ref[0, 1]  # count + pid + 1
    lr = hyper["learning_rate"]
    for i in range(n_tensors):
        new_p, new_m, new_v = _adam_update(
            outs[i][...], mu[i], nu[i], grads[i], t_adam, lr
        )
        outs[i][...] = new_p
        outs[n_tensors + i][...] = new_m
        outs[2 * n_tensors + i][...] = new_v

    padded = jnp.concatenate(
        [jnp.stack(metrics), jnp.zeros((16 - len(metrics),), jnp.float32)]
    )
    metrics_ref[pl.ds(pid, 1), :] = padded[None, :]


def adc_fused_chunk(params_flat, mu_flat, nu_flat, step0, count0,
                    batches: dict, consts: dict, *, n_enc: int, hyper: dict,
                    interpret: bool = False):
    """Run one fused ADC chunk. ``batches``: dict of (steps, B, n) arrays
    with keys angles/dihedrals/side/distances/cax/cay/caz; ``step0`` the
    global step at chunk start (drives the soft-start scale); ``count0``
    the Adam count."""
    import functools as ft

    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    steps, B, _ = batches["angles"].shape
    n_tensors = len(params_flat)
    all_in = list(params_flat) + list(mu_flat) + list(nu_flat)
    has_side = "side" in batches and batches["side"] is not None
    side_arr = batches["side"] if has_side else jnp.zeros(
        (steps, B, 1), jnp.float32
    )

    parts = [batches["angles"], batches["dihedrals"], side_arr,
             batches["distances"], batches["cax"], batches["cay"],
             batches["caz"]]
    widths = tuple(a.shape[2] for a in parts)
    stream = jnp.concatenate(parts, axis=2)
    stream_specs = [
        pl.BlockSpec((1, B, stream.shape[2]), lambda i: (i, 0, 0))
    ]
    const_mats = [consts["J_atoms_l"], consts["J_dih_l"], consts["C_ca"],
                  consts["S_pair"]]
    const_specs = [
        pl.BlockSpec(m.shape, lambda i: (0, 0)) for m in const_mats
    ]
    from jax.experimental.pallas import tpu as pltpu

    param_specs = [
        pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM) for x in all_in
    ]
    out_shapes = [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in all_in]
    out_specs = [
        pl.BlockSpec(x.shape, lambda i: (0,) * x.ndim) for x in all_in
    ]
    out_shapes.append(jax.ShapeDtypeStruct((steps, 16), jnp.float32))
    out_specs.append(pl.BlockSpec((steps, 16), lambda i: (0, 0)))

    step0_arr = jnp.asarray(
        [[jnp.float32(step0), jnp.float32(count0)]], jnp.float32
    ).reshape(1, 2)

    from .pallas_train import _compiler_params

    kernel = ft.partial(
        _adc_kernel, n_tensors=n_tensors, n_enc=n_enc, hyper=hyper,
        has_side=has_side, widths=widths,
    )
    n_stream_const = 1 + 1 + len(const_mats)
    out = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[pl.BlockSpec((1, 2), lambda i: (0, 0))] + stream_specs
        + const_specs + param_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        input_output_aliases={
            n_stream_const + i: i for i in range(len(all_in))
        },
        scratch_shapes=[pltpu.SemaphoreType.DMA],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(step0_arr, stream, *const_mats, *all_in)
    n = n_tensors
    return (list(out[:n]), list(out[n:2 * n]), list(out[2 * n:3 * n]),
            out[3 * n])
