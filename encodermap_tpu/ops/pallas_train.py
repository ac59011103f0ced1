# encodermap_tpu/ops/pallas_train.py
"""Fully-fused EncoderMap train chunk: one Pallas kernel per
``steps_per_scan`` optimizer steps, parameters resident in VMEM.

The standard path compiles the train step into one XLA program, but at
EncoderMap's model sizes (batch 256, layers [128, 128, 2]) each step is
~50-70 small kernels and the chip spends most of its time on launch/relayout
overhead, not math (measured ~37 us/step on v5e where the raw FLOPs need
~2 us). This kernel runs the WHOLE chunk in one launch:

* grid = (steps,), sequential ("arbitrary") dimension semantics;
* parameter / Adam-moment blocks use constant index maps, so Mosaic keeps
  them in VMEM across grid steps — HBM touches them once per chunk, not
  once per step;
* the per-step batches are pre-gathered on device and streamed in blocks;
* forward, hand-derived backprop, gradient clip, and Adam all happen in
  registers/VMEM.

Scope (asserted by ``fused_trainer_available``): the plain EncoderMap
family — non-periodic (BASELINE config 1) AND periodic dihedral data
(config 2: sin/cos fold-in, atan2 output, min-image auto + pairwise
costs; see ``periodicity`` handling below) — with tanh hidden layers,
linear latent and output, and the standard 4-loss stack (auto mean_abs +
center + l2 reg + sigmoid distance). Everything else (ADC, custom
activations/variants) uses the general JAX path.

The hand-derived backprop (``hand_step``) is itself a plain-JAX function
tested against ``jax.grad`` of the production loss to machine precision —
the Pallas kernel is the same math with Mosaic-friendly 2-D shapes.

Reference semantics: losses ``loss_functions.py:200-628``; Adam with
clipvalue=1 ``autoencoder.py:741``.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["hand_step", "fused_chunk", "fused_trainer_available"]


_ATAN_COEFFS = (0.9999993329, -0.3332985605, 0.1994653599, -0.1390853351,
                0.0964200441, -0.0559098861, 0.0218612288, -0.0040540580)


def _poly_atan2(s, c):
    """atan2 via odd Remez polynomial on [0, 1] + range reduction
    (max err ~2.4e-7; Mosaic has no atan/atan2 primitive)."""
    from math import pi

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


# single-sourced sigmoid value/derivative (ops/distances.py): the wave-10
# missing-c gradient fix had to be applied to TWO drifted copies of these
# — the kernel and its oracle must share one implementation (wave 34)
from .distances import dsig_over_r as _dsig_over_r, sig_value as _sig


def _pairdist2(x):
    """(B, B) squared distances via per-component 2-D broadcasts (no 3-D
    intermediates — Mosaic-friendly)."""
    B, d = x.shape
    d2 = jnp.zeros((B, B), x.dtype)
    for k in range(d):
        col = x[:, k]
        diff = col[:, None] - col[None, :]
        d2 = d2 + diff * diff
    return d2


def hand_step(
    enc_w: list,
    enc_b: list,
    dec_w: list,
    dec_b: list,
    batch: jax.Array,
    *,
    dist_sig_parameters: tuple,
    auto_cost_scale: float,
    center_cost_scale: float,
    l2_reg_constant: float,
    distance_cost_scale: float,
    periodicity: float = float("inf"),
):
    """Forward + hand-derived gradients for the fused config.

    ``periodicity < inf`` adds the dihedral-data handling: sin/cos fold-in,
    polynomial-atan2 fold-out, min-image auto loss, and min-image pairwise
    distances on the high-d side of the sigmoid loss.

    Returns (grads_enc_w, grads_enc_b, grads_dec_w, grads_dec_b, metrics)
    with metrics = (auto, center, reg, dist, total).
    """
    from math import pi as _pi

    dot = functools.partial(
        jax.lax.dot_general, precision=jax.lax.Precision.HIGHEST
    )

    def mm(a, b):  # (B, m) @ (m, n)
        return dot(a, b, (((1,), (0,)), ((), ())))

    def mm_t1(a, b):  # a^T @ b: (m, B)^T? -> (m_a_cols, n)
        return dot(a, b, (((0,), (0,)), ((), ())))

    def mm_t2(a, b):  # a @ b^T
        return dot(a, b, (((1,), (1,)), ((), ())))

    B = batch.shape[0]
    d0 = batch.shape[1]
    periodic = periodicity != float("inf")

    # ---------------- forward
    if periodic:
        xs = batch if periodicity == 2 * _pi else batch / periodicity * 2 * _pi
        x0 = jnp.concatenate([jnp.sin(xs), jnp.cos(xs)], axis=1)
    else:
        x0 = batch
    acts_e = [x0]
    n_enc = len(enc_w)
    for i in range(n_enc):
        z = mm(acts_e[-1], enc_w[i]) + enc_b[i]
        acts_e.append(jnp.tanh(z) if i < n_enc - 1 else z)
    lat = acts_e[-1]

    acts_d = [lat]
    n_dec = len(dec_w)
    for i in range(n_dec):
        z = mm(acts_d[-1], dec_w[i]) + dec_b[i]
        acts_d.append(jnp.tanh(z) if i < n_dec - 1 else z)
    dec_out = acts_d[-1]
    if periodic:
        s_half, c_half = dec_out[:, :d0], dec_out[:, d0:]
        norm2 = s_half * s_half + c_half * c_half
        out = _poly_atan2(s_half, c_half)
        if periodicity != 2 * _pi:
            out = out / (2 * _pi) * periodicity
    else:
        out = dec_out

    # ---------------- losses
    if periodic:
        ad = jnp.abs(batch - out)
        flip = jnp.where(ad <= periodicity - ad, 1.0, -1.0)
        auto = auto_cost_scale * jnp.mean(jnp.minimum(ad, periodicity - ad))
    else:
        diff = batch - out
        auto = auto_cost_scale * jnp.mean(jnp.abs(diff))
    center = center_cost_scale * jnp.mean(jnp.square(lat))
    reg = l2_reg_constant * (
        sum(jnp.sum(jnp.square(w)) for w in enc_w)
        + sum(jnp.sum(jnp.square(w)) for w in dec_w)
    )
    sig_h, a_h, b_h, sig_l, a_l, b_l = dist_sig_parameters
    if periodic:
        # min-image pairwise distances of the periodic inputs
        # (ops/distances.pairwise_dist_periodic semantics, guards dropped —
        # the adjoint is manual and the h-side carries no gradients)
        dh2 = jnp.zeros((B, B), batch.dtype)
        for k in range(d0):
            col = batch[:, k]
            dd_ = jnp.abs(col[:, None] - col[None, :])
            dd_ = jnp.minimum(dd_, periodicity - dd_)
            dh2 = dh2 + dd_ * dd_
    else:
        dh2 = _pairdist2(batch)
    dl2 = _pairdist2(lat)
    # match ops/distances.pairwise_dist: grad-guarded sqrt with re-zeroing
    mask_h = (dh2 == 0.0).astype(batch.dtype)
    dh = jnp.sqrt(dh2 + mask_h * 1e-16) * (1.0 - mask_h)
    mask_l = (dl2 == 0.0).astype(lat.dtype)
    dl = jnp.sqrt(dl2 + mask_l * 1e-16) * (1.0 - mask_l)
    s_h = _sig(dh, sig_h, a_h, b_h)
    s_l = _sig(dl, sig_l, a_l, b_l)
    sdiff = s_l - s_h
    dist = distance_cost_scale * jnp.mean(jnp.square(sdiff))
    total = auto + center + reg + dist

    # ---------------- backward
    # auto (mean_abs): d/d out = -scale * sign/flip / (B * d0)
    if periodic:
        g_out = (auto_cost_scale / (B * d0)) * flip * jnp.sign(out - batch)
        # atan2 fold-out pullback into the decoder output halves
        if periodicity != 2 * _pi:
            g_out = g_out / (2 * _pi) * periodicity
        g_out = jnp.concatenate(
            [g_out * c_half / norm2, -g_out * s_half / norm2], axis=1
        )
    else:
        g_out = (-auto_cost_scale / (B * d0)) * jnp.sign(diff)

    # decoder backprop
    g_dec_w = [None] * n_dec
    g_dec_b = [None] * n_dec
    delta = g_out
    for i in range(n_dec - 1, -1, -1):
        if i < n_dec - 1:
            a = acts_d[i + 1]
            delta = delta * (1.0 - a * a)
        g_dec_w[i] = mm_t1(acts_d[i], delta)
        g_dec_b[i] = jnp.sum(delta, axis=0)
        delta = mm_t2(delta, dec_w[i])
    g_lat = delta

    # center
    g_lat = g_lat + (2.0 * center_cost_scale / lat.size) * lat

    # sigmoid distance: dL/dlat_k = (4*scale/B^2) sum_j sdiff_kj
    #   * s_l'(D_kj)/D_kj * (lat_k - lat_j)
    M = (4.0 * distance_cost_scale / (B * B)) * sdiff * _dsig_over_r(
        dl2, dl, sig_l, a_l, b_l
    )
    row = jnp.sum(M, axis=1)
    g_lat = g_lat + row[:, None] * lat - mm(M, lat)

    # encoder backprop
    g_enc_w = [None] * n_enc
    g_enc_b = [None] * n_enc
    delta = g_lat
    for i in range(n_enc - 1, -1, -1):
        if i < n_enc - 1:
            a = acts_e[i + 1]
            delta = delta * (1.0 - a * a)
        g_enc_w[i] = mm_t1(acts_e[i], delta)
        g_enc_b[i] = jnp.sum(delta, axis=0)
        if i > 0:
            delta = mm_t2(delta, enc_w[i])

    # l2 regularization on kernels
    for i in range(n_enc):
        g_enc_w[i] = g_enc_w[i] + 2.0 * l2_reg_constant * enc_w[i]
    for i in range(n_dec):
        g_dec_w[i] = g_dec_w[i] + 2.0 * l2_reg_constant * dec_w[i]

    metrics = jnp.stack([auto, center, reg, dist, total])
    return g_enc_w, g_enc_b, g_dec_w, g_dec_b, metrics


def fused_trainer_available(p, params, input_dim: int = 0) -> bool:
    """Whether the fused kernel covers this configuration (including the
    parameter tree: sparse models carry a densifier the kernel's
    split/join layout has no slot for)."""
    try:
        import jax

        if jax.default_backend() not in ("tpu", "axon"):
            return False
    except Exception:  # pragma: no cover
        return False
    if params is not None and "densifier" in params:
        # the caller used to have to remember this check itself — a param
        # tree the kernel can't represent must be rejected HERE (wave 34)
        return False
    if input_dim > 32:
        # BOTH pairwise paths (_pairdist2 / the min-image variant) unroll
        # one (B, B) broadcast per feature column — beyond ~32 dims the
        # XLA path's single MXU Gram is faster and the static unroll
        # costs a minutes-long remote Mosaic compile (wave 34: the gate
        # was periodic-only, letting wide NON-periodic data through)
        return False
    acts = list(p.activation_functions)
    if acts[0] != "" or any(a != "tanh" for a in acts[1:-1]) or acts[-1] != "":
        return False
    if p.auto_cost_variant != "mean_abs":
        return False
    if p.compute_dtype != "float32":
        return False  # the kernel's precision choices assume f32 params
    for scale in (p.auto_cost_scale, p.center_cost_scale,
                  p.distance_cost_scale):
        if scale is None:
            return False
    return True


def _adam_update(p_, m, v, g, t, lr, b1=0.9, b2=0.999, eps=1e-7,
                 clip=1.0):
    """optax.chain(clip(1), adam(lr)) semantics on one tensor."""
    g = jnp.clip(g, -clip, clip)
    m = b1 * m + (1.0 - b1) * g
    v = b2 * v + (1.0 - b2) * g * g
    mhat = m / (1.0 - jnp.exp(t * np.log(b1)))
    vhat = v / (1.0 - jnp.exp(t * np.log(b2)))
    return p_ - lr * mhat / (jnp.sqrt(vhat) + eps), m, v


def _fused_kernel(step0_ref, batch_ref, *refs, n_tensors: int,
                  n_enc: int, hyper: dict):
    """One grid step = one optimizer step. ``refs`` layout:
    inputs  [param x n_tensors, mu x n_tensors, nu x n_tensors],
    outputs [param, mu, nu (aliased), metrics (1, 8)].

    Parameter blocks use constant index maps -> they stay in VMEM across
    the sequential grid; all reads/writes go through the OUTPUT refs (the
    inputs are only copied in at the first step).
    """
    import jax.experimental.pallas as pl

    n3 = 3 * n_tensors
    ins = refs[:n3]
    outs = refs[n3:2 * n3]
    metrics_ref = refs[2 * n3]
    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _():
        for i in range(n3):
            outs[i][...] = ins[i][...]

    # unpack (weights are (din, dout); biases/moments of biases are (1, d))
    n_w = n_tensors // 2
    ws = [outs[i][...] for i in range(n_w)]
    bs = [outs[n_w + i][...] for i in range(n_w)]
    mu = [outs[n_tensors + i][...] for i in range(n_tensors)]
    nu = [outs[2 * n_tensors + i][...] for i in range(n_tensors)]

    enc_w, dec_w = ws[:n_enc], ws[n_enc:]
    enc_b = [b for b in bs[:n_enc]]
    dec_b = [b for b in bs[n_enc:]]

    batch = batch_ref[0]
    gew, geb, gdw, gdb, metrics = hand_step(
        enc_w, enc_b, dec_w, dec_b, batch, **hyper["losses"]
    )
    grads = (list(gew) + list(gdw)
             + [g[None, :] for g in geb] + [g[None, :] for g in gdb])

    t = step0_ref[0, 0] + pid.astype(jnp.float32) + 1.0
    lr = hyper["learning_rate"]
    for i in range(n_tensors):
        new_p, new_m, new_v = _adam_update(
            outs[i][...], mu[i], nu[i], grads[i], t, lr
        )
        outs[i][...] = new_p
        outs[n_tensors + i][...] = new_m
        outs[2 * n_tensors + i][...] = new_v

    padded = jnp.concatenate(
        [metrics, jnp.zeros((3,), metrics.dtype)]
    )
    # whole (steps, 8) metrics array stays in VMEM (constant index map);
    # dynamic store on the sublane dim writes this step's row
    metrics_ref[pl.ds(pid, 1), :] = padded[None, :]


def _compiler_params():
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(dimension_semantics=("arbitrary",))


def fused_chunk(params_flat: list, mu_flat: list, nu_flat: list,
                step0, batches, *, n_enc: int, hyper: dict,
                interpret: bool = False):
    """Run ``steps = batches.shape[0]`` optimizer steps in one kernel.

    Args:
        params_flat: [enc_w..., dec_w..., enc_b(1,d)..., dec_b(1,d)...].
        mu_flat / nu_flat: Adam moments, same layout.
        step0: starting step count as float32 scalar.
        batches: (steps, B, d0) pre-gathered batches.
        n_enc: number of encoder layers.
        hyper: {"learning_rate": float, "losses": {...hand_step kwargs}}.

    Returns:
        (new_params_flat, new_mu_flat, new_nu_flat, metrics (steps, 5)).
    """
    import functools as ft

    import jax.experimental.pallas as pl

    steps, B, d0 = batches.shape
    n_tensors = len(params_flat)
    all_in = list(params_flat) + list(mu_flat) + list(nu_flat)

    # nd=x.ndim binds at definition: a bare `x.ndim` inside the lambda
    # late-binds to the LAST tensor of the comprehension, which would
    # produce wrong-rank index tuples the moment ranks ever differ
    const_specs = [
        pl.BlockSpec(x.shape, lambda i, nd=x.ndim: (0,) * nd) for x in all_in
    ]
    out_shapes = [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in all_in]
    out_specs = [
        pl.BlockSpec(x.shape, lambda i, nd=x.ndim: (0,) * nd) for x in all_in
    ]
    out_shapes.append(jax.ShapeDtypeStruct((steps, 8), jnp.float32))
    out_specs.append(pl.BlockSpec((steps, 8), lambda i: (0, 0)))

    step0_arr = jnp.full((1, 1), step0, jnp.float32)
    kernel = ft.partial(
        _fused_kernel, n_tensors=n_tensors, n_enc=n_enc, hyper=hyper,
    )
    out = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
            pl.BlockSpec((1, B, d0), lambda i: (i, 0, 0)),
        ] + const_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        input_output_aliases={2 + i: i for i in range(len(all_in))},
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(step0_arr, batches, *all_in)
    n = n_tensors
    return (list(out[:n]), list(out[n:2 * n]), list(out[2 * n:3 * n]),
            out[3 * n][:, :5])


def split_params(params: dict) -> tuple[list, int]:
    """Flatten {"encoder": [...], "decoder": [...]} into the kernel layout
    [enc_w..., dec_w..., enc_b(1,d)..., dec_b(1,d)...]."""
    enc, dec = params["encoder"], params["decoder"]
    flat = ([l["kernel"] for l in enc] + [l["kernel"] for l in dec]
            + [l["bias"][None, :] for l in enc]
            + [l["bias"][None, :] for l in dec])
    return flat, len(enc)


def join_params(flat: list, n_enc: int, n_dec: int) -> dict:
    """Inverse of :func:`split_params`."""
    n_w = n_enc + n_dec
    ws, bs = flat[:n_w], flat[n_w:]
    enc = [{"kernel": ws[i], "bias": bs[i][0]} for i in range(n_enc)]
    dec = [{"kernel": ws[n_enc + i], "bias": bs[n_enc + i][0]}
           for i in range(n_dec)]
    return {"encoder": enc, "decoder": dec}


def _find_adam(state):
    """Locate the ScaleByAdamState anywhere in a nested optax chain state."""
    if hasattr(state, "mu"):
        return state
    if isinstance(state, (tuple, list)):
        for s in state:
            r = _find_adam(s)
            if r is not None:
                return r
    return None


def _replace_adam(state, new):
    if hasattr(state, "mu"):
        return new
    if isinstance(state, tuple):
        vals = [_replace_adam(s, new) for s in state]
        return type(state)(*vals) if hasattr(state, "_fields") else tuple(vals)
    return state


def make_fused_trainer(p, steps_per_scan: int, batch_size: int):
    """A drop-in replacement for ``make_scan_trainer`` for the fused config:
    jitted ``(TrainState, data) -> (TrainState, metrics-dict)`` running the
    whole chunk inside one Pallas kernel.

    Keeps the optax ``chain(clip, adam)`` state structure (count/mu/nu) so
    checkpoints stay interchangeable with the XLA path.
    """
    hyper = dict(
        learning_rate=p.learning_rate,
        losses=dict(
            dist_sig_parameters=tuple(p.dist_sig_parameters),
            auto_cost_scale=float(p.auto_cost_scale),
            center_cost_scale=float(p.center_cost_scale),
            l2_reg_constant=float(p.l2_reg_constant),
            distance_cost_scale=float(p.distance_cost_scale),
            periodicity=float(p.periodicity),
        ),
    )

    def chunk(state, data):
        n = data.shape[0]
        rng, sub = jax.random.split(state.rng)
        idx = jax.random.randint(sub, (steps_per_scan, batch_size), 0, n)
        batches = jnp.take(data, idx, axis=0)

        flat, n_enc = split_params(state.params)
        n_dec = len(state.params["decoder"])
        adam_state = _find_adam(state.opt_state)
        mu_flat, _ = split_params(adam_state.mu)
        nu_flat, _ = split_params(adam_state.nu)

        new_flat, new_mu, new_nu, metrics = fused_chunk(
            flat, mu_flat, nu_flat,
            adam_state.count.astype(jnp.float32), batches,
            n_enc=n_enc, hyper=hyper,
        )
        params = join_params(new_flat, n_enc, n_dec)
        new_adam = adam_state._replace(
            count=adam_state.count + steps_per_scan,
            mu=join_params(new_mu, n_enc, n_dec),
            nu=join_params(new_nu, n_enc, n_dec),
        )
        opt_state = _replace_adam(state.opt_state, new_adam)
        new_state = state.replace(
            params=params, opt_state=opt_state, rng=rng,
            step=state.step + steps_per_scan,
        )
        names = ("auto_loss", "center_loss", "regularization_loss",
                 "distance_loss", "loss")
        return new_state, {k: metrics[:, i] for i, k in enumerate(names)}

    return jax.jit(chunk, donate_argnums=(0,))
