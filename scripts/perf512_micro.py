# scripts/perf512_micro.py
"""Round-4 micro-ablation of the 512-residue ADC step's dominant stages —
the backmap fwd+bwd (n_atoms = 1536) and the cartesian-cost stages
(n = 512 CA atoms) — plus candidate redesigns, timed on the real TPU with
a fori_loop to amortize tunnel dispatch.

EVERY input tensor is perturbed by the loop index: XLA hoists
loop-invariant subgraphs out of fori_loop (LICM), so an unperturbed
operand measures as FREE (the first version of this harness under-counted
the input-side pairwise matrix and chain_in_plane this way).

Usage: python scripts/perf512_micro.py [variant ...]
  (no args = run the default battery; each variant prints one JSON line)
"""

from __future__ import annotations

import os as _os

_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

B, NRES = 256, 512
NATOMS = 3 * NRES  # backbone atoms
NCA = NRES

_HIGH = jax.lax.Precision.HIGH


def _timeit(fn, *args, iters=50):
    """us per call of fn(*jittered_args) via an on-device fori_loop.
    ``fn`` receives each arg perturbed by ``i * 1e-7`` (defeats LICM)."""

    @jax.jit
    def loop(*a):
        def body(i, acc):
            eps = i.astype(jnp.float32) * 1e-7
            return acc + fn(*[x + eps for x in a])

        return jax.lax.fori_loop(0, iters, body, jnp.asarray(0.0))

    out = loop(*args)
    float(np.asarray(out))  # compile + warm (host read = only real sync)
    t0 = time.perf_counter()
    out = loop(*args)
    float(np.asarray(out))
    return (time.perf_counter() - t0) / iters * 1e6


def _inputs():
    from tests.reference_impl import backmap_np

    rng = np.random.default_rng(0)
    d = rng.uniform(0.13, 0.155, (B, NATOMS - 1)).astype(np.float32)
    a = rng.uniform(1.6, 2.4, (B, NATOMS - 2)).astype(np.float32)
    dih = rng.uniform(-np.pi, np.pi, (B, NATOMS - 3)).astype(np.float32)
    cart = backmap_np(d[:8], a[:8], dih[:8]).astype(np.float32)
    cart = np.tile(cart, (B // 8, 1, 1))
    ca = cart[:, 1::3, :]
    lat = rng.standard_normal((B, 2)).astype(np.float32)
    return (jnp.asarray(d), jnp.asarray(a), jnp.asarray(dih),
            jnp.asarray(cart), jnp.asarray(ca), jnp.asarray(lat))


D, A, DIH, CART, CA, LAT = None, None, None, None, None, None


def bm_fwd():
    from encodermap_tpu.ops.backmap import backmap

    def f(d, a, dih):
        out = backmap(d, a, dih)
        return jnp.sum(out[:, -1])

    return _timeit(f, D, A, DIH)


def bm_fwdbwd():
    from encodermap_tpu.ops.backmap import backmap

    def loss(d, a, dih):
        out = backmap(d, a, dih)
        return jnp.sum(jnp.square(out[:, 2:] - out[:, :-2]))

    g = jax.grad(loss, argnums=(0, 1, 2))

    def f(d, a, dih):
        gs = g(d, a, dih)
        return gs[0][0, 0] + gs[1][0, 0] + gs[2][0, 0]

    return _timeit(f, D, A, DIH)


def _dense_losses(which):
    from encodermap_tpu import ADCParameters
    from encodermap_tpu import losses as L
    from encodermap_tpu.ops.distances import pairwise_dist

    p = ADCParameters(batch_size=B)

    def loss(out_xyz, lat, inp_xyz):
        inp_mat = pairwise_dist(jax.lax.stop_gradient(inp_xyz))
        total = jnp.asarray(0.0)
        if which in ("both", "cart"):
            out_mat = pairwise_dist(out_xyz)
            total += L.cartesian_loss_matrix(inp_mat, out_mat, p, scale=1.0)
        if which in ("both", "cdist"):
            total += L.cartesian_distance_loss_matrix(inp_mat, lat, p)
        return total

    g = jax.grad(loss, argnums=(0, 1))

    def f(out_xyz, lat, inp_xyz):
        gs = g(out_xyz, lat, inp_xyz)
        return gs[0][0, 0, 0] + gs[1][0, 0]

    return _timeit(f, CA, LAT, CA)


def dense_both():
    return _dense_losses("both")


def dense_cart():
    return _dense_losses("cart")


def dense_cdist():
    return _dense_losses("cdist")


def blocked_both_old():
    """The shipped (round-4 snapshot) scan-over-moveaxis'd-blocks path."""
    from encodermap_tpu import ADCParameters
    from encodermap_tpu.ops import blocked_cartesian as bc

    p = ADCParameters(batch_size=B)

    def loss(out_xyz, lat, inp_xyz):
        acc, gram = bc.blocked_cartesian_terms(
            jax.lax.stop_gradient(inp_xyz), out_xyz, "mean_abs",
            block=128, with_gram=True)
        total = acc / (NCA * NCA * B)
        total += bc.sigmoid_from_gram(
            gram, lat, tuple(p.cartesian_dist_sig_parameters))
        return total

    g = jax.grad(loss, argnums=(0, 1))

    def f(out_xyz, lat, inp_xyz):
        gs = g(out_xyz, lat, inp_xyz)
        return gs[0][0, 0, 0] + gs[1][0, 0]

    return _timeit(f, CA, LAT, CA)


# ---------------------------------------------------------------------------
# analytic-VJP candidates: no (B, n, n) residual is ever stored; the
# backward recomputes distance rows inside fused reduction expressions
# ---------------------------------------------------------------------------

def _sqrt_guard(d2):
    mask = (d2 == 0.0).astype(d2.dtype)
    return jnp.sqrt(d2 + mask * 1e-16) * (1.0 - mask)


def _dmat(x):
    """(B, n, n) distances as a lazy expression (component planes)."""
    d2 = None
    for c in range(3):
        diff = x[..., c][:, :, None] - x[..., c][:, None, :]
        sq = diff * diff
        d2 = sq if d2 is None else d2 + sq
    return _sqrt_guard(d2)


def _cart_abs_analytic(inp_xyz, out_xyz):
    """sum |D_in - D_out| with a hand-written backward: four fused
    (B,n,n)->(B,n) reductions, nothing materialized across the pass."""

    @jax.custom_vjp
    def loss(out_xyz, inp_xyz):
        return jnp.sum(jnp.abs(_dmat(inp_xyz) - _dmat(out_xyz)))

    def fwd(out_xyz, inp_xyz):
        return loss(out_xyz, inp_xyz), (out_xyz, inp_xyz)

    def bwd(res, g):
        out_xyz, inp_xyz = res
        d_out = _dmat(out_xyz)
        s = jnp.sign(d_out - _dmat(inp_xyz))
        w = jnp.where(d_out > 0.0, s / jnp.maximum(d_out, 1e-16), 0.0)
        row_w = jnp.sum(w, axis=2)  # (B, n)
        comps = []
        for c in range(3):
            xc = out_xyz[..., c]
            wx = jnp.sum(w * xc[:, None, :], axis=2)  # (B, n)
            comps.append(2.0 * g * (xc * row_w - wx))
        return jnp.stack(comps, axis=-1), jnp.zeros_like(inp_xyz)

    loss.defvjp(fwd, bwd)
    return loss(out_xyz, inp_xyz)


def cart_analytic():
    def lossfn(out_xyz, inp_xyz):
        return _cart_abs_analytic(jax.lax.stop_gradient(inp_xyz), out_xyz) / (
            NCA * NCA * B)

    g = jax.grad(lossfn, argnums=(0,))

    def f(out_xyz, inp_xyz):
        return g(out_xyz, inp_xyz)[0][0, 0, 0]

    return _timeit(f, CA, CA)


def gram_f32():
    """CA-sigmoid Gram as ONE f32 matmul over materialized d_in rows."""
    return _gram(jnp.float32)


def gram_bf16():
    return _gram(jnp.bfloat16)


def _gram(dtype):
    from encodermap_tpu import ADCParameters
    from encodermap_tpu.ops import blocked_cartesian as bc

    p = ADCParameters(batch_size=B)

    def loss(lat, inp_xyz):
        d_in = _dmat(jax.lax.stop_gradient(inp_xyz))
        v = d_in.reshape(B, -1).astype(dtype)
        gram = jax.lax.dot_general(
            v, v, (((1,), (1,)), ((), ())),
            precision=_HIGH if dtype == jnp.float32 else None,
            preferred_element_type=jnp.float32)
        return bc.sigmoid_from_gram(
            gram, lat, tuple(p.cartesian_dist_sig_parameters))

    g = jax.grad(loss, argnums=(0,))

    def f(lat, inp_xyz):
        return g(lat, inp_xyz)[0][0, 0]

    return _timeit(f, LAT, CA)


def combo_analytic():
    """cart_analytic + gram_bf16 together (the candidate production path)."""
    from encodermap_tpu import ADCParameters
    from encodermap_tpu.ops import blocked_cartesian as bc

    p = ADCParameters(batch_size=B)

    def loss(out_xyz, lat, inp_xyz):
        inp_xyz = jax.lax.stop_gradient(inp_xyz)
        total = _cart_abs_analytic(inp_xyz, out_xyz) / (NCA * NCA * B)
        d_in = _dmat(inp_xyz)
        v = d_in.reshape(B, -1).astype(jnp.bfloat16)
        gram = jax.lax.dot_general(
            v, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        total += bc.sigmoid_from_gram(
            gram, lat, tuple(p.cartesian_dist_sig_parameters))
        return total

    g = jax.grad(loss, argnums=(0, 1))

    def f(out_xyz, lat, inp_xyz):
        gs = g(out_xyz, lat, inp_xyz)
        return gs[0][0, 0, 0] + gs[1][0, 0]

    return _timeit(f, CA, LAT, CA)


VARIANTS = {
    k: v for k, v in list(globals().items())
    if callable(v) and not k.startswith("_") and k == k.lower()
    and k not in ("main",)
}


def main():
    global D, A, DIH, CART, CA, LAT
    VARIANTS.update(
        (k, v) for k, v in globals().items()
        if callable(v) and not k.startswith("_") and k == k.lower()
        and k != "main"
    )
    D, A, DIH, CART, CA, LAT = _inputs()
    names = sys.argv[1:] or [
        "bm_fwd", "bm_fwdbwd", "dense_both", "dense_cart", "dense_cdist",
        "blocked_both_old", "cart_analytic", "gram_f32", "gram_bf16",
        "combo_analytic",
    ]
    out_path = "/root/repo/docs/perf512_micro_r4.json"
    try:  # merge across invocations: each run measures a subset
        with open(out_path) as fh:
            results = json.load(fh).get("us", {})
    except (OSError, ValueError):
        results = {}
    for name in names:
        us = VARIANTS[name]()
        results[name] = round(us, 1)
        print(json.dumps({"variant": name, "us": round(us, 1)}), flush=True)
    with open(out_path, "w") as fh:
        json.dump({"B": B, "n_res": NRES, "us": results}, fh, indent=1)




def _cart_abs_wmatmul(inp_xyz, out_xyz, wdtype=jnp.float32):
    """Analytic backward with the four reductions folded into ONE batched
    matmul W @ [X | 1] (W = sign/d, materialized once in ``wdtype``)."""

    @jax.custom_vjp
    def loss(out_xyz, inp_xyz):
        return jnp.sum(jnp.abs(_dmat(inp_xyz) - _dmat(out_xyz)))

    def fwd(out_xyz, inp_xyz):
        return loss(out_xyz, inp_xyz), (out_xyz, inp_xyz)

    def bwd(res, g):
        out_xyz, inp_xyz = res
        d_out = _dmat(out_xyz)
        s = jnp.sign(d_out - _dmat(inp_xyz))
        w = jnp.where(d_out > 0.0, s / jnp.maximum(d_out, 1e-16), 0.0)
        w = w.astype(wdtype)
        feats = jnp.concatenate(
            [out_xyz, jnp.ones(out_xyz.shape[:2] + (1,), out_xyz.dtype)],
            axis=-1).astype(wdtype)  # (B, n, 4)
        red = jax.lax.dot_general(
            w, feats, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (B, n, 4)
        wx, row_w = red[..., :3], red[..., 3:]
        return (2.0 * g * (out_xyz * row_w - wx)).astype(out_xyz.dtype), \
            jnp.zeros_like(inp_xyz)

    loss.defvjp(fwd, bwd)
    return loss(out_xyz, inp_xyz)


def _cart_w(wdtype):
    def lossfn(out_xyz, inp_xyz):
        return _cart_abs_wmatmul(
            jax.lax.stop_gradient(inp_xyz), out_xyz, wdtype) / (NCA * NCA * B)

    g = jax.grad(lossfn, argnums=(0,))

    def f(out_xyz, inp_xyz):
        return g(out_xyz, inp_xyz)[0][0, 0, 0]

    return _timeit(f, CA, CA)


def cart_wmatmul_f32():
    return _cart_w(jnp.float32)


def cart_wmatmul_bf16():
    return _cart_w(jnp.bfloat16)


def gram_coords_bf16():
    """Gram with the whole d_in computation in bf16 from the coords."""
    from encodermap_tpu import ADCParameters
    from encodermap_tpu.ops import blocked_cartesian as bc

    p = ADCParameters(batch_size=B)

    def loss(lat, inp_xyz):
        x16 = jax.lax.stop_gradient(inp_xyz).astype(jnp.bfloat16)
        v = _dmat(x16).reshape(B, -1)
        gram = jax.lax.dot_general(
            v, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return bc.sigmoid_from_gram(
            gram, lat, tuple(p.cartesian_dist_sig_parameters))

    g = jax.grad(loss, argnums=(0,))

    def f(lat, inp_xyz):
        return g(lat, inp_xyz)[0][0, 0]

    return _timeit(f, LAT, CA)


def combo_best():
    """cart_wmatmul_bf16 + gram_bf16: candidate production pair."""
    from encodermap_tpu import ADCParameters
    from encodermap_tpu.ops import blocked_cartesian as bc

    p = ADCParameters(batch_size=B)

    def loss(out_xyz, lat, inp_xyz):
        inp_xyz = jax.lax.stop_gradient(inp_xyz)
        total = _cart_abs_wmatmul(inp_xyz, out_xyz, jnp.bfloat16) / (
            NCA * NCA * B)
        v = _dmat(inp_xyz).reshape(B, -1).astype(jnp.bfloat16)
        gram = jax.lax.dot_general(
            v, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        total += bc.sigmoid_from_gram(
            gram, lat, tuple(p.cartesian_dist_sig_parameters))
        return total

    g = jax.grad(loss, argnums=(0, 1))

    def f(out_xyz, lat, inp_xyz):
        gs = g(out_xyz, lat, inp_xyz)
        return gs[0][0, 0, 0] + gs[1][0, 0]

    return _timeit(f, CA, LAT, CA)


def bm_fwdbwd_half():
    """backmap fwd+bwd at half the chain (256 res): linear-in-n check."""
    from encodermap_tpu.ops.backmap import backmap

    d, a, dih = D[:, :767], A[:, :766], DIH[:, :765]

    def loss(d, a, dih):
        out = backmap(d, a, dih)
        return jnp.sum(jnp.square(out[:, 2:] - out[:, :-2]))

    g = jax.grad(loss, argnums=(0, 1, 2))

    def f(d, a, dih):
        gs = g(d, a, dih)
        return gs[0][0, 0] + gs[1][0, 0] + gs[2][0, 0]

    return _timeit(f, d, a, dih)


def bm_fwdbwd_b64():
    """backmap fwd+bwd at batch 64: dispatch/op-count-bound check."""
    from encodermap_tpu.ops.backmap import backmap

    d, a, dih = D[:64], A[:64], DIH[:64]

    def loss(d, a, dih):
        out = backmap(d, a, dih)
        return jnp.sum(jnp.square(out[:, 2:] - out[:, :-2]))

    g = jax.grad(loss, argnums=(0, 1, 2))

    def f(d, a, dih):
        gs = g(d, a, dih)
        return gs[0][0, 0] + gs[1][0, 0] + gs[2][0, 0]

    return _timeit(f, d, a, dih)


if __name__ == "__main__":
    main()
