# scripts/ablate_adc.py
"""Ablation timing of the 158-residue (lysozyme-scale) ADC train step on the
real TPU: times the full step and variants with individual loss terms / the
backmap scan removed, to locate where the ~1 ms step goes.

Writes one JSON line per variant to stdout and a summary to
docs/adc_ablation_r3.json. Run: python scripts/ablate_adc.py [n_res]
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


def make_cvs(n_res: int, n_frames: int) -> dict:
    from tests.reference_impl import backmap_np

    rng = np.random.default_rng(0)
    n_atoms = 3 * n_res
    angles = rng.uniform(1.6, 2.4, (n_frames, n_atoms - 2)).astype(np.float32)
    dihedrals = rng.uniform(-np.pi, np.pi, (n_frames, n_atoms - 3)).astype(
        np.float32)
    distances = rng.uniform(0.13, 0.155, (n_frames, n_atoms - 1)).astype(
        np.float32)
    cart = backmap_np(distances[:256], angles[:256], dihedrals[:256]).astype(
        np.float32)
    cart = np.tile(cart, (n_frames // 256, 1, 1))
    side = rng.uniform(-np.pi, np.pi, (n_frames, 2 * n_res)).astype(np.float32)
    return {
        "central_angles": angles, "central_dihedrals": dihedrals,
        "central_cartesians": cart, "central_distances": distances,
        "side_dihedrals": side,
    }


def time_step(emap, steps_per_scan=200, n_chunks=3) -> float:
    """Seconds per optimizer step (host-read synced)."""
    trainer = emap._get_trainer(steps_per_scan)
    data = emap._device_data()
    state = emap.state
    state, metrics = trainer(state, data)  # compile + warm
    float(np.asarray(metrics["loss"])[-1])
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        state, metrics = trainer(state, data)
    final = float(np.asarray(metrics["loss"])[-1])
    dt = time.perf_counter() - t0
    assert np.isfinite(final), final
    return dt / (n_chunks * steps_per_scan)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from encodermap_tpu import ADCParameters
    from encodermap_tpu import losses as L
    from encodermap_tpu.models import adc
    from encodermap_tpu.train.adc_autoencoder import (
        AngleDihedralCartesianEncoderMap,
    )

    n_res = int(sys.argv[1]) if len(sys.argv) > 1 else 158
    cvs = make_cvs(n_res, 1024)
    p_kw = dict(
        batch_size=256, n_steps=10**9, steps_per_scan=500,
        use_backbone_angles=True, use_sidechains=True, seed=0,
        n_neurons=[128, 128, 2],
    )

    orig_backmap = adc.backmap_op
    orig_cart_mat = L.cartesian_loss_matrix
    orig_cdist = L.cartesian_distance_loss
    orig_dist = L.distance_loss

    def fake_backmap(d, a, x):
        # same output shape + real grad deps, no scan: isolates the cost of
        # the backmap fwd+bwd while keeping the downstream pairwise work
        B, na = a.shape
        pad_a = jnp.pad(a, ((0, 0), (0, 2)))
        pad_x = jnp.pad(x, ((0, 0), (0, 3)))
        pad_d = jnp.pad(d, ((0, 0), (0, 1)))
        return jnp.stack([pad_a, pad_x, pad_d], axis=-1)

    def zero_loss(*a, **k):
        return jnp.asarray(0.0, jnp.float32)

    results = {}

    def run(name, patches):
        saved = []
        for mod, attr, val in patches:
            saved.append((mod, attr, getattr(mod, attr)))
            setattr(mod, attr, val)
        try:
            emap = AngleDihedralCartesianEncoderMap(
                cvs, ADCParameters(**p_kw), read_only=True)
            sec = time_step(emap)
        finally:
            for mod, attr, val in saved:
                setattr(mod, attr, val)
        results[name] = sec
        print(json.dumps({"variant": name, "us_per_step": round(sec * 1e6, 1),
                          "samples_per_sec": round(256 / sec, 1)}), flush=True)

    run("full", [])
    run("backmap_stopgrad",
        [(adc, "backmap_op",
          lambda d, a, x: jax.lax.stop_gradient(orig_backmap(d, a, x)))])
    run("no_backmap", [(adc, "backmap_op", fake_backmap)])
    run("no_cartesian_matrix_loss", [(L, "cartesian_loss_matrix", zero_loss)])
    run("no_cartesian_distance_loss",
        [(L, "cartesian_distance_loss", zero_loss),
         (L, "cartesian_distance_loss_matrix", zero_loss)])
    run("no_distance_loss", [(L, "distance_loss", zero_loss)])
    run("no_sigmoid_losses", [(L, "cartesian_distance_loss", zero_loss),
                              (L, "cartesian_distance_loss_matrix", zero_loss),
                              (L, "distance_loss", zero_loss)])
    run("mlp_only", [(adc, "backmap_op", fake_backmap),
                     (L, "cartesian_loss_matrix", zero_loss),
                     (L, "cartesian_distance_loss", zero_loss),
                     (L, "cartesian_distance_loss_matrix", zero_loss),
                     (L, "distance_loss", zero_loss)])

    out = {"n_res": n_res, "batch": 256, "us_per_step": {
        k: round(v * 1e6, 1) for k, v in results.items()}}
    suffix = "" if n_res == 158 else f"_{n_res}res"
    with open(f"/root/repo/docs/adc_ablation_r3{suffix}.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
