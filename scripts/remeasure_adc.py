# scripts/remeasure_adc.py
"""Re-measure the 158-residue ADC step after round-3 optimizations, and
micro-ablate the cartesian_pwd_matrix method (direct vs Gram vs centered
Gram at n=158, d=3) to pick the default.

Run: python scripts/remeasure_adc.py
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

from ablate_adc import make_cvs, time_step  # noqa: E402


def micro_pwd(method: str, center: bool, n: int = 158, B: int = 256,
              iters: int = 200) -> float:
    """us per fwd+bwd of a mean-square matrix loss through pairwise_dist."""
    import jax
    import jax.numpy as jnp

    from encodermap_tpu.ops.distances import pairwise_dist

    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(0, 40, (B, n, 3)).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(0, 10, (B, n, n)).astype(np.float32))

    def loss(x, shift):
        x = x + shift
        if center:
            x = x - jnp.mean(x, axis=1, keepdims=True)
        d = pairwise_dist(x, method=method)
        return jnp.mean(jnp.square(d - tgt))

    g = jax.grad(loss)

    @jax.jit
    def loop(x):
        def body(i, acc):
            return acc + g(x, i.astype(jnp.float32) * 1e-5)[0, 0, 0]

        return jax.lax.fori_loop(0, iters, body, jnp.asarray(0.0))

    float(np.asarray(loop(pts)))  # compile+warm
    t0 = time.perf_counter()
    out = loop(pts)
    float(np.asarray(out))
    return (time.perf_counter() - t0) / iters * 1e6


def main() -> None:
    from encodermap_tpu import ADCParameters
    from encodermap_tpu.train.adc_autoencoder import (
        AngleDihedralCartesianEncoderMap,
    )

    results = {}
    for name, method, center in (
        ("pwd_direct", "direct", False),
        ("pwd_gram", "gram", False),
        ("pwd_gram_centered", "gram", True),
    ):
        us = micro_pwd(method, center)
        results[name] = us
        print(json.dumps({"variant": name, "us_fwd_bwd": round(us, 1)}),
              flush=True)

    for n_res in (158, 20):
        cvs = make_cvs(n_res, 2048)
        emap = AngleDihedralCartesianEncoderMap(
            cvs,
            ADCParameters(
                cartesian_pwd_start=1, cartesian_pwd_step=3,  # CA atoms
                batch_size=256, n_steps=10**9, steps_per_scan=500,
                use_backbone_angles=True, use_sidechains=True, seed=0,
                n_neurons=[128, 128, 2],
            ),
            read_only=True,
        )
        sec = time_step(emap)
        results[f"full_step_{n_res}res"] = sec * 1e6
        print(json.dumps({"variant": f"full_step_{n_res}res",
                          "us_per_step": round(sec * 1e6, 1),
                          "samples_per_sec": round(256 / sec, 1)}), flush=True)

    with open("/root/repo/docs/adc_remeasure_r3.json", "w") as f:
        json.dump({k: round(v, 1) for k, v in results.items()}, f, indent=1)


if __name__ == "__main__":
    main()
