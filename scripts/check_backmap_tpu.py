# scripts/check_backmap_tpu.py
"""TPU-side correctness check of the backmap analytic adjoint's MXU
suffix-sum branch (ops/backmap._suffix_sums takes the matmul path only on
TPU for n >= 96, so CPU tests never exercise it): compares production
jax.grad against the independent analytic oracle (ops/adc_adjoint) on the
same device, plus forward equality. Then times the 158-res ADC step.

Run: python scripts/check_backmap_tpu.py
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


def main() -> None:
    import jax
    import jax.numpy as jnp

    from encodermap_tpu.ops import adc_adjoint as oracle
    from encodermap_tpu.ops.backmap import backmap

    B, n_atoms = 64, 474
    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.uniform(0.13, 0.155, (B, n_atoms - 1)), jnp.float32)
    a = jnp.asarray(rng.uniform(1.6, 2.4, (B, n_atoms - 2)), jnp.float32)
    x = jnp.asarray(rng.uniform(-np.pi, np.pi, (B, n_atoms - 3)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((B, n_atoms, 3)), jnp.float32)

    @jax.jit
    def prod(d, a, x):
        out = backmap(d, a, x)
        loss = jnp.sum(out * w)
        ga, gx = jax.grad(
            lambda a_, x_: jnp.sum(backmap(d, a_, x_) * w), argnums=(0, 1)
        )(a, x)
        return out, loss, ga, gx

    @jax.jit
    def orac(d, a, x):
        out, res = oracle._backmap_fwd(d, a, x)
        gx, ga = oracle._backmap_bwd(res, w)
        return out, ga, gx

    out_p, loss_p, ga_p, gx_p = map(np.asarray, prod(d, a, x))
    out_o, ga_o, gx_o = map(np.asarray, orac(d, a, x))

    fwd_err = np.abs(out_p - out_o).max()
    scale_a = np.abs(ga_o).max()
    scale_x = np.abs(gx_o).max()
    ga_err = np.abs(ga_p - ga_o).max() / scale_a
    gx_err = np.abs(gx_p - gx_o).max() / scale_x
    print(json.dumps({
        "fwd_max_abs_err": float(fwd_err),
        "grad_angles_rel_err": float(ga_err),
        "grad_dihedrals_rel_err": float(gx_err),
    }), flush=True)
    assert fwd_err < 1e-3, fwd_err
    assert ga_err < 1e-3, ga_err
    assert gx_err < 1e-3, gx_err
    print("backmap TPU adjoint (MXU suffix-sum branch) OK", flush=True)

    # re-time the full ADC step with the new adjoint
    from ablate_adc import make_cvs, time_step

    from encodermap_tpu import ADCParameters
    from encodermap_tpu.train.adc_autoencoder import (
        AngleDihedralCartesianEncoderMap,
    )

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
        print(json.dumps({"variant": f"full_step_{n_res}res",
                          "us_per_step": round(sec * 1e6, 1),
                          "samples_per_sec": round(256 / sec, 1)}), flush=True)


if __name__ == "__main__":
    main()
