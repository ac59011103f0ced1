# scripts/precision_and_scale.py
"""Two one-off TPU measurements backing docs/perf_r3.md claims:

1. value drift of the HIGH-precision (3-pass bf16) Gram inside
   cartesian_distance_loss_matrix vs a HIGHEST reference, at lysozyme
   scale — the loss is forward-only on that side, but the docstring
   claims ~1e-7 relative agreement and that should be measured, not
   assumed;
2. ADC train-step scaling beyond lysozyme: 320- and 512-residue steps.

Run: python scripts/precision_and_scale.py
"""

from __future__ import annotations

import os as _os

_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def precision_drift() -> dict:
    import jax
    import jax.numpy as jnp

    from encodermap_tpu import ADCParameters
    from encodermap_tpu import losses as L
    from encodermap_tpu.ops.distances import pairwise_dist

    p = ADCParameters()
    rng = np.random.default_rng(0)
    # realistic scale: chain_in_plane CAs span tens of nm
    pts = jnp.asarray(rng.uniform(0, 40, (256, 158, 3)).astype(np.float32))
    z = jnp.asarray(rng.standard_normal((256, 2)).astype(np.float32))
    mat = pairwise_dist(pts)

    from math import sqrt

    sig_h, a_h, b_h, sig_l, a_l, b_l = p.cartesian_dist_sig_parameters
    params = (sig_h * sqrt(2.0), a_h, b_h, sig_l, a_l, b_l)
    B = mat.shape[0]

    import functools

    @functools.partial(jax.jit, static_argnames=("prec",))
    def val(prec):
        return L.sigmoid_loss(
            mat.reshape(B, -1), z, params, float("inf"), h_precision=prec
        )

    hi = float(np.asarray(val("highest")))
    mid = float(np.asarray(val("high")))
    return {"cdist_highest": hi, "cdist_high": mid,
            "rel_drift": abs(hi - mid) / abs(hi)}


def scale_steps() -> dict:
    from ablate_adc import make_cvs, time_step

    from encodermap_tpu import ADCParameters
    from encodermap_tpu.train.adc_autoencoder import (
        AngleDihedralCartesianEncoderMap,
    )

    out = {}
    for n_res in (320, 512):
        cvs = make_cvs(n_res, 1024)
        emap = AngleDihedralCartesianEncoderMap(
            cvs,
            ADCParameters(
                batch_size=256, n_steps=10**9, steps_per_scan=200,
                use_backbone_angles=True, use_sidechains=True, seed=0,
                n_neurons=[128, 128, 2],
            ),
            read_only=True,
        )
        sec = time_step(emap, steps_per_scan=200, n_chunks=3)
        out[f"adc_{n_res}res_us_per_step"] = round(sec * 1e6, 1)
        out[f"adc_{n_res}res_samples_per_sec"] = round(256 / sec, 1)
        print(json.dumps({f"adc_{n_res}res": round(256 / sec, 1)}), flush=True)
    return out


def main() -> None:
    res = precision_drift()
    print(json.dumps(res), flush=True)
    res.update(scale_steps())
    with open("/root/repo/docs/adc_scale_r3.json", "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
