# scripts/memory_analysis_r4.py
"""Compiled-program memory analysis of the ADC train step: dense vs
analytic vs blocked cartesian routes at large n — the memory half of the
round-4 routing decision (docs/perf_r4.md). Uses XLA's
``compiled.memory_analysis()`` (no execution), so it also works for
configurations too large to run.

Usage: python scripts/memory_analysis_r4.py <n_res> <variant> [batch]
"""

from __future__ import annotations

import os as _os

_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")


def main() -> None:
    n_res = int(sys.argv[1])
    variant = sys.argv[2]
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 256

    import jax

    from ablate_adc import make_cvs
    from encodermap_tpu import ADCParameters
    from encodermap_tpu.train import adc_autoencoder as A
    from encodermap_tpu.train.adc_autoencoder import (
        AngleDihedralCartesianEncoderMap,
    )

    if variant == "dense":
        A.MIN_BLOCKED_ATOMS = 10**9
        A.MIN_ANALYTIC_ATOMS = 10**9
    elif variant == "analytic":
        A.MIN_BLOCKED_ATOMS = 10**9
        A.MIN_ANALYTIC_ATOMS = 1
    else:
        A.MIN_BLOCKED_ATOMS = 1

    cvs = make_cvs(n_res, max(batch, 256))
    p = ADCParameters(
        cartesian_pwd_start=1, cartesian_pwd_step=3,
        batch_size=batch, n_steps=10**9, steps_per_scan=1,
        use_backbone_angles=True, use_sidechains=True, seed=0,
        n_neurons=[128, 128, 2],
    )
    emap = AngleDihedralCartesianEncoderMap(cvs, p, read_only=True)
    step = emap._make_train_step()
    order = ("central_angles", "central_dihedrals", "central_cartesians",
             "central_distances", "side_dihedrals")
    b = tuple(np.asarray(cvs[k][:batch], np.float32) for k in order)
    compiled = jax.jit(step).lower(emap.state, b).compile()
    m = compiled.memory_analysis()
    print(json.dumps({
        "n_res": n_res, "variant": variant, "batch": batch,
        "temp_gib": round(m.temp_size_in_bytes / 2**30, 3),
        "argument_gib": round(m.argument_size_in_bytes / 2**30, 3),
        "output_gib": round(m.output_size_in_bytes / 2**30, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
