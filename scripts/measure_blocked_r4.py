# scripts/measure_blocked_r4.py
"""Round-4 ablation: dense (B,n,n)-matrix cartesian losses vs the blocked
remat scan (ops/blocked_cartesian.py) on the real TPU, across chain lengths.

Usage: python scripts/measure_blocked_r4.py <n_res> <variant> [block] [sel]
  variant: dense | analytic | blocked
  block:   row-block size for the blocked path (default 128)
  sel:     'ca' (default; cartesian_pwd_start=1/step=3 like every r3 scale
           measurement, so n pairwise atoms == n_res) or 'all' (the
           reference's all-atom default: n == 3*n_res)

Prints one JSON line; aggregate results land in docs/blocked_ablation_r4.json
(hand-collected across invocations — each variant is a separate process so a
remote-compile hang can't take the whole campaign down).
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
sys.path.insert(0, "/root/repo/scripts")

from ablate_adc import make_cvs, time_step  # noqa: E402


def main() -> None:
    n_res = int(sys.argv[1])
    variant = sys.argv[2]
    block = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    sel = sys.argv[4] if len(sys.argv) > 4 else "ca"

    from encodermap_tpu import ADCParameters
    from encodermap_tpu import losses as L
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
        if block != 128:
            orig = L.cartesian_losses_blocked

            def with_block(*a, **k):
                k["block"] = block
                return orig(*a, **k)

            L.cartesian_losses_blocked = with_block

    steps = 500 if n_res <= 320 else (200 if n_res <= 512 else 100)
    cvs = make_cvs(n_res, 1024)
    sel_kw = (
        dict(cartesian_pwd_start=1, cartesian_pwd_step=3)
        if sel == "ca" else {}
    )
    p = ADCParameters(
        batch_size=256, n_steps=10**9, steps_per_scan=steps,
        use_backbone_angles=True, use_sidechains=True, seed=0,
        n_neurons=[128, 128, 2], **sel_kw,
    )
    emap = AngleDihedralCartesianEncoderMap(cvs, p, read_only=True)
    sec = time_step(emap, steps_per_scan=steps, n_chunks=3)
    print(json.dumps({
        "n_res": n_res, "sel": sel, "variant": variant,
        "block": block if variant == "blocked" else None,
        "us_per_step": round(sec * 1e6, 1),
        "samples_per_sec": round(256 / sec, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
