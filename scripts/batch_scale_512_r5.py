# scripts/batch_scale_512_r5.py
"""Round-5 campaign (VERDICT r4 #1): does the analytic route's freed
(B, n, n) memory cash out as 512-residue throughput at larger batches?

Measures the FULL ADC train step (7 losses, in-graph backmap, Adam) at
512 residues / CA selection for one batch size per process invocation
(hang isolation: every remote-tunnel compile is a multi-minute RPC).

Usage: python scripts/batch_scale_512_r5.py <batch> [n_res] [steps_per_scan]

Prints one JSON line; aggregate lands in docs/adc_batch_scale_r5.json.
"""

from __future__ import annotations

import os as _os

_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")


def main() -> None:
    batch = int(sys.argv[1])
    n_res = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    steps_per_scan = int(sys.argv[3]) if len(sys.argv) > 3 else 40

    from ablate_adc import make_cvs
    from encodermap_tpu import ADCParameters
    from encodermap_tpu.train.adc_autoencoder import (
        AngleDihedralCartesianEncoderMap,
    )

    n_frames = max(1024, batch)
    cvs = make_cvs(n_res, n_frames)
    p = ADCParameters(
        cartesian_pwd_start=1, cartesian_pwd_step=3,  # CA selection
        batch_size=batch, n_steps=10**9, steps_per_scan=steps_per_scan,
        use_backbone_angles=True, use_sidechains=True, seed=0,
        n_neurons=[128, 128, 2],
    )
    emap = AngleDihedralCartesianEncoderMap(cvs, p, read_only=True)
    trainer = emap._get_trainer()
    data = emap._device_data()
    state = emap.state
    state, metrics = trainer(state, data)  # compile + warm
    float(np.asarray(metrics["loss"])[-1])
    n_chunks = 3
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        state, metrics = trainer(state, data)
    final = float(np.asarray(metrics["loss"])[-1])
    dt = time.perf_counter() - t0
    assert np.isfinite(final), final
    steps = n_chunks * steps_per_scan
    print(json.dumps({
        "n_res": n_res, "batch": batch, "sel": "ca",
        "steps_per_scan": steps_per_scan,
        "step_us": round(dt / steps * 1e6, 1),
        "samples_per_sec": round(steps * batch / dt, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
