# scripts/slab_stats_experiment.py
"""Measure the statistical cost of slab sampling (HDF5BatchSource's
one-contiguous-window-per-superbatch design, train/core.py) on a
deliberately time-ordered dataset, vs uniform in-memory sampling.

The dataset is a smooth feature-space walk: frame i's features are smooth
functions of i, so a contiguous slab covers only a narrow region of feature
space and successive batches within a superbatch are strongly correlated --
the worst case for slab reads. Both runs share the same seed (identical
init); only batch sampling differs. Quality metric: total EncoderMap loss
on fixed uniform probe batches, evaluated with each trained model.

Usage: python scripts/slab_stats_experiment.py [n_steps] [slab_frames] [n_windows]
"""

from __future__ import annotations

import os as _os

_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import json
import sys
import tempfile

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

from encodermap_tpu import EncoderMap, Parameters  # noqa: E402
from encodermap_tpu.train.core import HDF5BatchSource  # noqa: E402


def make_timeordered(n=8192, d=6, noise=0.05, seed=7):
    t = np.linspace(0.0, 4 * np.pi, n)
    cols = [np.sin(t), np.cos(t), np.sin(2 * t), np.cos(2 * t),
            0.5 * np.sin(3 * t), 0.5 * np.cos(3 * t)]
    data = np.stack(cols[:d], axis=1)
    rng = np.random.default_rng(seed)
    return (data + noise * rng.standard_normal(data.shape)).astype(np.float32)


def probe_loss(emap, data, k=8, batch=256, seed=123):
    rng = np.random.default_rng(seed)
    vals = []
    for _ in range(k):
        rows = rng.integers(0, len(data), batch)
        b = jax.numpy.asarray(data[rows])
        terms, _ = emap._loss_and_aux(emap.state.params, b, emap.state.step)
        vals.append(float(sum(jax.numpy.asarray(v) for v in terms.values())))
    return float(np.mean(vals))


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    slab = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    n_windows = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    data = make_timeordered()

    def params(tmp):
        return Parameters(
            main_path=tmp, periodicity=float("inf"),
            n_neurons=[16, 16, 2], n_steps=n_steps, steps_per_scan=16,
            batch_size=64, seed=0, summary_step=10**9,
            checkpoint_step=10**9,
        )

    out = {"n_steps": n_steps, "slab_frames": slab, "n_windows": n_windows,
           "n_frames": len(data)}

    with tempfile.TemporaryDirectory() as tmp:
        emap0 = EncoderMap(params(tmp + "/init"), data, read_only=True)
        out["loss_init"] = probe_loss(emap0, data)

        emap_u = EncoderMap(params(tmp + "/uniform"), data, read_only=True)
        emap_u.train()
        out["loss_uniform"] = probe_loss(emap_u, data)

        import h5py

        h5path = tmp + "/cvs.h5"
        with h5py.File(h5path, "w") as f:
            f.create_group("CVs").create_dataset("features", data=data)

        emap_s = EncoderMap(params(tmp + "/slab"), data[:64], read_only=True)

        class Source:
            def __init__(self):
                self.inner = HDF5BatchSource(
                    h5path, ["features"], batch_size=64, steps_per_scan=16,
                    slab_frames=slab, seed=1, n_windows=n_windows,
                )

            def __iter__(self):
                return self

            def __next__(self):
                return next(self.inner)[0]

        emap_s.train_streaming(Source(), n_steps=n_steps)
        out["loss_slab"] = probe_loss(emap_s, data)

    out["slab_over_uniform"] = out["loss_slab"] / out["loss_uniform"]
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
