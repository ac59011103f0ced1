# examples/streaming_multichip.py
"""Production-scale recipe: out-of-core streaming + multi-chip training.

Featurize an ensemble once, save it, then train the ADC model with the
CVs never fully materializing in RAM — batches stream lazily from HDF5
with a prefetch thread overlapping device compute — and the train step
SPMD-sharded over a device mesh (set ``mesh_shape`` to your topology,
e.g. ``{"dp": 4}`` on a v5e-4).

Run on CPU for a demo: JAX_PLATFORMS=cpu \
XLA_FLAGS=--xla_force_host_platform_device_count=8 python \
examples/streaming_multichip.py
"""

import os

import numpy as np

import encodermap_tpu as em
from encodermap_tpu.train.adc_autoencoder import (
    AngleDihedralCartesianEncoderMap,
)

# CI hook: tests/test_examples.py runs every example with a tiny step count
N_STEPS = int(os.environ.get("EM_EXAMPLE_STEPS", "500"))

TRAJS = ["/root/reference/tests/data/asp7.xtc",
         "/root/reference/tests/data/glu7.xtc"]
TOPS = ["/root/reference/tests/data/asp7.pdb",
        "/root/reference/tests/data/glu7.pdb"]


def main() -> None:
    # 1) featurize the (mixed-topology) ensemble and persist it
    trajs = em.load(TRAJS, TOPS)
    trajs.load_CVs("all", ensemble=True)  # NaN-aligned across topologies
    trajs.save("runs/stream/ens.h5", overwrite=True)

    # 2) build the model from the on-disk shapes (tiny prototype read) and
    #    train fully out-of-core, data-parallel over the available devices
    import jax

    n_dev = len(jax.devices())
    p = em.ADCParameters(
        cartesian_pwd_start=1, cartesian_pwd_step=3,  # CA atoms
        main_path="runs/stream",
        use_backbone_angles=True,
        use_sidechains=True,
        batch_size=64,
        n_steps=N_STEPS,
        steps_per_scan=min(100, N_STEPS),
        mesh_shape={"dp": n_dev} if n_dev > 1 else None,
        seed=0,
    )
    adc = AngleDihedralCartesianEncoderMap.from_ensemble_h5(
        "runs/stream/ens.h5", p
    )
    history = adc.train_streaming("runs/stream/ens.h5")
    print(f"final loss: {history['loss'][-1]:.4f}")

    # 3) generate new conformations straight from latent space
    latent = adc.encode()
    xyz = adc.generate(latent[:10])
    print(f"generated {xyz.shape} conformations")


if __name__ == "__main__":
    main()
