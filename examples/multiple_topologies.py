# examples/multiple_topologies.py
"""Train ONE AngleDihedralCartesianEncoderMap on two different proteins —
the TPU analog of the reference's intermediate tutorial 02 ("training with
different topologies",
``/root/reference/tutorials/notebooks_intermediate/02_training_with_different_topologies.ipynb``):
load Glu7 and Asp7 into one ensemble, featurize with ``ensemble=True`` so
per-residue CVs are NaN-aligned across the two topologies, train the sparse
ADC model on the union feature space, and compare the two proteins in the
shared latent space."""

import os
from pathlib import Path

import numpy as np

import encodermap_tpu as em

DATA = Path("/root/reference/tests/data")

# CI hook: tests/test_examples.py runs every example with a tiny step count
N_STEPS = int(os.environ.get("EM_EXAMPLE_STEPS", "1000"))


def main() -> None:
    trajs = em.load(
        [str(DATA / "glu7.xtc"), str(DATA / "asp7.xtc")],
        [str(DATA / "glu7.pdb"), str(DATA / "asp7.pdb")],
    )
    # ensemble=True aligns CVs across the two topologies: features a
    # topology lacks are NaN-filled, so every frame lives in one union
    # feature space (reference ``trajinfo_utils.py:2150+``).
    trajs.load_CVs("all", ensemble=True)
    print("aligned CV shapes:",
          {k: v.shape for k, v in trajs.CVs.items()})

    parameters = em.ADCParameters(
        cartesian_pwd_start=1, cartesian_pwd_step=3,  # CA atoms
        main_path=em.misc.run_path("runs/multi_top"),
        n_steps=N_STEPS,
        steps_per_scan=min(100, N_STEPS),
        use_backbone_angles=True,
        use_sidechains=True,
        distance_cost_scale=1,
        auto_cost_scale=0.1,
        cartesian_cost_scale_soft_start=(min(50, N_STEPS // 2),
                                         min(80, N_STEPS)),
    )
    # NaN-aligned inputs route through the sparse/masked-dense ADC model
    emap = em.AngleDihedralCartesianEncoderMap(trajs, parameters)
    history = emap.train()
    print(f"final loss: {history['loss'][-1]:.4f}")

    # Shared latent space: one projection, colored per protein.
    latent = emap.encode()
    ids = np.concatenate(
        [np.full(t.n_frames, i) for i, t in enumerate(trajs)]
    )
    em.plot.plot_latent_scatter(
        latent, colors=ids,
        save_path=str(Path(parameters.main_path) / "glu7_vs_asp7.png"),
    )
    glu7_lowd, asp7_lowd = latent[ids == 0], latent[ids == 1]
    print("glu7 frames:", glu7_lowd.shape, "asp7 frames:", asp7_lowd.shape)

    # Generating from a latent point backmaps through a chosen topology.
    conformations = emap.generate(latent[:4], backend="topology", top=trajs[1])
    print("generated asp7 conformations:", conformations.shape)


if __name__ == "__main__":
    main()
