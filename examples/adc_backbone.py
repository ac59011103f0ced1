# examples/adc_backbone.py
"""AngleDihedralCartesianEncoderMap example on real MD data: featurize a
trajectory, train on internal coordinates, generate new conformations
(the TPU equivalent of the reference's ``examples/trp_cage.py`` /
``dihedral_to_cartesian_diubi.py`` workflows)."""

import os

import numpy as np

import encodermap_tpu as em

TRAJ = "/root/reference/tests/data/asp7.xtc"
TOP = "/root/reference/tests/data/asp7.pdb"

# CI hook: tests/test_examples.py runs every example with a tiny step count
N_STEPS = int(os.environ.get("EM_EXAMPLE_STEPS", "1000"))


def main() -> None:
    trajs = em.TrajEnsemble([em.load(TRAJ, TOP)])
    trajs.load_CVs("all")

    parameters = em.ADCParameters(
        cartesian_pwd_start=1, cartesian_pwd_step=3,  # CA atoms
        main_path="runs/adc",
        n_steps=N_STEPS,
        steps_per_scan=min(100, N_STEPS),
        use_backbone_angles=True,
        use_sidechains=True,
        cartesian_cost_scale_soft_start=(100, 500),
        track_clashes=True,
    )
    emap = em.AngleDihedralCartesianEncoderMap(trajs, parameters)
    emap.train_for_references()
    history = emap.train()
    print(f"final loss: {history['loss'][-1]:.4f}")

    latent = emap.encode()
    conformations = emap.generate(latent[:10])
    print("generated backbone conformations:", conformations.shape)

    from encodermap_tpu.plot import plot_free_energy

    plot_free_energy(latent, save_path="runs/adc/free_energy.png")
    print("wrote runs/adc/free_energy.png")


if __name__ == "__main__":
    main()
