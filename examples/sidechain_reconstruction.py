# examples/sidechain_reconstruction.py
"""Full-protein (backbone + sidechain) reconstruction with the ADC model.

The reference covers this workflow in its sidechain-reconstruction tests
(``tests/test_autoencoder.py``, reconstruct_sidechains=True); here it runs on
asp7 (7x ASP, chi1+chi2 per residue). The decoder outputs all internal
coordinates and the log-depth sidechain backmap rebuilds every atom."""

import os

import numpy as np

import encodermap_tpu as em

TRAJ = "/root/reference/tests/data/asp7.xtc"
TOP = "/root/reference/tests/data/asp7.pdb"

# CI hook: tests/test_examples.py runs every example with a tiny step count
N_STEPS = int(os.environ.get("EM_EXAMPLE_STEPS", "2000"))


def main() -> None:
    traj = em.load(TRAJ, TOP)
    trajs = em.TrajEnsemble([traj])
    trajs.load_CVs("full")  # 7 CVs incl. side_distances/angles/dihedrals

    parameters = em.ADCParameters(
        main_path="runs/sidechains",
        n_steps=N_STEPS,
        steps_per_scan=min(200, N_STEPS),
        reconstruct_sidechains=True,
        sidechain_info=traj.top.sidechain_info(),
        use_backbone_angles=True,
        use_sidechains=True,
        cartesian_cost_scale_soft_start=(200, 1000),
    )
    emap = em.AngleDihedralCartesianEncoderMap(trajs, parameters)
    emap.train()

    latent = emap.encode()
    xyz = emap.generate(latent[:10])  # (10, n_atoms, 3) — every atom
    print("generated all-atom conformations:", xyz.shape)

    from encodermap_tpu.plot import plot_free_energy

    plot_free_energy(latent, save_path="runs/sidechains/latent_fes.png")


if __name__ == "__main__":
    main()
