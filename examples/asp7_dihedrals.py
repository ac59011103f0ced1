# examples/asp7_dihedrals.py
"""Periodic EncoderMap on the Asp7 backbone dihedrals — the TPU analog of
the reference's starter tutorial 02 ("Advanced Usage — Asp7 Example",
``/root/reference/tutorials/notebooks_starter/02_Advanced_Usage-Asp7_Example.ipynb``):
tune the sketch-map sigmoids against the dihedral distance histogram, train a
periodic EncoderMap with L2 regularization and tensorboard images, project,
then round-trip the model through save()/from_checkpoint()."""

import os
from math import pi
from pathlib import Path

import numpy as np

import encodermap_tpu as em

CSV = "/root/reference/tutorials/notebooks_starter/asp7.csv"

# CI hook: tests/test_examples.py runs every example with a tiny step count
N_STEPS = int(os.environ.get("EM_EXAMPLE_STEPS", "1000"))


def main() -> None:
    data = np.loadtxt(CSV, skiprows=1, delimiter=",")
    dihedrals = data[:, :-1].astype(np.float32)  # 12 phi/psi angles in rad
    cluster_ids = data[:, -1].astype(int)

    parameters = em.Parameters(
        main_path=em.misc.run_path("runs/asp7"),
        n_steps=N_STEPS,
        steps_per_scan=min(100, N_STEPS),
        dist_sig_parameters=(4.5, 12, 6, 1, 2, 6),
        periodicity=2 * pi,
        l2_reg_constant=10.0,
        summary_step=max(1, N_STEPS // 10),
    )

    # The sigmoid-tuning view the notebook builds interactively: the
    # high-d distance histogram with the sketch-map sigmoids overlaid.
    em.plot.distance_histogram(
        dihedrals[::10],
        parameters.periodicity,
        parameters.dist_sig_parameters,
        save_path=str(Path(parameters.main_path) / "distance_histogram.png"),
    )

    e_map = em.EncoderMap(parameters, dihedrals)
    e_map.add_images_to_tensorboard()
    history = e_map.train()
    print(f"final loss: {history['loss'][-1]:.4f}")

    low_d = e_map.encode(dihedrals)
    assert low_d.shape == (len(dihedrals), 2)

    # Color the projection by the notebook's reference cluster ids.
    em.plot.plot_latent_scatter(
        low_d,
        colors=np.where(cluster_ids > 5, 0, cluster_ids),
        save_path=str(Path(parameters.main_path) / "clusters.png"),
    )

    # Persistence round trip, exactly as the notebook demonstrates.
    e_map.save()
    loaded_parameters = em.Parameters.from_file(
        Path(parameters.main_path) / "parameters.json"
    )
    assert loaded_parameters.n_steps == parameters.n_steps
    loaded = em.EncoderMap.from_checkpoint(
        parameters.main_path, train_data=dihedrals
    )
    np.testing.assert_allclose(
        loaded.encode(dihedrals), low_d, rtol=1e-5, atol=1e-5
    )
    print("checkpoint round trip reproduces the projection")


if __name__ == "__main__":
    main()
