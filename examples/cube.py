# examples/cube.py
"""Minimal EncoderMap example: project a noisy hypercube to 2D and generate
new points (the TPU equivalent of the reference's ``examples/cube.py``)."""

import os

import numpy as np

import encodermap_tpu as em

# CI hook: tests/test_examples.py runs every example with a tiny step count
N_STEPS = int(os.environ.get("EM_EXAMPLE_STEPS", "2000"))


def main() -> None:
    data, colors = em.create_n_cube(3, points_along_edge=200, seed=0)

    parameters = em.Parameters(
        main_path="runs/cube",
        periodicity=float("inf"),
        n_steps=N_STEPS,
        steps_per_scan=min(200, N_STEPS),
    )
    emap = em.EncoderMap(parameters, data)
    emap.train()

    projection = emap.encode(data)
    generated = emap.generate(projection[:500])
    print("projection:", projection.shape, "generated:", generated.shape)

    from encodermap_tpu.plot import plot_latent_scatter

    plot_latent_scatter(
        projection, colors=colors, save_path="runs/cube/projection.png"
    )
    print("wrote runs/cube/projection.png")


if __name__ == "__main__":
    main()
