# examples/custom_extensions.py
"""User-extension hooks in one walkthrough (the TPU equivalents of the
reference's customization tutorials 01-04): custom metrics, custom losses,
custom tensorboard images, and learning-rate schedules — all of which run
INSIDE the jitted train step (no per-step host round trips)."""

import os

import matplotlib

matplotlib.use("Agg")
import numpy as np

import encodermap_tpu as em

N_STEPS = int(os.environ.get("EM_EXAMPLE_STEPS", "1000"))


def main() -> None:
    import jax.numpy as jnp
    import optax

    data, _ = em.create_n_cube(3, points_along_edge=100, seed=0)

    parameters = em.Parameters(
        main_path="runs/custom_extensions",
        periodicity=float("inf"),
        n_steps=N_STEPS,
        steps_per_scan=min(100, N_STEPS),
        summary_step=max(1, N_STEPS // 4),
    )

    # tutorial 04: any optax schedule (or plain callable step -> lr)
    schedule = optax.exponential_decay(
        parameters.learning_rate, transition_steps=max(1, N_STEPS // 4),
        decay_rate=0.7,
    )
    emap = em.EncoderMap(parameters, data, learning_rate_schedule=schedule)

    # tutorial 01: custom scalars — logged per step with the losses
    from encodermap_tpu.models import sequential as seq

    def mean_abs_reconstruction(params, batch):
        out = seq.forward(params, emap.p, batch)
        return jnp.mean(jnp.abs(batch - out))

    emap.add_metric(mean_abs_reconstruction, name="mean_abs")

    # tutorial 02: custom losses — contribute to the optimized total
    def l1_latent(params, batch):
        return 1e-4 * jnp.mean(jnp.abs(seq.encode(params, emap.p, batch)))

    emap.add_loss(l1_latent, name="l1_latent")

    # tutorial 03: custom images of the projection at every image step
    def free_energy_image(lowd):
        H, _, _ = np.histogram2d(*lowd.T, bins=50)
        density = H / max(H.sum(), 1)
        F = np.full(H.shape, np.nan)
        nz = density.nonzero()
        F[nz] = -np.log(density[nz])
        return F.T

    emap.add_images_to_tensorboard(additional_fns=[free_energy_image])

    history = emap.train()
    print("loss:", history["loss"][0], "->", history["loss"][-1])
    print("lr:", history["learning_rate"][0], "->",
          history["learning_rate"][-1])
    print("mean_abs:", history["mean_abs"][-1],
          "l1_latent:", history["l1_latent"][-1])


if __name__ == "__main__":
    main()
