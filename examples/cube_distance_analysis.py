# examples/cube_distance_analysis.py
"""Sigmoid-parameter tuning with distance histograms: BEFORE training an
EncoderMap, inspect how the sketch-map sigmoid transforms the pairwise
distance distribution of your data (the TPU equivalent of the reference's
``examples/cube_distance_analysis.py``).

The upper panel shows the raw pairwise-distance histogram, the sigmoid,
and its derivative; the lower panel the transformed distances. Good
``dist_sig_parameters`` spread the transformed histogram over the unit
interval — tweak them here until they do, then train with the same values.
"""

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

import encodermap_tpu as em


def main() -> None:
    data, ids = em.misc.random_on_cube_edges(1000, sigma=0.05, seed=42)

    dist_sig_parameters = (0.2, 3, 6, 1, 2, 6)
    periodicity = float("inf")

    axes = em.plot.distance_histogram(
        data, periodicity, dist_sig_parameters, bins=50
    )
    fig = (axes[0] if hasattr(axes, "__len__") else axes).figure
    fig.savefig("cube_distance_histogram.png", dpi=80)
    print("wrote cube_distance_histogram.png")


if __name__ == "__main__":
    main()
