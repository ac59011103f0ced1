# examples/two_state_ensemble.py
"""Two-state conformational analysis with AngleDihedralCartesianEncoderMap.

The reference validates its central scientific claim — that the latent map
separates conformational states — with an ARTIFICIAL two-state system
(M1-diUbq, two biased simulations concatenated;
``/root/reference/tests/test_autoencoder.py:1688``), because natural
fixture pairs rarely cooperate. Indeed the 1YUG/1YUF NMR ensembles that
ship with the test fixtures look like two states but are not: their models
pair 1:1 across files (frame i of 1YUG is nearest to frame i of 1YUF;
cross-file dihedral distances are SMALLER than within-file spread), so no
projection can separate them.

This example constructs the artificial two-state system from the asp7 MD
fixture instead, staying fully self-consistent at the CV level:

* state A: the real asp7 trajectory's internal coordinates;
* state B: the same frames with three central backbone torsions rotated by
  ~115 degrees — a synthetic conformational switch — and the backbone
  cartesians REBUILT from the modified torsions with the framework's own
  ``ops.backmap`` so every CV of state B describes the same geometry.

Training an ADC EncoderMap on the concatenated dataset must place A and B
in separate latent regions. The score printed at the end is the
leave-one-out 1-NN label accuracy in latent space: 1.0 = perfectly
separated, ~0.5 = mixed.
"""

import os

import numpy as np

import encodermap_tpu as em

TRAJ = "/root/reference/tests/data/asp7.xtc"
TOP = "/root/reference/tests/data/asp7.pdb"

# CI hook: tests/test_examples.py runs every example with a tiny step count
N_STEPS = int(os.environ.get("EM_EXAMPLE_STEPS", "500"))

FLIP = 2.0  # rad, applied to three central backbone torsions


def make_two_state_cvs() -> tuple[dict, np.ndarray]:
    """(cvs, labels): the asp7 CVs concatenated with a torsion-flipped,
    re-backmapped copy."""
    from encodermap_tpu.ops.backmap import backmap

    trajs = em.TrajEnsemble([em.load(TRAJ, TOP)])
    trajs.load_CVs("all")
    cvs_a = {k: np.asarray(v) for k, v in trajs.CVs.items()}

    dih_b = cvs_a["central_dihedrals"].copy()
    mid = dih_b.shape[1] // 2
    for k in (mid - 1, mid, mid + 1):
        dih_b[:, k] = np.angle(np.exp(1j * (dih_b[:, k] + FLIP)))

    # rebuild consistent backbone coordinates for BOTH states with the
    # same generative chain the decoder uses (pairwise-distance losses are
    # frame-invariant, but consistency keeps the cartesian cost honest)
    cart_a = np.asarray(backmap(
        cvs_a["central_distances"], cvs_a["central_angles"],
        cvs_a["central_dihedrals"]))
    cart_b = np.asarray(backmap(
        cvs_a["central_distances"], cvs_a["central_angles"], dih_b))

    cvs = {
        "central_angles": np.concatenate([cvs_a["central_angles"]] * 2),
        "central_dihedrals": np.concatenate(
            [cvs_a["central_dihedrals"], dih_b]),
        "central_cartesians": np.concatenate([cart_a, cart_b]),
        "central_distances": np.concatenate([cvs_a["central_distances"]] * 2),
        "side_dihedrals": np.concatenate([cvs_a["side_dihedrals"]] * 2),
    }
    n = len(cvs_a["central_dihedrals"])
    return cvs, np.concatenate([np.zeros(n), np.ones(n)])


def nn_state_accuracy(latent: np.ndarray, labels: np.ndarray) -> float:
    """Leave-one-out 1-nearest-neighbor label accuracy in latent space."""
    d2 = np.sum((latent[:, None] - latent[None]) ** 2, axis=-1)
    np.fill_diagonal(d2, np.inf)
    return float(np.mean(labels[np.argmin(d2, axis=1)] == labels))


def main() -> float:
    cvs, labels = make_two_state_cvs()

    parameters = em.ADCParameters(
        cartesian_pwd_start=1, cartesian_pwd_step=3,  # CA atoms
        main_path="runs/two_state",
        n_steps=N_STEPS,
        steps_per_scan=min(50, N_STEPS),
        batch_size=64,
        use_backbone_angles=True,
        use_sidechains=True,
        seed=0,
    )
    emap = em.AngleDihedralCartesianEncoderMap(cvs, parameters)
    history = emap.train()
    print(f"final loss: {history['loss'][-1]:.4f}")

    latent = emap.encode()
    # subsample for the O(n^2) score (the latent itself is cheap)
    idx = np.linspace(0, len(latent) - 1, 400).astype(int)
    acc = nn_state_accuracy(latent[idx], labels[idx])
    print(f"two-state separation (1-NN label accuracy): {acc:.3f}")

    # decode a representative of each state back to coordinates
    centers = np.stack([latent[labels == i].mean(axis=0) for i in (0, 1)])
    conformations = emap.generate(centers)
    print("generated state representatives:", conformations.shape)
    return acc


if __name__ == "__main__":
    main()
