# examples/custom_residues.py
"""Unnatural amino acids + mixed-topology ensembles: patch residue
definitions with the CustomAAsDict format, featurize a two-topology
ensemble with NaN alignment, and train an EncoderMap on the aligned
sidechain dihedrals (the TPU equivalent of the reference's custom-AA
workflow, ``tests/test_backmapping_em1_em2.py:1034`` /
``trajinfo_utils.py:600-770``)."""

import os

import numpy as np

import encodermap_tpu as em

DATA = "/root/reference/tests/data"

# CI hook: tests/test_examples.py runs every example with a tiny step count
N_STEPS = int(os.environ.get("EM_EXAMPLE_STEPS", "1000"))


def main() -> None:
    # the CustomAAsDict format: {resname: (one_letter_code, {tables})}.
    # Here we give aspartate an artificial chi3 over its carboxylate
    # group — the same mechanism registers genuinely unnatural residues
    # (acetylated lysine, phosphothreonine, ...) so every chi-derived
    # feature picks them up.
    custom_aas = {
        "ASP": ("D", {
            "optional_bonds": [("-C", "N"), ("N", "CA"), ("CA", "CB"),
                               ("CB", "CG"), ("C", "+N")],
            "CHI3": ["CB", "CG", "OD1", "OD2"],
        }),
    }

    trajs = em.load(
        [f"{DATA}/asp7.xtc", f"{DATA}/glu7.xtc"],
        [f"{DATA}/asp7.pdb", f"{DATA}/glu7.pdb"],
        common_str=["asp7", "glu7"],
        custom_top=custom_aas,
    )
    print("chi3 per member:",
          [len(t.top.indices_chi3) for t in trajs.trajs])

    # ensemble featurization NaN-aligns the differing sidechain tables
    trajs.load_CVs("side_dihedrals", ensemble=True)
    sd = trajs.CVs["side_dihedrals"]
    print("aligned side_dihedrals:", sd.shape,
          f"({int(np.isnan(sd).sum())} NaN pads)")

    # train a periodic EncoderMap on the aligned dihedrals; the sparse
    # (NaN-masked) path handles the padded columns
    p = em.Parameters(
        main_path="runs/custom_residues",
        n_steps=N_STEPS,
        steps_per_scan=min(100, N_STEPS),
        periodicity=2 * np.pi,
        batch_size=64,
        seed=0,
    )
    emap = em.EncoderMap(p, sd)
    history = emap.train()
    print("loss:", float(history["loss"][0]), "->",
          float(history["loss"][-1]))

    lowd = emap.encode(sd)
    print("latent:", np.asarray(lowd).shape)


if __name__ == "__main__":
    main()
