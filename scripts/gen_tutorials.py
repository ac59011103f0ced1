# scripts/gen_tutorials.py
"""Generate the ``tutorials/`` notebook series.

The reference ships executable tutorial notebooks in four series
(``/root/reference/tutorials/notebooks_starter``, ``notebooks_intermediate``,
``notebooks_MD``, ``notebooks_customization``) and executes them in CI
(``/root/reference/tests/test_notebooks.py:40-148``). This script authors the
TPU-framework analogs as reproducible artifacts: edit the cell specs here,
re-run, commit both. ``tests/test_notebooks.py`` executes every generated
notebook with nbclient at reduced step counts.

Run: python scripts/gen_tutorials.py
"""

from __future__ import annotations

from pathlib import Path

import nbformat as nbf

REPO = Path(__file__).resolve().parents[1]
OUT = REPO / "tutorials"


def md(src: str) -> tuple:
    return ("md", src.strip())


def code(src: str) -> tuple:
    return ("code", src.strip())


# Shared first cell: honor the CI step-count hook and keep data paths
# overridable, exactly like examples/*.py do.
PRELUDE = code("""
import os
from pathlib import Path

import numpy as np

import encodermap_tpu as em

# CI hook: tests/test_notebooks.py executes this notebook with a tiny
# step count; interactively you get the full default.
N_STEPS = int(os.environ.get("EM_EXAMPLE_STEPS", "2000"))
DATA = Path(os.environ.get("EM_TUTORIAL_DATA", "/root/reference/tests/data"))
""")


NOTEBOOKS: dict[str, list[tuple]] = {}

# ---------------------------------------------------------------------------
# starter 01: the cube
# ---------------------------------------------------------------------------
NOTEBOOKS["notebooks_starter/01_Basic_Usage-Cube_Example.ipynb"] = [
    md("""
# Basic Usage — Cube Example

EncoderMap projects high-dimensional data to a low-dimensional map and can
*generate* new high-dimensional points from any spot on that map. This first
tutorial uses a toy data set — points on the edges of a 3D cube — so you can
see both directions of the map working before touching molecular data.

This is the TPU-native framework: training runs as one fused, jit-compiled
scan on whatever accelerator JAX finds (TPU, or CPU for this tutorial-sized
problem).
"""),
    PRELUDE,
    md("""
## The data

`create_n_cube` returns points along the edges of an n-dimensional cube plus
a color label per point so we can recognize the structure in the projection.
"""),
    code("""
data, colors = em.create_n_cube(3, points_along_edge=200, seed=0)
print(data.shape)
"""),
    md("""
## Parameters

All hyperparameters live in an `em.Parameters` object (defaults match the
reference implementation — see `parameters.defaults_description()`). The
cube is not periodic data, so we switch the periodicity off.
"""),
    code("""
parameters = em.Parameters(
    main_path="runs/cube_notebook",
    periodicity=float("inf"),
    n_steps=N_STEPS,
    steps_per_scan=min(200, N_STEPS),
)
"""),
    md("""
## Train

`EncoderMap` compiles the whole training loop (autoencoder + sketch-map
distance losses) into a single on-device scan.
"""),
    code("""
emap = em.EncoderMap(parameters, data)
history = emap.train()
"""),
    md("""
## Project and generate

`encode` maps data to the 2D latent space; `generate` decodes latent points
back to the input space.
"""),
    code("""
projection = emap.encode(data)
generated = emap.generate(projection[:500])
print("projection:", projection.shape, "generated:", generated.shape)
"""),
    code("""
from encodermap_tpu.plot import plot_latent_scatter

plot_latent_scatter(projection, colors=colors)
"""),
    md("""
The three cube faces unfold into separated 2D regions. From here, continue
with the Asp7 tutorial to apply the same workflow to molecular dihedrals.
"""),
]

# ---------------------------------------------------------------------------
# starter 02: asp7 dihedrals
# ---------------------------------------------------------------------------
NOTEBOOKS["notebooks_starter/02_Advanced_Usage-Asp7_Example.ipynb"] = [
    md("""
# Advanced Usage — Asp7 Example

Hepta-aspartate (asp7) dihedral angles, the reference's second starter
tutorial. Two things are new compared to the cube:

* the inputs are **periodic** angles, so the autoencoder must respect the
  2π topology (`periodicity=2*pi`, periodic input/output layers),
* training quality is judged by coloring the map with known cluster ids.
"""),
    PRELUDE,
    code("""
CSV = Path(os.environ.get(
    "EM_TUTORIAL_CSV",
    "/root/reference/tutorials/notebooks_starter/asp7.csv",
))
csv = np.loadtxt(CSV, delimiter=",", skiprows=1)  # header: phi0..psi5,cluster_id
dihedrals, cluster_ids = csv[:, :-1].astype("float32"), csv[:, -1]
print(dihedrals.shape, "frames x dihedrals; clusters:", np.unique(cluster_ids))
"""),
    code("""
parameters = em.Parameters(
    main_path="runs/asp7_notebook",
    n_steps=N_STEPS,
    steps_per_scan=min(100, N_STEPS),
    periodicity=2 * np.pi,
    dist_sig_parameters=(4.5, 12, 6, 1, 2, 6),
)
emap = em.EncoderMap(parameters, dihedrals)
history = emap.train()
"""),
    code("""
from encodermap_tpu.plot import plot_latent_scatter

projection = emap.encode(dihedrals)
plot_latent_scatter(projection, colors=cluster_ids)
"""),
    md("""
## Generating new conformations

`DihedralEncoderMap.generate` decodes latent points straight to a
trajectory via an offline dihedral backmapping — see
`examples/asp7_dihedrals.py` for the full end-to-end variant writing a pdb.

## Tuning the sigmoid parameters

The sketch-map sigmoid parameters decide which distance scales the map
preserves. `distance_histogram` plots the high-dimensional distance
distribution together with the sigmoid family so you can place the
inflection point where your data has structure.
"""),
    code("""
from encodermap_tpu.plot import distance_histogram

distance_histogram(
    dihedrals[::10], periodicity=2 * np.pi,
    sigmoid_parameters=parameters.dist_sig_parameters,
)
"""),
]

# ---------------------------------------------------------------------------
# starter 03: your data
# ---------------------------------------------------------------------------
NOTEBOOKS["notebooks_starter/03_Your_Data.ipynb"] = [
    md("""
# Your Data

A template for running EncoderMap on your own data. Fill in the loading
cell; everything below is the standard workflow. The demo values keep the
notebook executable end-to-end so you can validate your environment first.

Checklist before training on real data:

1. **Shape**: a float array `(n_frames, n_features)`. Molecular CVs come
   from the featurizer (see the MD series) or your own pipeline.
2. **Periodicity**: `2*pi` for angles, `float("inf")` for distances or
   mixed nonperiodic features.
3. **Sigmoid parameters**: run `distance_histogram` on a subsample and
   place the high-D sigmoid where the histogram has structure.
"""),
    PRELUDE,
    code("""
# --- replace this cell with your own loading code ------------------------
# e.g.: data = np.load("my_cvs.npy").astype("float32")
data, colors = em.create_n_cube(4, points_along_edge=100, seed=1)
data = data.astype("float32")
print(data.shape)
"""),
    code("""
from encodermap_tpu.plot import distance_histogram

distance_histogram(
    data[::10], periodicity=float("inf"),
    sigmoid_parameters=(4.5, 12, 6, 1, 2, 6),
)
"""),
    code("""
parameters = em.Parameters(
    main_path="runs/your_data",
    periodicity=float("inf"),        # 2*np.pi for dihedral data
    dist_sig_parameters=(4.5, 12, 6, 1, 2, 6),
    n_steps=N_STEPS,
    steps_per_scan=min(200, N_STEPS),
)
emap = em.EncoderMap(parameters, data)
emap.train()
projection = emap.encode(data)
"""),
    code("""
from encodermap_tpu.plot import plot_latent_scatter

plot_latent_scatter(projection, colors=colors)
"""),
    md("""
## Saving and restoring

Checkpoints (parameters + optimizer + RNG + step) land in
`parameters.main_path`; reload with `em.EncoderMap.from_checkpoint(path)`.
The `InteractivePlotting` class (see the intermediate series) lets you
lasso regions of the map and generate conformations from them.
"""),
]

# ---------------------------------------------------------------------------
# intermediate 01: losses
# ---------------------------------------------------------------------------
NOTEBOOKS["notebooks_intermediate/01_explanation_of_loss_functions.ipynb"] = [
    md("""
# The Loss Functions

EncoderMap's cost is a weighted sum of terms; this notebook computes each
one by hand on a small batch so you can see exactly what is optimized.

| term | weight parameter | what it does |
|---|---|---|
| auto loss | `auto_cost_scale` | reconstruction: decoder(encoder(x)) ≈ x |
| distance loss | `distance_cost_scale` | sketch-map: sigmoid(d_highD) ≈ sigmoid(d_lowD) |
| center loss | `center_cost_scale` | keeps the latent centered at 0 |
| regularization | `l2_reg_constant` | L2 on the weights |

The `AngleDihedralCartesianEncoderMap` adds angle/dihedral/cartesian terms
(see the reference parity tests for their exact math).
"""),
    PRELUDE,
    code("""
import jax
import jax.numpy as jnp

from encodermap_tpu import losses

data, _ = em.create_n_cube(3, points_along_edge=50, seed=0)
batch = jnp.asarray(data[:256], jnp.float32)
p = em.Parameters(periodicity=float("inf"))
"""),
    code("""
# the sketch-map sigmoid family: what the distance loss compares
from encodermap_tpu.ops.distances import pairwise_dist, sigmoid

sig_h, a_h, b_h, sig_l, a_l, b_l = p.dist_sig_parameters
d = pairwise_dist(batch)
print("high-D distances:", float(d.min()), "to", float(d.max()))
print("sigmoid(center) =", float(sigmoid(sig_h, a_h, b_h)(jnp.asarray(sig_h))))
"""),
    code("""
# distance loss between the inputs and a random 2D projection
key = jax.random.PRNGKey(0)
latent = jax.random.normal(key, (batch.shape[0], 2))
dl = losses.distance_loss(batch, latent, p)
print("distance loss of a RANDOM projection:", float(dl))
"""),
    code("""
# train briefly, then re-evaluate: the distance loss is what falls
p2 = em.Parameters(
    main_path="runs/loss_notebook", periodicity=float("inf"),
    n_steps=N_STEPS, steps_per_scan=min(100, N_STEPS),
)
emap = em.EncoderMap(p2, data)
emap.train()
trained_latent = jnp.asarray(emap.encode(batch))
print("distance loss after training:",
      float(losses.distance_loss(batch, trained_latent, p)))
"""),
    md("""
## Adding your own terms

`emap.add_loss(fn)` registers a custom term that runs inside the jitted
step — see the customization series, notebook 02, for the full contract.
"""),
]

# ---------------------------------------------------------------------------
# intermediate 02: multiple topologies
# ---------------------------------------------------------------------------
NOTEBOOKS["notebooks_intermediate/02_training_with_different_topologies.ipynb"] = [
    md("""
# Training With Different Topologies

Proteins with different residue counts produce different CV widths. The
`AngleDihedralCartesianEncoderMap` handles a mixed ensemble by aligning
features across topologies (`ensemble=True`) and training *sparse*: missing
CVs are masked, and per-topology densifier networks fill them in.

Here: hepta-glutamate (glu7) + hepta-aspartate (asp7), the reference's
intermediate tutorial 02.
"""),
    PRELUDE,
    code("""
trajs = em.load(
    [str(DATA / "glu7.xtc"), str(DATA / "asp7.xtc")],
    [str(DATA / "glu7.pdb"), str(DATA / "asp7.pdb")],
    common_str=["glu7", "asp7"],
)
trajs.load_CVs("all", ensemble=True)
print(trajs)
"""),
    code("""
parameters = em.ADCParameters(
    main_path="runs/multi_top_notebook",
    n_steps=N_STEPS,
    steps_per_scan=min(50, N_STEPS),
    use_backbone_angles=True,
    use_sidechains=True,
    batch_size=64,
)
emap = em.AngleDihedralCartesianEncoderMap(trajs, parameters)
emap.train()
"""),
    code("""
from encodermap_tpu.plot import plot_latent_scatter

lowd = emap.encode()
# color by topology: which protein does each frame come from
labels = np.concatenate([
    np.full(t.n_frames, i) for i, t in enumerate(trajs)
])
plot_latent_scatter(lowd, colors=labels)
"""),
    md("""
Frames from the two peptides land in one shared map; shared-backbone
structure dominates, sidechain differences separate locally. From a region
of interest, `emap.generate(points, top=0)` backmaps with either topology.
"""),
]

# ---------------------------------------------------------------------------
# intermediate 03: sharded featurization (the dask replacement)
# ---------------------------------------------------------------------------
NOTEBOOKS["notebooks_intermediate/03_sharded_featurization.ipynb"] = [
    md("""
# Sharded Featurization

The reference parallelizes featurization of long trajectories with dask
(`notebooks_intermediate/03_dask_featurization.ipynb`). The TPU framework
instead shards the jitted feature program over the JAX device mesh —
same user API, the devices you already train on, no extra scheduler.

On a CPU host, JAX can expose virtual devices
(`XLA_FLAGS=--xla_force_host_platform_device_count=8`), which is also how
the test suite validates every feature class sharded-vs-single-device.
"""),
    PRELUDE,
    code("""
import jax

print(jax.devices())
traj = em.SingleTraj(DATA / "1am7_corrected.xtc", DATA / "1am7_protein.pdb")
"""),
    code("""
from encodermap_tpu.parallel.sharded_featurize import ShardedFeaturizer

feat = ShardedFeaturizer(traj)
feat.add_list_of_feats(["central_dihedrals"])
feat.add_distances_ca()
out = feat.get_output()
out
"""),
    md("""
Each feature program is compiled once and mapped over frame shards, one
shard per device; uneven remainders are handled by padding and masking.
For multi-trajectory ensembles, `TrajEnsemble.load_CVs(...)` uses the same
machinery per trajectory.
"""),
]

# ---------------------------------------------------------------------------
# MD 01: trajectory ensembles
# ---------------------------------------------------------------------------
NOTEBOOKS["notebooks_MD/01_Introduction_to_Trajectory_Ensembles.ipynb"] = [
    md("""
# Working With Trajectory Ensembles

`SingleTraj` and `TrajEnsemble` are the framework's MD containers: lazy,
composable views over trajectory files (XTC/DCD/TRR/GRO/PDB/H5, decoded by
the built-in native reader — no mdtraj required) that carry collective
variables (CVs) alongside the coordinates.
"""),
    PRELUDE,
    code("""
traj = em.SingleTraj(DATA / "1am7_corrected.xtc", DATA / "1am7_protein.pdb")
print(traj)
print(traj.n_frames, "frames,", traj.n_atoms, "atoms")
"""),
    code("""
# lazy, composable indexing: nothing is decoded until coordinates are read
sub = traj[::10][:5]
print(sub.n_frames, sub.xyz.shape)
"""),
    code("""
# CVs: compute on device via the featurizer...
traj.load_CV("central_dihedrals")
print(traj.central_dihedrals.shape)
"""),
    code("""
# ...or attach your own arrays
traj.load_CV(np.linalg.norm(traj.xyz[:, 0] - traj.xyz[:, -1], axis=-1),
             attr_name="end_to_end")
print(traj.end_to_end[:3])
"""),
    code("""
# ensembles group trajectories; frames stay addressable by (traj_num, frame)
trajs = em.load(
    [str(DATA / "glu7.xtc"), str(DATA / "asp7.xtc")],
    [str(DATA / "glu7.pdb"), str(DATA / "asp7.pdb")],
    common_str=["glu7", "asp7"],
)
print(trajs)
print(trajs.n_frames, "total frames")
"""),
    code("""
# CVs across a mixed ensemble align by feature (ensemble=True pads
# missing residues with NaN; see the multiple-topologies tutorial)
trajs.load_CVs("central_dihedrals")

# iterate batches for custom training loops (uniform over all frames;
# a single CV name yields bare arrays)
it = trajs.batch_iterator(batch_size=8, CV_names=["central_dihedrals"],
                          deterministic=True)
batch = next(it)
batch.shape
"""),
    md("""
`TrajEnsemble.save()` writes a single HDF5 with per-topology groups; large
ensembles stream from that file during training without materializing CVs
in memory (`HDF5BatchSource` — see `examples/streaming_multichip.py`).
"""),
]

# ---------------------------------------------------------------------------
# MD 02: ensemble analysis
# ---------------------------------------------------------------------------
NOTEBOOKS["notebooks_MD/02_Ensemble_Analysis.ipynb"] = [
    md("""
# Analyzing an Ensemble: DSSP, Ramachandran, Projection

The reference's MD series analyzes ubiquitin mutants from a public dataset;
this notebook runs the same analyses on the bundled lysozyme fragment so it
executes offline. Swap `traj` for your own data.
"""),
    PRELUDE,
    code("""
traj = em.SingleTraj(DATA / "1am7_corrected.xtc", DATA / "1am7_protein.pdb")
traj.load_CV("central_dihedrals")
"""),
    code("""
from encodermap_tpu.plot import plot_ramachandran

plot_ramachandran(traj, subsample=5)
"""),
    code("""
from encodermap_tpu.plot import plot_dssp

plot_dssp(traj)
"""),
    code("""
# project the dihedral space
p = em.Parameters(
    main_path="runs/ensemble_analysis", periodicity=2 * np.pi,
    n_steps=N_STEPS, steps_per_scan=min(100, N_STEPS),
)
emap = em.EncoderMap(p, np.asarray(traj.central_dihedrals))
emap.train()
lowd = emap.encode(np.asarray(traj.central_dihedrals))
"""),
    code("""
from encodermap_tpu.plot import plot_free_energy

plot_free_energy(lowd[:, 0], lowd[:, 1])
"""),
    md("""
For conformational-state analysis on a two-state system — and the latent
separation assertion that validates the map — see
`examples/two_state_ensemble.py`.
"""),
]

# ---------------------------------------------------------------------------
# MD 03: the full pipeline primer (reference 01_Understanding_MD)
# ---------------------------------------------------------------------------
NOTEBOOKS["notebooks_MD/03_Understanding_MD.ipynb"] = [
    md("""
# Understanding MD: the EncoderMap Pipeline

Molecular-dynamics trajectories are long sequences of atomic coordinates.
EncoderMap condenses them into a 2D *map* you can reason about: every frame
becomes a point, similar conformations land close together, and any point
on the map can be decoded back into a 3D structure.

The pipeline is always the same four stages:

1. **Load** trajectories into a `TrajEnsemble`,
2. **featurize** them into collective variables (angles, dihedrals,
   distances),
3. **train** an `AngleDihedralCartesianEncoderMap` on those CVs,
4. **evaluate** — project frames into the map and generate new structures.

(The reference tutorial runs this on its `linear_dimers` project via
`em.load_project("linear_dimers")`, a ~GB download; this notebook uses the
bundled Asp7 heptapeptide so it executes offline. Everything transfers.)
"""),
    PRELUDE,
    md("""## 1. Load"""),
    code("""
trajs = em.TrajEnsemble([em.load(str(DATA / "asp7.xtc"),
                                 str(DATA / "asp7.pdb"))])
print(trajs)
print(trajs.n_frames, "frames,", trajs.top[0].n_atoms, "atoms")
"""),
    md("""
## 2. Featurize

`load_CVs("all")` computes the full internal-coordinate set the ADC model
trains on — backbone angles/dihedrals/distances, CA cartesians, and
sidechain dihedrals — on the accelerator, and attaches them to the
ensemble.
"""),
    code("""
trajs.load_CVs("all")
for name, arr in sorted(trajs.CVs.items()):
    print(f"{name:<25} {arr.shape}")
"""),
    md("""
## 3. Train

`ADCParameters` collects every hyperparameter. The cartesian cost compares
pairwise CA distances of backmapped vs input structures; its soft start
(`cartesian_cost_scale_soft_start`) ramps that cost in once the dihedral
space has organized.
"""),
    code("""
parameters = em.ADCParameters(
    cartesian_pwd_start=1, cartesian_pwd_step=3,   # CA atoms
    main_path="runs/understanding_md",
    n_steps=N_STEPS, steps_per_scan=min(100, N_STEPS),
    use_backbone_angles=True, use_sidechains=True,
    cartesian_cost_scale_soft_start=(max(1, N_STEPS // 10),
                                     max(2, N_STEPS // 2)),
)
emap = em.AngleDihedralCartesianEncoderMap(trajs, parameters)
history = emap.train()
print(f"final loss: {history['loss'][-1]:.4f}")
"""),
    md("""## 4. Evaluate"""),
    code("""
latent = emap.encode()
print("latent:", latent.shape)

from encodermap_tpu.plot import plot_free_energy

plot_free_energy(latent)
"""),
    code("""
# decode any map location back into a full backbone structure
conformations = emap.generate(latent[:5])
print("generated:", conformations.shape)
"""),
    md("""
With a trained map, `InteractivePlotting` supports lasso-selecting states,
path sampling, and cluster export; `plot_dssp` / `plot_ramachandran`
validate generated geometry. When you have network access, the reference
datasets are one call away: `trajs = em.load_project("linear_dimers")`.
"""),
]

# ---------------------------------------------------------------------------
# MD 04: container deep dive (reference 01_Working_with_trajectory_ensembles)
# ---------------------------------------------------------------------------
NOTEBOOKS["notebooks_MD/04_Working_with_Trajectory_Ensembles.ipynb"] = [
    md("""
# Working with Trajectory Ensembles: a Container Deep Dive

A tour of `SingleTraj` / `TrajEnsemble` mechanics: construction, on-demand
loading, lazy indexing, frame selection, CV plots, and sharing data as a
single HDF5 file.
"""),
    PRELUDE,
    md("""
## Construction

A `SingleTraj` wraps a (trajectory, topology) file pair — or a standalone
PDB/H5. Construction does **no IO**: files are read when coordinates are
first needed. (URLs and PDB ids work too when online:
`em.SingleTraj('https://files.rcsb.org/view/1YUF.pdb')`,
`em.SingleTraj.from_pdb_id('1YUG')`.)
"""),
    code("""
traj = em.SingleTraj(DATA / "asp7.xtc", DATA / "asp7.pdb")
print(traj.basename, "|", traj.traj_file)
print(traj)
"""),
    md("""
## On-demand loading

`backend="no_load"` is the default: the native decoder runs on first
coordinate access. `load_traj()` forces it, `unload()` drops the arrays
(keeping the lazy view), and the context-manager form scopes a load.
"""),
    code("""
traj.load_traj()
print("loaded:", traj.xyz.shape)
traj.unload()
with traj as t:
    print("in context:", t.n_frames, "frames")
"""),
    md("""
## Indexing

Integer / slice / fancy indexing compose lazily — `traj[::2][2]` decodes
one frame, not the file. Plain indexing counts in the *current view*;
`.fsel` counts in original-file frame numbers.
"""),
    code("""
print(traj[0])
print(traj[:10][[0, 1]].n_frames, "frames from a composed view")
print("view index 2 of traj[::2]:  time", float(traj[::2][2].time[0]))
print("file frame 4 via fsel:      time", float(traj[::2].fsel[4].time[0]))
"""),
    md("""
## Atom selection and per-traj CV plots
"""),
    code("""
ca = traj.select("name CA")
print("CA atom indices:", ca)
"""),
    code("""
from encodermap_tpu.plot import plot_ball_and_stick, plot_end2end

plot_ball_and_stick(traj, frame=0, highlight="dihedrals")
plot_end2end(traj)
"""),
    md("""
## Ensembles

`TrajEnsemble` groups trajectories (mixed topologies welcome); frames stay
addressable as (traj_num, frame_num) pairs and `common_str` tags group
related files. `.tsel` selects by traj_num, iteration yields `SingleTraj`s.
"""),
    code("""
trajs = em.load(
    [str(DATA / "glu7.xtc"), str(DATA / "asp7.xtc")],
    [str(DATA / "glu7.pdb"), str(DATA / "asp7.pdb")],
    common_str=["glu7", "asp7"],
)
print(trajs)
print("by common_str:", {k: len(v) for k, v in
                         trajs.trajs_by_common_str.items()})
print("tsel:", trajs.tsel[1].basename)
"""),
    code("""
trajs.load_CVs("central_dihedrals", ensemble=True)
print(trajs.CVs["central_dihedrals"].shape)  # NaN-padded across topologies
"""),
    md("""
## Sharing MD data

`save()` writes ONE HDF5 with per-topology groups — coordinates, topology,
CVs, and attrs — that `TrajEnsemble.from_dataset` (or streaming training
via `HDF5BatchSource`) reads back without the original files.
"""),
    code("""
out = Path("runs/ensemble_tour/trajs.h5")
out.parent.mkdir(parents=True, exist_ok=True)
trajs.save(str(out), overwrite=True)
back = em.TrajEnsemble.from_dataset(str(out))
print(back)
print("CVs survive:", list(back.CVs.keys()))
"""),
]

# ---------------------------------------------------------------------------
# customization 01: custom scalars
# ---------------------------------------------------------------------------
NOTEBOOKS["notebooks_customization/01_custom_scalars.ipynb"] = [
    md("""
# Logging Custom Scalars

Training metrics stream to `<main_path>/train_metrics.jsonl` (and to
TensorBoard when `tensorboard=True` and the package is installed). Custom
per-step scalars ride the same pipeline through metric classes.
"""),
    PRELUDE,
    code("""
data, _ = em.create_n_cube(3, points_along_edge=50, seed=0)
p = em.Parameters(
    main_path="runs/custom_scalars", periodicity=float("inf"),
    n_steps=N_STEPS, steps_per_scan=min(50, N_STEPS),
    summary_step=1,
)
emap = em.EncoderMap(p, data)
"""),
    code("""
import jax.numpy as jnp


class ReconstructionError(em.callbacks.EncoderMapBaseMetric):
    \"\"\"Mean per-sample reconstruction distance. ``update(y_true, y_pred)``
    is traced into the jitted train step, so use JAX ops only.\"\"\"

    def update(self, y_true, y_pred):
        return jnp.mean(jnp.linalg.norm(y_true - y_pred, axis=1))


emap.add_metric(ReconstructionError)
history = emap.train()
print(history["ReconstructionError Metric"][-1])
"""),
    code("""
import json

rows = [json.loads(l) for l in
        open(Path(p.main_path) / "train_metrics.jsonl")]
print(rows[-1])
"""),
    md("""
Every row carries the losses plus your metrics, keyed by step — the same
stream TensorBoard renders when `tensorboard=True`. Plain functions work
too: `emap.add_metric(lambda params, batch: ..., name="my_scalar")`.
"""),
]

# ---------------------------------------------------------------------------
# customization 02: custom losses
# ---------------------------------------------------------------------------
NOTEBOOKS["notebooks_customization/02_custom_loss_functions.ipynb"] = [
    md("""
# Custom Loss Functions

`add_loss` registers an extra cost term that runs INSIDE the jit-compiled
training step — it must be a pure JAX function of `(params, batch, aux)`.
Its value is added to the total cost and logged alongside the built-ins.
"""),
    PRELUDE,
    code("""
import jax.numpy as jnp

data, _ = em.create_n_cube(3, points_along_edge=50, seed=0)
p = em.Parameters(
    main_path="runs/custom_loss", periodicity=float("inf"),
    n_steps=N_STEPS, steps_per_scan=min(50, N_STEPS),
)
emap = em.EncoderMap(p, data)
"""),
    code("""
from encodermap_tpu.models.sequential import encode


def unit_square_loss(params, batch):
    \"\"\"Penalize latent points outside [-1, 1]^2 (toy example).

    A custom loss is a pure function of (params, batch); re-deriving the
    latent here is free — XLA merges it with the main forward pass.\"\"\"
    latent = encode(params, p, batch)
    return 0.1 * jnp.mean(jnp.square(jnp.maximum(jnp.abs(latent) - 1.0, 0.0)))


emap.add_loss(unit_square_loss, name="unit_square")
history = emap.train()
print("final unit_square term:", history["unit_square"][-1])
"""),
    code("""
projection = emap.encode(data)
print("latent extent:", projection.min(axis=0), projection.max(axis=0))
"""),
    md("""
The experimental class-based API from the reference
(`ENCODERMAP_TESTING=1`, subclasses of `encodermap_tpu.loss_classes`)
is also supported for migrating code — see `tests/test_loss_classes.py`.
"""),
]

# ---------------------------------------------------------------------------
# customization 03: custom images
# ---------------------------------------------------------------------------
NOTEBOOKS["notebooks_customization/03_custom_images.ipynb"] = [
    md("""
# Custom Images During Training

`ImageCallback` renders the latent projection to an image every
`summary_step` steps; `additional_fns` lets you add your own figures (they
receive the current low-dimensional projection).
"""),
    PRELUDE,
    code("""
data, colors = em.create_n_cube(3, points_along_edge=50, seed=0)
p = em.Parameters(
    main_path="runs/custom_images", periodicity=float("inf"),
    n_steps=N_STEPS, steps_per_scan=min(50, N_STEPS),
    summary_step=max(1, N_STEPS // 4),
)
"""),
    code("""
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt


def density_figure(lowd):
    fig, ax = plt.subplots()
    ax.hexbin(lowd[:, 0], lowd[:, 1], gridsize=30)
    ax.set_title("latent density")
    return fig


emap = em.EncoderMap(p, data)
emap.add_images_to_tensorboard(data[::5], additional_fns=[density_figure])
emap.train()
"""),
    code("""
images = sorted(Path(p.main_path).glob("*.png"))
print(len(images), "images;", [i.name for i in images[:4]])
"""),
]

# ---------------------------------------------------------------------------
# customization 04: lr schedulers
# ---------------------------------------------------------------------------
NOTEBOOKS["notebooks_customization/04_learning_rate_schedulers.ipynb"] = [
    md("""
# Learning-Rate Schedules

The trainer accepts any optax schedule as `learning_rate`; the reference's
keras `LearningRateScheduler` workflows map onto these. The schedule is a
pure function of the step, so it compiles into the scan and checkpoints
resume mid-schedule exactly.
"""),
    PRELUDE,
    code("""
import optax

data, _ = em.create_n_cube(3, points_along_edge=50, seed=0)
schedule = optax.exponential_decay(
    init_value=1e-3, transition_steps=max(1, N_STEPS // 4),
    decay_rate=0.5, staircase=True,
)
p = em.Parameters(
    main_path="runs/lr_schedule", periodicity=float("inf"),
    n_steps=N_STEPS, steps_per_scan=min(50, N_STEPS),
)
emap = em.EncoderMap(p, data, learning_rate_schedule=schedule)
history = emap.train()
"""),
    code("""
steps = np.arange(N_STEPS)
lrs = [float(schedule(s)) for s in steps[:: max(1, N_STEPS // 50)]]
print("lr start/end:", lrs[0], lrs[-1])
"""),
    code("""
import matplotlib.pyplot as plt

fig, ax = plt.subplots()
for key in ("loss", "auto_loss", "distance_loss"):
    if key in history:
        ax.plot(history[key], label=key)
ax.set_xlabel("step"); ax.set_yscale("log"); ax.legend()
"""),
]


def build(name: str, cells: list[tuple]) -> nbf.NotebookNode:
    nb = nbf.v4.new_notebook()
    nb.metadata["kernelspec"] = {
        "display_name": "Python 3", "language": "python", "name": "python3",
    }
    nb.metadata["language_info"] = {"name": "python"}
    for kind, src in cells:
        if kind == "md":
            nb.cells.append(nbf.v4.new_markdown_cell(src))
        else:
            nb.cells.append(nbf.v4.new_code_cell(src))
    return nb


def main() -> None:
    for name, cells in NOTEBOOKS.items():
        path = OUT / name
        path.parent.mkdir(parents=True, exist_ok=True)
        nbf.write(build(name, cells), path)
        print("wrote", path.relative_to(REPO))


if __name__ == "__main__":
    main()
