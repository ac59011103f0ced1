# encodermap_tpu/__init__.py
"""EncoderMap-TPU: a TPU-native (JAX/XLA/Pallas/pjit) re-design of EncoderMap.

Dimensionality reduction + conformation generation for molecular-dynamics
data (Lemke & Peter, JCTC 2019), built from scratch for TPU hardware:

* the full train step (MLP autoencoder forward, sketch-map sigmoid distance
  cost, auto/center/regularization losses, backward, Adam) compiles to one
  XLA program and runs in on-device ``lax.scan`` chunks,
* the AngleDihedralCartesian backmapping (chain-in-plane + dihedral rotation
  chain) is an O(log n)-depth associative scan instead of the reference's
  sequential per-bond loop,
* scale-out is data-parallel sharding over a ``jax.sharding.Mesh``.

Public API mirrors the reference (``/root/reference/encodermap/__init__.py``):
``EncoderMap``, ``AngleDihedralCartesianEncoderMap``, ``Parameters``,
``ADCParameters``, ``load``, plus the ops/features/plot subpackages.
"""

from __future__ import annotations

__version__ = "0.1.0"

from . import losses, nn, ops
from .misc.misc import create_n_cube
from .parameters import ADCParameters, Parameters
from .train.autoencoder import Autoencoder, EncoderMap

__all__ = [
    "Autoencoder",
    "EncoderMap",
    "Parameters",
    "ADCParameters",
    "create_n_cube",
    "losses",
    "ops",
    "nn",
    "__version__",
]


def __getattr__(name):
    # Lazy imports for heavier subsystems so `import encodermap_tpu` stays fast.
    if name == "AngleDihedralCartesianEncoderMap":
        from .train.adc_autoencoder import AngleDihedralCartesianEncoderMap

        return AngleDihedralCartesianEncoderMap
    if name == "DihedralEncoderMap":
        from .train.autoencoder import DihedralEncoderMap

        return DihedralEncoderMap
    if name == "load":
        from .data.api import load

        return load
    if name == "SingleTraj":
        from .data.trajectory import SingleTraj

        return SingleTraj
    if name == "TrajEnsemble":
        from .data.trajectory import TrajEnsemble

        return TrajEnsemble
    if name == "Featurizer":
        from .loading.featurizer import Featurizer

        return Featurizer
    if name == "DaskFeaturizer":
        # reference top-level export (__init__.py:350); mesh-sharded here
        from .parallel.sharded_featurize import DaskFeaturizer

        return DaskFeaturizer
    if name == "CustomTopology":
        # reference top-level export (__init__.py:357)
        from .data.custom_topology import CustomTopology

        return CustomTopology
    if name == "CustomAAsDict":
        # reference top-level export (__init__.py:257) — there a typing
        # alias for the custom-residue dict format; same object here
        from .data.custom_topology import CustomAAsDict

        return CustomAAsDict
    if name == "plot":
        # "from . import plot" would re-enter this __getattr__ through
        # _handle_fromlist before the submodule binds -> infinite recursion
        import importlib

        return importlib.import_module(".plot", __name__)
    if name == "MolData":
        from .moldata import MolData

        return MolData
    if name == "features":
        import importlib

        return importlib.import_module(".loading.features", __name__)
    if name == "misc":
        import importlib

        return importlib.import_module(".misc", __name__)
    if name == "loading":
        # em.loading.CentralDihedrals etc., like the reference's subpackage
        import importlib

        return importlib.import_module(".loading", __name__)
    if name == "data":
        import importlib

        return importlib.import_module(".data", __name__)
    if name == "parallel":
        import importlib

        return importlib.import_module(".parallel", __name__)
    if name == "models":
        # em.models.gen_sequential_model / gen_functional_model, like the
        # reference's subpackage (models/__init__.py)
        import importlib

        return importlib.import_module(".models", __name__)
    if name == "EncoderMapBaseCallback":
        # the reference's user-facing base callback class
        from .train.callbacks import Callback

        return Callback
    if name == "callbacks":
        # em.callbacks.EncoderMapBaseCallback etc., like the reference's
        # subpackage (its customization tutorials subclass from here)
        import importlib

        mod = importlib.import_module(".train.callbacks", __name__)
        if not hasattr(mod, "EncoderMapBaseCallback"):
            mod.EncoderMapBaseCallback = mod.Callback
        if not hasattr(mod, "EncoderMapBaseMetric"):
            # the reference's callbacks/__init__.py re-exports the metric
            # classes alongside the callbacks (metrics.py:250-581)
            metrics_mod = importlib.import_module(
                ".train.metrics", __name__
            )
            for _name in metrics_mod.__all__:
                setattr(mod, _name, getattr(metrics_mod, _name))
            # the reference's callbacks/metrics.py also defines the Kabsch
            # helpers at module level (metrics.py:63-172); same names here
            from .ops.kabsch import kabsch_weighted, rmsd

            mod.kabsch_weighted = kabsch_weighted
            mod.rmsd = rmsd
            # the reference's weight-NaN abort callback; the loss-NaN abort
            # catches the same divergence one step earlier (callbacks.py
            # docstring)
            mod.NoneInterruptCallback = mod.NaNInterrupt
        return mod
    if name == "get_from_kondata":
        from .kondata import get_from_kondata

        return get_from_kondata
    if name == "load_project":
        from .kondata import load_project

        return load_project
    if name == "function":
        from .misc.function_def import function

        return function
    if name == "InteractivePlotting":
        from .plot.interactive import InteractivePlotting

        return InteractivePlotting
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
