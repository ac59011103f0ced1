# encodermap_tpu/loading/__init__.py
"""Featurization: CV computation from trajectory coordinates."""

from . import features
from .featurizer import EnsembleFeaturizer, Featurizer, SingleTrajFeaturizer

__all__ = [
    "features",
    "Featurizer",
    "SingleTrajFeaturizer",
    "EnsembleFeaturizer",
]
