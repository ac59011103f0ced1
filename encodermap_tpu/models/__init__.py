# encodermap_tpu/models/__init__.py
"""Model definitions (functional parameter pytrees + apply functions).

Mirrors the reference's ``encodermap.models`` surface
(``models/__init__.py`` re-exports ``gen_sequential_model`` /
``gen_functional_model`` from ``models/models.py:105``)."""

from . import adc, sequential
from .adc import ADCFunctionalModel, gen_functional_model
from .sequential import SequentialModel, gen_sequential_model

__all__ = [
    "sequential",
    "adc",
    "SequentialModel",
    "gen_sequential_model",
    "ADCFunctionalModel",
    "gen_functional_model",
]
