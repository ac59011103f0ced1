# encodermap_tpu/train/__init__.py
"""Training orchestration: state, scan trainer, autoencoder classes, callbacks."""

from .autoencoder import Autoencoder, EncoderMap
from .core import TrainState, make_optimizer, make_scan_trainer

__all__ = [
    "Autoencoder",
    "EncoderMap",
    "TrainState",
    "make_optimizer",
    "make_scan_trainer",
]
