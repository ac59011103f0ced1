# encodermap_tpu/data/__init__.py
"""Host data layer: trajectories, topology, CV storage, file IO."""

from .api import load
from .custom_topology import CustomTopology
from .cvstore import CVCollection
from .pdb import load_pdb, write_pdb
from .topology import Topology
from .trajectory import SingleTraj, TrajEnsemble

__all__ = [
    "load",
    "CustomTopology",
    "CVCollection",
    "load_pdb",
    "write_pdb",
    "Topology",
    "SingleTraj",
    "TrajEnsemble",
]
