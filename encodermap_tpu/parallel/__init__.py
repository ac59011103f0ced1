# encodermap_tpu/parallel/__init__.py
"""Device-mesh parallelism: dp (batch) x tp (hidden-dim) sharding, plus
multi-host (pod) runtime helpers."""

from .distributed import (
    global_mesh,
    host_local_batch,
    initialize,
    is_primary,
    primary_only,
    process_local_slice,
)
from .mesh import (
    make_mesh,
    shard_batch,
    shard_params_tp,
    replicate,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "shard_params_tp",
    "replicate",
    "initialize",
    "is_primary",
    "primary_only",
    "global_mesh",
    "host_local_batch",
    "process_local_slice",
]
