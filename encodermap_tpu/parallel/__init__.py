# encodermap_tpu/parallel/__init__.py
"""Device-mesh parallelism: dp (batch) x tp (hidden-dim) sharding."""

from .mesh import (
    make_mesh,
    shard_batch,
    shard_params_tp,
    replicate,
)

__all__ = ["make_mesh", "shard_batch", "shard_params_tp", "replicate"]
