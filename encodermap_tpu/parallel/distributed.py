# encodermap_tpu/parallel/distributed.py
"""Multi-host (pod-scale) execution helpers.

The reference is strictly single-process (SURVEY.md section 2.8 — its only
"distributed" machinery is a dask process pool for featurization). On TPU
pods, JAX runs one process per host and every process must participate in the
same SPMD program; these helpers wrap the initialization handshake and the
host-local data placement so the trainers stay process-count agnostic:

* :func:`initialize` — ``jax.distributed.initialize`` with TPU-pod
  autodetection and a no-op fast path for single-process runs.
* :func:`global_mesh` — a ("dp", "tp") mesh over *all* processes' devices.
* :func:`host_local_batch` — turn each process's local shard of a global
  batch into one global ``jax.Array`` (the multi-host analog of
  ``mesh.shard_batch``).
* :func:`is_primary` / :func:`primary_only` — gate checkpoint / TensorBoard /
  tqdm side effects to process 0, the way every trainer here writes output.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import make_mesh

__all__ = [
    "initialize",
    "is_primary",
    "primary_only",
    "global_mesh",
    "host_local_batch",
    "process_local_slice",
]

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """Join the multi-process JAX runtime.

    On TPU pods all arguments are autodetected from the environment; on
    CPU/GPU clusters pass the coordinator explicitly. Safe to call in a
    single-process run (no-op when no coordinator can be inferred) and safe
    to call twice.
    """
    global _initialized
    if _initialized:
        # a previous call may have been the single-process no-op; an
        # explicit coordinator must still take effect, not be swallowed
        if _initialized == "joined" or coordinator_address is None:
            return
    import os

    # Decide from the ENVIRONMENT only — jax.process_count() (or any
    # other device/backend query) would initialize the XLA backend, after
    # which jax.distributed.initialize() raises RuntimeError ("must be
    # called before any JAX computations are executed"), making pod init
    # impossible. TPU_WORKER_HOSTNAMES is set even on single-host TPU
    # VMs; only a comma-separated list implies an actual pod.
    multi_host_workers = "," in os.environ.get("TPU_WORKER_HOSTNAMES", "")
    autodetectable = (
        coordinator_address is not None
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
        or multi_host_workers
    )
    if not autodetectable:
        _initialized = "no-op"  # single-process; an explicit
        return                   # coordinator later still proceeds
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _initialized = "joined"


def is_primary() -> bool:
    """True on the process that should write checkpoints/summaries/logs."""
    return jax.process_index() == 0


def primary_only(fn: Callable) -> Callable:
    """Decorator: run ``fn`` only on process 0 (returns None elsewhere)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if is_primary():
            return fn(*args, **kwargs)
        return None

    return wrapper


def global_mesh(dp: Optional[int] = None, tp: int = 1) -> Mesh:
    """A ("dp", "tp") mesh over every device of every process.

    ``jax.devices()`` already enumerates the full pod after
    :func:`initialize`; the dp axis defaults to ``total_devices // tp``.
    """
    return make_mesh(dp=dp, tp=tp, devices=jax.devices())


def process_local_slice(n_global: int) -> slice:
    """The half-open range of global batch rows this process should load.

    Used by data loaders so each host reads only its own shard from disk
    (HDF5/XTC) instead of materializing the global batch everywhere.

    Every process gets EXACTLY ``n_global // process_count`` rows — the
    remainder is dropped (standard data-parallel practice): GSPMD sharding
    requires the dp axis to divide evenly across shards, so uneven
    per-process shards could never be assembled into one global array
    (``jax.make_array_from_process_local_data`` rejects non-divisible
    global shapes).
    """
    k = n_global // jax.process_count()
    i = jax.process_index()
    return slice(i * k, (i + 1) * k)


def host_local_batch(
    local: Any, mesh: Mesh, spec: P = P("dp"),
    n_global: Optional[int] = None,
) -> Any:
    """Assemble per-process local shards into global ``jax.Array``s.

    Each process passes the rows from :func:`process_local_slice`; the
    result is one logical array sharded over the mesh's dp axis, usable
    directly inside ``jit`` without any host gathers. Works unchanged in
    single-process runs (where it is just a sharded device_put).

    Shards must be UNIFORM across processes — feed rows from
    :func:`process_local_slice`, which drops the uneven remainder (GSPMD
    requires the dp axis to divide evenly across shards; JAX's
    ``make_array_from_process_local_data`` rejects non-divisible global
    shapes outright). ``n_global`` is optional and only cross-checked.
    """
    sharding = NamedSharding(mesh, spec)
    pc = jax.process_count()
    if n_global is not None and n_global % pc:
        raise ValueError(
            f"n_global={n_global} does not divide evenly over {pc} "
            f"processes; slice your rows with process_local_slice "
            f"(which drops the remainder) and pass n_global="
            f"{n_global - n_global % pc} or None."
        )

    def put(x):
        x = np.asarray(x)
        if pc == 1:
            return jax.device_put(x, sharding)
        global_shape = (
            (n_global,) + x.shape[1:] if n_global is not None else None
        )
        return jax.make_array_from_process_local_data(
            sharding, x, global_shape
        )

    if isinstance(local, (tuple, list)):
        return tuple(put(x) for x in local)
    if isinstance(local, dict):
        return {k: put(v) for k, v in local.items()}
    return put(local)
