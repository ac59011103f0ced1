# encodermap_tpu/parallel/mesh.py
"""Mesh construction and sharding rules.

The reference has no distributed training at all (SURVEY.md section 2.8);
this module is the designed-fresh TPU scale-out path:

* ``dp`` axis: batch data parallelism. Batches and the device-resident
  dataset are sharded on their leading axis; the all-pairs sigmoid distance
  loss contracts over the full batch via one MXU matmul, for which XLA's
  GSPMD inserts the needed all-gathers over ICI automatically.
* ``tp`` axis: Megatron-style tensor parallelism over the MLP hidden dim —
  even layers split the kernel's output dim (column-parallel), odd layers the
  input dim (row-parallel), so activations alternate sharded/partial with one
  reduce per pair. For EncoderMap-sized MLPs this is latency-bound and only
  pays off for very wide nets, but the wiring is exercised end-to-end by
  ``__graft_entry__.dryrun_multichip``.

Pipeline (pp) / sequence (sp) / expert (ep) parallelism have no natural
counterpart in a 6-layer MLP autoencoder; the chain dimension of the ADC
backmapping is the sp-analog and is parallelized *within* a chip by the
associative scan (``ops/backmap.py``).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "shard_params_tp", "replicate"]


def make_mesh(
    n_devices: Optional[int] = None,
    dp: Optional[int] = None,
    tp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a ("dp", "tp") mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(
            f"mesh requests {n_devices} devices but only {len(devices)} "
            f"are available ({[str(d) for d in devices[:4]]}...). For CPU "
            f"testing set XLA_FLAGS=--xla_force_host_platform_device_count="
            f"{n_devices}."
        )
    devices = devices[:n_devices]
    if dp is None:
        dp = n_devices // tp
    if dp * tp != n_devices:
        # ValueError with guidance, like the device-count check above —
        # a bare assert disappears under python -O and left a cryptic
        # reshape error (wave 34)
        raise ValueError(
            f"dp={dp} * tp={tp} != n_devices={n_devices}; tp must divide "
            f"the device count (or pass dp explicitly)"
        )
    dev_array = np.asarray(devices).reshape(dp, tp)
    return Mesh(dev_array, axis_names=("dp", "tp"))


def shard_batch(data: Any, mesh: Mesh) -> Any:
    """Shard (tuples of) arrays along the leading/batch axis over ``dp``."""
    sharding = NamedSharding(mesh, P("dp"))

    def put(x):
        return jax.device_put(x, sharding)

    if isinstance(data, (tuple, list)):
        return tuple(put(x) for x in data)
    return put(data)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def _mlp_layer_specs(n_layers: int) -> list[tuple[P, P]]:
    """(kernel_spec, bias_spec) per layer: alternate column/row parallel."""
    specs = []
    for i in range(n_layers):
        if i % 2 == 0:
            specs.append((P(None, "tp"), P("tp")))  # column-parallel
        else:
            specs.append((P("tp", None), P()))  # row-parallel
    return specs


def shard_params_tp(params: dict, mesh: Mesh) -> dict:
    """Apply tensor-parallel shardings to a {"encoder": [...], "decoder":
    [...]} MLP parameter pytree. The latent layer (last encoder layer) and
    the output layer stay replicated — they are tiny (dim 2 / input dim)."""

    def shard_stack(layers: list, skip_last: bool) -> list:
        n = len(layers)
        specs = _mlp_layer_specs(n)
        out = []
        for i, (layer, (k_spec, b_spec)) in enumerate(zip(layers, specs)):
            if skip_last and i == n - 1:
                k_spec, b_spec = P(), P()
            out.append(
                {
                    "kernel": jax.device_put(
                        layer["kernel"], NamedSharding(mesh, k_spec)
                    ),
                    "bias": jax.device_put(layer["bias"], NamedSharding(mesh, b_spec)),
                }
            )
        return out

    result = dict(params)
    result["encoder"] = shard_stack(params["encoder"], skip_last=True)
    result["decoder"] = shard_stack(params["decoder"], skip_last=True)
    # any other entries (e.g. ADC per-input densifiers) stay replicated
    for k, v in params.items():
        if k not in ("encoder", "decoder"):
            result[k] = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, NamedSharding(mesh, P())), v
            )
    return result
