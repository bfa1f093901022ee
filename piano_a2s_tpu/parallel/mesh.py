"""Device mesh + sharding helpers (data parallelism over ICI/DCN)."""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first n_devices devices.

    For multi-host runs, call jax.distributed.initialize() first; the mesh
    then spans all processes' devices (DCN between hosts, ICI within).
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across the data axis."""
    return NamedSharding(mesh, P(axis_name))


def put_batch(batch: dict, mesh: Mesh) -> dict:
    """Device-put a host batch dict with batch-axis sharding."""
    sharding = shard_batch(mesh)
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def put_replicated(tree, mesh: Mesh):
    return jax.device_put(tree, replicate(mesh))
