"""Device mesh + sharding helpers (data parallelism over ICI/DCN)."""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def distributed_init(**kwargs) -> None:
    """jax.distributed.initialize() + collective-context warm-up.

    The warm-up barrier matters: XLA's CPU (Gloo) — and in general any
    lazily-created — collective context is established at the FIRST
    cross-process collective execution, under a hard internal rendezvous
    deadline (~30 s for Gloo's key-value exchange). In a real run the
    first collective fires only after each process has compiled its step
    functions, and compile times diverge between loaded hosts — blowing
    that deadline looks like `Gloo context initialization failed:
    DEADLINE_EXCEEDED`. Right after initialize() returns, every process
    is still in lockstep from the coordinator handshake, so establishing
    the context here makes later collectives immune to compile skew.
    """
    jax.distributed.initialize(**kwargs)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("piano_a2s_tpu:startup")


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


def local_row_range(mesh: Mesh, global_batch: int,
                    axis_name: str = "data"):
    """The contiguous [lo, hi) global-batch rows owned by THIS process's
    devices under shard_batch(mesh). Raises if the rows are not contiguous
    (a mesh whose device order interleaves processes cannot take per-host
    contiguous shards)."""
    sharding = shard_batch(mesh, axis_name)
    idx_map = sharding.addressable_devices_indices_map((global_batch,))
    bounds = sorted((s[0].start or 0,
                     global_batch if s[0].stop is None else s[0].stop)
                    for s in idx_map.values())
    lo, hi = bounds[0][0], bounds[-1][1]
    covered = sum(b - a for a, b in bounds)
    if covered != hi - lo:
        raise ValueError(
            f"process-local rows {bounds} are not contiguous; build the "
            f"mesh from jax.devices() (process-major order) for per-host "
            f"sharded loading")
    return lo, hi


def put_batch_process_local(batch: dict, mesh: Mesh, local_rows) -> dict:
    """Assemble globally-sharded device arrays from per-host data.

    Array values may be GLOBAL (all rows; e.g. the target arrays every
    host loads) or LOCAL (only this host's shard rows; e.g. spectrograms)
    — distinguished by leading-dimension size. local_rows=(lo, hi) is the
    loader's claim of which global rows its local arrays hold; it must
    match the rows this process's devices actually own under the batch
    sharding, otherwise rows would be silently misassigned.
    """
    lo, hi = local_rows
    sharding = shard_batch(mesh)
    out = {}
    global_b = None
    for v in batch.values():
        b = np.asarray(v).shape[0]
        global_b = max(global_b or 0, b)
    own_lo, own_hi = local_row_range(mesh, global_b)
    if (own_lo, own_hi) != (lo, hi):
        raise ValueError(
            f"loader shard rows [{lo},{hi}) != rows [{own_lo},{own_hi}) "
            f"owned by process {jax.process_index()}'s devices — the "
            f"DataLoader shard=(rank, world) must follow the mesh's "
            f"process order")
    for k, v in batch.items():
        v = np.asarray(v)
        local = v[lo:hi] if v.shape[0] == global_b else v
        out[k] = jax.make_array_from_process_local_data(
            sharding, local, (global_b,) + local.shape[1:])
    return out
