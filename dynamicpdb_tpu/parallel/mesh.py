"""Device mesh + sharding helpers.

Replaces the reference's DDP/NCCL layer (train_DFOLD_dynamics.py:373-382,
609-625; DistributedSampler plumbing) with the JAX SPMD model: a
`jax.sharding.Mesh` over all chips, batch inputs sharded along the 'data'
axis, parameters replicated (or sharded along 'model' for tensor
parallelism), and gradient all-reduce emitted by XLA over ICI — no
hand-written collectives.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: tuple = (), axes: tuple = ("data",)) -> Mesh:
    """Create a device mesh. shape=() -> all devices on one 'data' axis."""
    if not shape:
        shape = (jax.device_count(),)
    devices = mesh_utils.create_device_mesh(shape)
    return Mesh(devices, axes[: len(shape)])


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch-of-windows) axis across the 'data' axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Device-put a host batch with the leading axis split across 'data'."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def local_batch_indices(global_batch: int, process_index: int, process_count: int):
    """Per-host slice of the global batch (replaces DistributedSampler rank
    striding, Dfold_data_loader_dynamic.py:492-522)."""
    per_host = global_batch // process_count
    start = process_index * per_host
    return np.arange(start, start + per_host)
