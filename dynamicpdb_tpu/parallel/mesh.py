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


def maybe_initialize_distributed() -> bool:
    """Multi-host runtime init (`jax.distributed.initialize`) — the
    TPU-native replacement for the reference's env-driven
    `dist.init_process_group('nccl')` (train_DFOLD_dynamics.py:373-382).

    No-op unless a coordinator is configured (JAX_COORDINATOR_ADDRESS /
    COORDINATOR_ADDRESS env, as set by multi-host TPU launchers); idempotent
    if the runtime was already initialized.
    """
    import os

    if not (
        os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("COORDINATOR_ADDRESS")
    ):
        return False
    try:
        jax.distributed.initialize()
    except RuntimeError as e:
        # Suppress only the benign re-init case (jax phrases it
        # "distributed.initialize should only be called once." — older
        # versions said "already initialized"). A genuine coordinator
        # failure (bad address, timeout) must NOT silently degrade a
        # multi-host launch to single-host behavior.
        msg = str(e).lower()
        if ("already initialized" not in msg
                and "only be called once" not in msg):
            raise
    return True


def detect_num_slices() -> int:
    """Number of distinct TPU slices among visible devices (1 on CPU/GPU or
    a single slice; >1 under Multislice where gradient reduction must also
    cross DCN)."""
    return len({getattr(d, "slice_index", 0) or 0 for d in jax.devices()})


def make_hybrid_mesh(
    n_slices: int | None = None, model_axis: int = 1
) -> Mesh:
    """Mesh with an explicit DCN outer axis: ('slice', 'data'[, 'model']).

    On real Multislice TPU (devices expose distinct `slice_index`), uses
    `mesh_utils.create_hybrid_device_mesh` so the 'slice' axis maps exactly
    onto DCN and the inner axes ride ICI — XLA then lowers the gradient
    all-reduce hierarchically (reduce-scatter/all-gather within a slice,
    one cross-slice combine over DCN per step). Elsewhere (tests, CPU
    emulation) pass `n_slices` explicitly and the device list is factored
    by adjacency, which preserves the mesh semantics without the fabric.
    """
    devices = jax.devices()
    n_dev = len(devices)
    detected = detect_num_slices()
    if n_slices is None:
        n_slices = detected
    if n_dev % n_slices or (n_dev // n_slices) % model_axis:
        raise ValueError(
            f"{n_dev} devices cannot factor into {n_slices} slices "
            f"x data x model={model_axis}"
        )
    data_axis = n_dev // n_slices // model_axis
    axes = ("slice", "data", "model")[: 2 + (model_axis > 1)]
    shape = (n_slices, data_axis) + ((model_axis,) if model_axis > 1 else ())
    if detected > 1:
        dev = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1,) + shape[1:],
            dcn_mesh_shape=(n_slices,) + (1,) * (len(shape) - 1),
        )
    else:
        dev = np.asarray(devices).reshape(shape)
    return Mesh(dev, axes)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch-of-windows) axis across every data-like
    mesh axis ('data', plus 'slice' under Multislice). 'model' (tensor
    parallelism) and 'seq' (residue-axis sequence parallelism, parallel/
    sp.py) replicate the batch instead."""
    axes = tuple(a for a in mesh.axis_names if a not in ("model", "seq"))
    return NamedSharding(mesh, P(axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place a host batch with the leading axis split across 'data'.

    Single-process: a plain device_put against the batch sharding.
    Multi-host: each process holds only its LOCAL rows
    (EpochSampler.local_batch_size), so the global array must be assembled
    from per-process local data — device_put'ing the local stack against
    the global sharding would reinterpret it as the whole batch (a
    num_hosts-times-smaller effective batch with wrong row placement;
    review finding). Row order across hosts is immaterial here: a training
    batch is batch_size copies of ONE raw window whose diffusion draws are
    made per-row on device.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            batch,
        )
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def local_batch_indices(global_batch: int, process_index: int, process_count: int):
    """Per-host slice of the global batch (replaces DistributedSampler rank
    striding, Dfold_data_loader_dynamic.py:492-522)."""
    per_host = global_batch // process_count
    start = process_index * per_host
    return np.arange(start, start + per_host)
