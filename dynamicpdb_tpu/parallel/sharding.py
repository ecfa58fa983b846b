"""Parameter/optimizer sharding rules for 2-D (data, model) meshes.

The reference's only strategy is data parallelism (SURVEY.md §2.4). Here DP
is the default, and a 'model' mesh axis optionally shards the big matrices
(GSPMD tensor parallelism): every weight whose last (output-feature) axis
divides the model-axis size is sharded over it — that covers the IPA
q/kv/point projections, the ConvNet channel dims (~90% of parameters) — and
XLA inserts the all-gathers/reduce-scatters over ICI. Optimizer state shards
identically (it is param-shaped), which also gives ZeRO-style memory scaling.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def param_spec(path: tuple, value, model_axis_size: int) -> P:
    """PartitionSpec for one parameter.

    Rule: shard the trailing (output) axis over 'model' when divisible and
    large enough to matter; replicate everything else (biases, norms, small
    heads).
    """
    if value.ndim >= 1 and value.shape[-1] % model_axis_size == 0 and (
        value.shape[-1] >= 128
    ):
        return P(*([None] * (value.ndim - 1) + ["model"]))
    return P()


def tree_shardings(tree, mesh: Mesh):
    """NamedShardings for a param-like pytree (params / grads / opt state)."""
    if "model" not in mesh.axis_names:
        rep = NamedSharding(mesh, P())
        return jax.tree_util.tree_map(lambda _: rep, tree)
    m = mesh.shape["model"]

    def one(path, v):
        return NamedSharding(mesh, param_spec(path, v, m))

    return jax.tree_util.tree_map_with_path(one, tree)


def zero_spec(path: tuple, value, mesh: Mesh) -> P:
    """ZeRO-1-style PartitionSpec for one optimizer-state leaf.

    The Adam pass is pure HBM traffic over params + three moments — the
    single largest slice of a flagship train step (docs/DESIGN.md: 40% of
    device time at B=1). Sharding the moments over the 'data' axis makes
    each device read/update 1/D of them; XLA then all-gathers the updated
    params over ICI (the ZeRO-1 pattern) instead of every device redoing
    the full elementwise pass.

    Rule: keep the param's 'model' sharding (moments are param-shaped), and
    additionally shard the LARGEST remaining axis divisible by the 'data'
    axis size. 'slice' (DCN) is never used — gathers must ride ICI.
    """
    dims = [None] * value.ndim
    taken = -1
    if "model" in mesh.axis_names:
        mspec = param_spec(path, value, mesh.shape["model"])
        if mspec != P():
            dims[value.ndim - 1] = "model"
            taken = value.ndim - 1
    d = mesh.shape.get("data", 1)
    if d > 1 and value.size >= 1024:
        best = -1
        for i, s in enumerate(value.shape):
            if i != taken and s % d == 0 and (
                best < 0 or s > value.shape[best]
            ):
                best = i
        if best >= 0:
            dims[best] = "data"
    return P(*dims)


def opt_state_shardings(opt_state, mesh: Mesh):
    """NamedShardings for an optimizer-state pytree (ZeRO over 'data' +
    any 'model' sharding the matching params carry)."""

    def one(path, v):
        return NamedSharding(mesh, zero_spec(path, v, mesh))

    return jax.tree_util.tree_map_with_path(one, opt_state)


def shard_params(params, mesh: Mesh):
    """Device-put params according to the sharding rules."""
    return jax.tree_util.tree_map(
        lambda v, s: jax.device_put(v, s), params, tree_shardings(params, mesh)
    )


def sharded_fraction(params, mesh: Mesh) -> float:
    """Fraction of parameter elements actually sharded (diagnostics)."""
    if "model" not in mesh.axis_names:
        return 0.0
    m = mesh.shape["model"]
    total = sharded = 0
    for path, v in jax.tree_util.tree_leaves_with_path(params):
        total += v.size
        if param_spec(path, v, m) != P():
            sharded += v.size
    return sharded / max(total, 1)
