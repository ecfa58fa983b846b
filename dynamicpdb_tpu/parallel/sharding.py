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
