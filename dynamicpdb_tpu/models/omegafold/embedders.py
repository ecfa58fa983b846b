"""OmegaFold input/recycle embedders in jnp (port step 5).

Equivalents of /root/reference/src/toolbox/OmegaFold/omegafold/embedders.py:
120-275: EdgeEmbedder (per-token i/j projections + AF2 relpos) and
RecycleEmbedder (layer-normed previous node/edge plus a pseudo-beta
distogram of the previous cycle's atom positions).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from dynamicpdb_tpu.models.omegafold.atoms import tables as omegafold_tables
from dynamicpdb_tpu.models.omegafold.core import relpos_embedding
from dynamicpdb_tpu.models.omegafold.structure import _ln


class EdgeEmbedderParams(NamedTuple):
    proj_i: jnp.ndarray  # [alphabet, edge_dim]
    proj_j: jnp.ndarray
    relpos_table: jnp.ndarray  # [2*relpos_len + 1, edge_dim]


def edge_embedder(p: EdgeEmbedderParams, fasta, out):
    """fasta [L] tokens; out [L, L, edge_dim] accumulates in place-style."""
    out = out + p.proj_i[fasta][:, None]
    out = out + p.proj_j[fasta][None, :]
    return out + relpos_embedding(p.relpos_table, fasta.shape[-1])


def edge_embedder_from_torch(mod) -> EdgeEmbedderParams:
    t = lambda x: jnp.asarray(x.detach().numpy())
    return EdgeEmbedderParams(
        proj_i=t(mod.proj_i.weight),
        proj_j=t(mod.proj_j.weight),
        relpos_table=t(mod.relpos.weight),
    )


class RecycleEmbedderParams(NamedTuple):
    ln_node: tuple  # (w, b)
    ln_edge: tuple
    prev_pos_embed: jnp.ndarray  # [num_bins, edge_dim]
    breaks: jnp.ndarray  # [num_bins - 1] distogram bin edges


def create_pseudo_beta(atom14_pos, atom14_mask):
    """CB when present else CA (functions.create_pseudo_beta; atom14 layout
    N CA C O CB ...)."""
    has_cb = atom14_mask[..., 4:5] > 0
    return jnp.where(has_cb, atom14_pos[..., 4, :], atom14_pos[..., 1, :])


def recycle_embedder(p: RecycleEmbedderParams, fasta, prev_node, prev_edge,
                     prev_x, node_repr, edge_repr):
    """Mirror of RecycleEmbedder.forward (embedders.py:241-275): the distogram
    of the previous cycle's pseudo-beta coords + normed previous reprs are
    added into the fresh PLM-derived representations. node_repr [M, L, d]:
    only row 0 (the unmasked sequence) receives the node recycle."""
    # OmegaFold's own atom mask table (22 rows: the '-'/mask token maps to a
    # zero row, unlike the 21-row AF2 table; residue_constants.py:417-423)
    atom_mask = omegafold_tables()["restype2atom_mask"][fasta]
    beta = create_pseudo_beta(prev_x, atom_mask)
    d = jnp.linalg.norm(beta[:, None] - beta[None, :], axis=-1)
    bins = jnp.sum(d[..., None] > p.breaks, axis=-1)
    node_repr = node_repr.at[..., 0, :, :].add(_ln(prev_node, *p.ln_node))
    edge_repr = edge_repr + p.prev_pos_embed[bins]
    edge_repr = edge_repr + _ln(prev_edge, *p.ln_edge)
    return node_repr, edge_repr


def recycle_embedder_from_torch(mod) -> RecycleEmbedderParams:
    t = lambda x: jnp.asarray(x.detach().numpy())
    return RecycleEmbedderParams(
        ln_node=(t(mod.layernorm_node.weight), t(mod.layernorm_node.bias)),
        ln_edge=(t(mod.layernorm_edge.weight), t(mod.layernorm_edge.bias)),
        prev_pos_embed=t(mod.prev_pos_embed.weight),
        breaks=jnp.linspace(
            float(mod.dgram.cfg.first_break),
            float(mod.dgram.cfg.last_break),
            int(mod.dgram.cfg.num_bins) - 1,
        ),
    )
