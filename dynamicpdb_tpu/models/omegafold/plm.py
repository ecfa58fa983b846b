"""OmegaPLM in jnp (port step 2 of docs/OMEGAFOLD_PORT.md).

The protein language model of the reference extractor
(/root/reference/src/toolbox/OmegaFold/omegafold/omegaplm.py:160-250):
token embedding with Rives-style token-dropout rescaling, a stack of
pre-layer-norm GatedAttentionUnit layers (66 at full size), and an output
LayerNorm. Each layer's pseudo-MSA-summed attention map is collected as one
channel of the edge representation (later projected 66 -> edge_dim by the
OmegaFold trunk).

The layer stack runs under ``lax.scan`` over stacked per-layer parameters —
one compiled layer body instead of 66 unrolled copies.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dynamicpdb_tpu.models.omegafold.core import (
    layer_norm_f32 as _layer_norm,
    GAUParams,
    gated_attention_unit,
    gau_qk_scaling,
)
from dynamicpdb_tpu.parallel import sp


class PLMConfig(NamedTuple):
    alphabet_size: int = 23
    node: int = 1280
    padding_idx: int = 21  # the mask token index used by token dropout
    num_layers: int = 66  # reference names this cfg.edge
    proj_dim: int = 2560
    attn_dim: int = 256
    num_relpos: int = 129
    masked_ratio: float = 0.12


class PLMParams(NamedTuple):
    embedding: jnp.ndarray  # [alphabet, node]
    layers: GAUParams  # GAUParams with a leading [num_layers] axis per leaf
    out_ln_weight: jnp.ndarray  # [node]
    out_ln_bias: jnp.ndarray


def _finetuning_scale(cfg: PLMConfig, mask, tokens):
    """Token-dropout rescaling (Rives et al. 2021; omegaplm.py:221-243)."""
    # f32 accumulation: under dtype=bfloat16 the mask arrives bf16, and a
    # bf16 sum loses integer precision past 256 residues (spacing 2-4),
    # perturbing the rescale in exactly the advertised long-N padded regime.
    src_len = jnp.sum(mask, axis=-1, dtype=jnp.float32)
    observed = jnp.sum(tokens == 21, axis=-1).astype(jnp.float32) / src_len
    observed = jnp.where(observed == 1.0, 0.99, observed)
    return ((1 - cfg.masked_ratio) / (1 - observed))[:, None, None]


def omega_plm(params: PLMParams, cfg: PLMConfig, tokens, mask):
    """tokens/mask: [M, L] (pseudo-MSA rows x residues).

    Returns (node [M, L, node], edges [num_layers, L, L]).
    """
    qk_scaling = gau_qk_scaling(
        jnp.sum(mask, -1, dtype=jnp.float32), cfg.attn_dim
    )
    qk_scaling = qk_scaling[..., None, None]
    bias = (mask[..., None, :].astype(jnp.float32) - 1.0) * 1e9  # [M, 1, L]

    node = params.embedding[tokens]
    node = node * _finetuning_scale(cfg, mask, tokens)

    def layer(node, lp: GAUParams):
        # sequence parallelism (parallel/sp.py): node shards over its
        # residue axis, each per-layer [L, L] edge map over its query
        # axis — identities when no 'seq' mesh is active
        node = sp.shard(node, None, "seq")
        shortcut = node
        normed = _layer_norm(node)
        update, edge = gated_attention_unit(
            lp, normed, qk_scaling, bias,
            proj_dim=cfg.proj_dim, attn_dim=cfg.attn_dim,
        )
        return shortcut + update, sp.shard(edge, "seq")

    node, edges = jax.lax.scan(layer, node, params.layers)
    node = _layer_norm(node, params.out_ln_weight, params.out_ln_bias)
    edges = edges / (jnp.sum(jnp.any(mask, -1)) + 1e-5)
    return node, edges


def params_from_torch(torch_plm) -> tuple[PLMParams, PLMConfig]:
    """Convert a reference torch OmegaPLM module's weights (mapping only;
    used by tests and the round-2 released-weight importer)."""
    import numpy as np

    def t(x):
        return jnp.asarray(x.detach().numpy())

    gaus = [l.gau for l in torch_plm.layers]
    layers = GAUParams(
        gva_w=jnp.stack([t(g.gva_proj[0].weight).T for g in gaus]),
        gva_b=jnp.stack([t(g.gva_proj[0].bias) for g in gaus]),
        mhs_weight=jnp.stack([t(g.multi_headed_scaling.weight) for g in gaus]),
        mhs_bias=jnp.stack([t(g.multi_headed_scaling.bias) for g in gaus]),
        relpos_table=jnp.stack([t(g.relpos.weight) for g in gaus]),
        out_w=jnp.stack([t(g.output_proj.weight).T for g in gaus]),
        out_b=jnp.stack([t(g.output_proj.bias) for g in gaus]),
    )
    params = PLMParams(
        embedding=t(torch_plm.input_embedding.weight),
        layers=layers,
        out_ln_weight=t(torch_plm.output_norm.weight),
        out_ln_bias=t(torch_plm.output_norm.bias),
    )
    c = torch_plm.cfg
    cfg = PLMConfig(
        alphabet_size=c.alphabet_size, node=c.node, padding_idx=c.padding_idx,
        num_layers=c.edge, proj_dim=c.proj_dim, attn_dim=c.attn_dim,
        num_relpos=c.num_relpos, masked_ratio=c.masked_ratio,
    )
    return params, cfg
