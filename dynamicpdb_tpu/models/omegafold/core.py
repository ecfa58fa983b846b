"""OmegaFold core primitives in jnp (port step 1 of docs/OMEGAFOLD_PORT.md).

Functional equivalents of the reference extractor's building blocks
(/root/reference/src/toolbox/OmegaFold/omegafold/modules.py:60-330,
embedders.py:39-235): biased softmax attention with optional edge return,
RoPE, multi-headed scale-shift, relative-position embedding, and the
OmegaPLM GatedAttentionUnit forward. Verified weight-for-weight against the
torch reference (tests/test_omegafold_core.py).

The reference sub-batches attention over query chunks to bound torch peak
memory (modules.attention:109-170); under XLA that scheduling is the
compiler's job, so the math here is straight-line.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp


def layer_norm_f32(x, weight=None, bias=None, eps=1e-5,
                   unbiased: bool = False):
    """LayerNorm with statistics computed in f32 — the ONE shared
    implementation behind every OmegaFold-module normalize (utils.normalize
    / torch LayerNorm; reference torch_utils.py:74-80).

    Stats in f32 is an exact no-op for f32 input and keeps the opt-in bf16
    inference path stable (a bf16 mean/var over 1280-dim rows loses ~3
    decimal digits). ``unbiased=True`` mirrors torch.var's unbiased
    estimator used by utils.normalize(in_place=True).
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    if unbiased:
        n = x.shape[-1]
        var = jnp.sum((xf - mean) ** 2, axis=-1, keepdims=True) / max(
            n - 1, 1
        )
    else:
        var = jnp.var(xf, axis=-1, keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    if weight is not None:
        y = y * weight + bias
    return y


def attention(query, key, scale, value, bias, *, return_edge: bool = False,
              edge_reduction: str = "sum", edge_reduction_dim: int = 0):
    """Biased softmax attention: softmax(scale*q @ k^T + bias) @ v.

    Shapes follow the reference: query [*, Q, d], key [*, K, d],
    value [*, K, dv], bias broadcastable to [*, Q, K]. When return_edge, the
    attention weights reduced over ``edge_reduction_dim`` (counted among the
    batch dims, reference semantics) are returned as well.
    """
    logits = jnp.einsum("...id,...jd->...ij", query * scale, key)
    logits = logits + bias
    attn = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
    attn = attn / jnp.sum(attn, axis=-1, keepdims=True)
    out = jnp.einsum("...ij,...jd->...id", attn, value)
    if return_edge:
        red = getattr(jnp, edge_reduction)
        return out, red(attn, axis=edge_reduction_dim)
    return out, None


def rope(x, seq_dim: int):
    """Rotary position embedding, reference convention (embedders.py:141-181):
    positions run over the flattened ``seq_dim``; the feature dim is split
    into halves (x1, x2) -> [x1 cos - x2 sin, x2 cos + x1 sin]."""
    half = x.shape[-1] // 2
    inv_freq = 10000.0 ** (-jnp.arange(half, dtype=jnp.float32) / half)
    pos = jnp.arange(x.shape[seq_dim], dtype=x.dtype)
    sinusoid = pos[:, None] * inv_freq[None, :]
    sin, cos = jnp.sin(sinusoid), jnp.cos(sinusoid)
    # align [L, half] against x's (seq_dim, ..., feature) layout
    n_between = x.ndim - 1 - (seq_dim % x.ndim) - 1
    shape = (x.shape[seq_dim],) + (1,) * n_between + (half,)
    sin, cos = sin.reshape(shape), cos.reshape(shape)
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], -1)


def multi_headed_scaling(x, weight, bias, on_out_ready=None):
    """Elementwise scale-shift into ``num_heads`` copies
    (modules.MultiHeadedScaling:224-330). weight/bias: [num_heads, d];
    x: [..., d]. Returns a list of num_heads tensors shaped like x."""
    num_heads = weight.shape[0]
    y = x[..., None, :] * weight + bias  # [..., H, d]
    if on_out_ready is not None:
        y = on_out_ready(y)
    return [y[..., h, :] for h in range(num_heads)]


def relpos_embedding(table, num_res: int):
    """AF2 Suppl. Alg. 4 relpos lookup (embedders.RelPosEmbedder:203-220).
    table: [2*one_side + 1, dim] -> [num_res, num_res, dim]."""
    one_side = table.shape[0] // 2
    idx = jnp.arange(num_res)
    rel = jnp.clip(idx[None, :] - idx[:, None], -one_side, one_side) + one_side
    return table[rel]


def gau_qk_scaling(num_res, attn_dim: int):
    """log(N)/(log(512) * sqrt(d)) logits scaling (omegaplm.py:38-50)."""
    num_res = jnp.asarray(num_res, jnp.float32)
    return jnp.log(jnp.clip(num_res, 4e-5)) / (
        math.log(512) * attn_dim ** 0.5
    )


class GAUParams(NamedTuple):
    """GatedAttentionUnit weights (omegaplm.py:57-122)."""

    gva_w: jnp.ndarray  # [node, 2*proj + attn]
    gva_b: jnp.ndarray
    mhs_weight: jnp.ndarray  # [2, attn_dim] scale for (q, k)
    mhs_bias: jnp.ndarray  # [2, attn_dim]
    relpos_table: jnp.ndarray  # [num_relpos, 1]
    out_w: jnp.ndarray  # [proj, node]
    out_b: jnp.ndarray


def gated_attention_unit(p: GAUParams, node, scaling, bias, *,
                         proj_dim: int, attn_dim: int):
    """OmegaPLM GAU forward: fused gate/value/base projection -> per-head
    scale-shift + RoPE -> biased attention (+relpos scalar bias) -> gated
    output projection. node: [..., L, node_dim]; bias broadcastable to
    [..., L, L]. Returns (node_update, edge) with edge summed over the
    pseudo-MSA dim (axis -3 of the attention weights)."""
    gva = jnp.einsum("...d,de->...e", node, p.gva_w) + p.gva_b
    gva = gva * jnp.reciprocal(1 + jnp.exp(-gva))  # SiLU
    gates = gva[..., :proj_dim]
    values = gva[..., proj_dim:2 * proj_dim]
    base = gva[..., 2 * proj_dim:]

    queries, keys = multi_headed_scaling(
        base, p.mhs_weight, p.mhs_bias,
        on_out_ready=lambda x: rope(x, x.ndim - 3),
    )
    rel = relpos_embedding(p.relpos_table, base.shape[-2])[..., 0]
    out, edge = attention(
        queries, keys, scaling, values, bias + rel,
        return_edge=True, edge_reduction="sum", edge_reduction_dim=-3,
    )
    out = out * gates
    return jnp.einsum("...d,de->...e", out, p.out_w) + p.out_b, edge
