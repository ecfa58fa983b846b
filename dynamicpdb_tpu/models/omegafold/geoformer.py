"""GeoFormer trunk in jnp (port step 3 of docs/OMEGAFOLD_PORT.md).

Functional equivalents of the reference's geometry-aware encoder
(/root/reference/src/toolbox/OmegaFold/omegafold/modules.py:196-730,
geoformer.py:43-190): gated multi-axis attention, attention with edge bias,
parameter-free pre-LN transitions, node->edge outer products, and the
two-axis GeometricAttention over the edge tensor. The reference shards all
of these over sub-batches for torch memory control; under XLA the math is
straight-line and scheduling is the compiler's.

Weight layouts follow the reference parameter shapes exactly so torch
state_dicts import 1:1 (see *_from_torch helpers and
tests/test_omegafold_core.py parity checks).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dynamicpdb_tpu.models.omegafold.core import attention
from dynamicpdb_tpu.models.omegafold.core import layer_norm_f32 as _normalize
from dynamicpdb_tpu.parallel import sp


def _mask2bias(mask, inf=1e9):
    return (mask.astype(jnp.float32) - 1.0) * inf


# ---------------------------------------------------------------------------
# gated multi-axis attention (modules.Attention:354-484)
# ---------------------------------------------------------------------------
class AttnParams(NamedTuple):
    qg_weights: jnp.ndarray  # [q_dim, n_axis, H, (1+gating)*c]
    qg_bias: jnp.ndarray  # [n_axis, H, 1, (1+gating)*c]
    kv_weights: jnp.ndarray  # [kv_dim, n_axis, H, 2c]
    kv_bias: jnp.ndarray  # [n_axis, H, 1, 2c]
    o_weights: jnp.ndarray  # [n_axis, H, c, out]
    o_bias: jnp.ndarray  # [out, n_axis]


def gated_attention(p: AttnParams, q_inputs, kv_inputs, bias, *,
                    c: int, gating: bool, n_axis: int, q_dim: int):
    """q_inputs/kv_inputs: (*, len, dim[, n_axis]); bias broadcastable to
    (*, n_axis, H, q_len, kv_len). (Fused Pallas variants live in
    ops/pallas/geom_attention.py and are dispatched by the specific
    attention wrappers, not here.)"""
    to_unsqueeze = q_inputs.shape[-1] != n_axis and q_inputs.shape[-1] == q_dim
    if to_unsqueeze:
        q_inputs = q_inputs[..., None]
        kv_inputs = kv_inputs[..., None]
        if bias is not None:
            bias = jnp.expand_dims(bias, -4)

    qg = jnp.einsum("...qar,arhc->...rhqc", q_inputs, p.qg_weights) + p.qg_bias
    q = qg[..., :c]
    kv = jnp.einsum("...kar,arhc->...rhkc", kv_inputs, p.kv_weights) + p.kv_bias
    k, v = kv[..., :c], kv[..., c:]
    out, _ = attention(q, k, c ** (-0.5), v, bias)
    if gating:
        out = out * jax.nn.sigmoid(qg[..., c:])

    out = _attn_out_proj(out, p)
    if to_unsqueeze:
        out = out[..., 0]
    return out


def _attn_out_proj(out, p: AttnParams):
    """Per-axis output projection shared by the dense path and the fused
    Pallas paths (which apply it after their kernels)."""
    return jnp.einsum("...rhqc,rhco->...qor", out, p.o_weights) + p.o_bias


def attn_params_from_torch(mod) -> AttnParams:
    t = lambda x: jnp.asarray(x.detach().numpy())
    return AttnParams(
        qg_weights=t(mod.qg_weights), qg_bias=t(mod.qg_bias),
        kv_weights=t(mod.kv_weights), kv_bias=t(mod.kv_bias),
        o_weights=t(mod.o_weights), o_bias=t(mod.o_bias),
    )


# ---------------------------------------------------------------------------
# attention with edge bias (modules.AttentionWEdgeBias:487-540)
# ---------------------------------------------------------------------------
class AttnWEdgeBiasParams(NamedTuple):
    proj_edge_w: jnp.ndarray  # [d_edge, H]
    proj_edge_b: jnp.ndarray  # [H]
    attn: AttnParams


def attention_w_edge_bias(p: AttnWEdgeBiasParams, node, edge, mask, *,
                          c: int, gating: bool = True, flash: bool = False):
    """node [M, L, d]; edge [L, L, de]; mask [M, L] — the FULL pseudo-MSA
    mask: each row gets its own key masking (GeoFormerBlock.forward passes
    the [M, L] mask straight through, geoformer.py:110-115; the bias
    broadcast at modules.py:527-529 is [M, H, L, L]).

    flash=True: the row-shared edge bias and the per-row key mask are kept
    separate so the fused kernel (fused_gated_node_attention) can hold the
    bias VMEM-resident across rows; dense-path equivalent to fp tolerance.
    """
    node = _normalize(node)
    edge = _normalize(edge)
    edge_bias = jnp.einsum("ijd,dh->hij", edge, p.proj_edge_w) + (
        p.proj_edge_b[:, None, None]
    )
    from dynamicpdb_tpu.ops.pallas.geom_attention import (
        MAX_FLASH_RES,
        fused_gated_node_attention,
    )

    if flash and gating and node.shape[-2] <= MAX_FLASH_RES:
        a = p.attn
        out = fused_gated_node_attention(
            node, a.qg_weights, a.qg_bias, a.kv_weights, a.kv_bias,
            edge_bias.astype(jnp.float32), mask,
            c=c, scale=c ** (-0.5),
        )  # [M, H, L, c]
        return _attn_out_proj(out[:, None], a)[..., 0]
    edge_bias = edge_bias + _mask2bias(mask[..., None, None, :])
    return gated_attention(
        p.attn, node, node, edge_bias,
        c=c, gating=gating, n_axis=1, q_dim=node.shape[-1],
    )


# ---------------------------------------------------------------------------
# transition (modules.Transition:198-221)
# ---------------------------------------------------------------------------
class TransitionParams(NamedTuple):
    w1: jnp.ndarray
    b1: jnp.ndarray
    w2: jnp.ndarray
    b2: jnp.ndarray


def transition(p: TransitionParams, x, activation: str = "ReLU"):
    x = _normalize(x)
    h = jnp.einsum("...d,de->...e", x, p.w1) + p.b1
    h = jax.nn.relu(h) if activation == "ReLU" else jax.nn.gelu(h)
    return jnp.einsum("...d,de->...e", h, p.w2) + p.b2


def transition_params_from_torch(mod) -> TransitionParams:
    t = lambda x: jnp.asarray(x.detach().numpy())
    return TransitionParams(
        w1=t(mod.network[0].weight).T, b1=t(mod.network[0].bias),
        w2=t(mod.network[2].weight).T, b2=t(mod.network[2].bias),
    )


# ---------------------------------------------------------------------------
# node -> edge outer product (modules.Node2Edge:311-352)
# ---------------------------------------------------------------------------
class Node2EdgeParams(NamedTuple):
    in_w: jnp.ndarray  # [node, 2*proj]
    in_b: jnp.ndarray
    out_weights: jnp.ndarray  # [proj, proj, out]
    out_bias: jnp.ndarray


def node2edge(p: Node2EdgeParams, node, mask):
    """node: [M, L, d]; mask: [M, L]. Masked mean outer product over rows."""
    proj = p.out_weights.shape[0]
    node = _normalize(node)
    act = jnp.einsum("...d,de->...e", node, p.in_w) + p.in_b
    m = mask[..., None]
    act = act * m
    norm = jnp.einsum("sid,sjd->ijd", m, m)
    left, right = act[..., :proj], act[..., proj:]
    out = jnp.einsum("sid,def,sje->ijf", left, p.out_weights, right) + p.out_bias
    return out / (norm + 1e-3)


def node2edge_params_from_torch(mod) -> Node2EdgeParams:
    t = lambda x: jnp.asarray(x.detach().numpy())
    return Node2EdgeParams(
        in_w=t(mod.input_proj.weight).T, in_b=t(mod.input_proj.bias),
        out_weights=t(mod.out_weights), out_bias=t(mod.out_bias),
    )


# ---------------------------------------------------------------------------
# geometric attention over the edge tensor (modules.GeometricAttention:568-720)
# ---------------------------------------------------------------------------
class GeomAttnParams(NamedTuple):
    linear_b_w: jnp.ndarray  # [d_edge, 2, H]
    linear_b_b: jnp.ndarray  # [2, H, 1, 1]
    act_w: jnp.ndarray  # [d_edge, 2, 5*d_edge]
    act_b: jnp.ndarray  # [2, 5*d_edge]
    out_proj_w: jnp.ndarray  # [2, d_edge, d_edge]
    out_proj_b: jnp.ndarray  # [2, d_edge]
    attn: AttnParams


def _glu(x):
    a, b = jnp.split(x, 2, axis=-1)
    return a * jax.nn.sigmoid(b)


def _sliced(w, d_edge, shift):
    """act_w[..., :-d] unflattened to (4, d), take [shift::2] -> (2, d)."""
    core = w[..., : 4 * d_edge]
    core = core.reshape(core.shape[:-1] + (4, d_edge))
    return core[..., shift::2, :].reshape(core.shape[:-2] + (2 * d_edge,))


def geometric_attention(p: GeomAttnParams, edge, mask, *, c: int, n_head: int,
                        flash: bool = False, pad_safe: bool = False):
    """edge: [L, L, d]; mask: [L]. Returns the residual update.

    pad_safe=True closes the two places the reference lets unmasked
    positions leak (harmless there — it never pads): the attended branch's
    overwritten mask bias and the triangle contraction's unmasked summed-out
    axis. Bitwise identical to pad_safe=False when mask is all-ones; used by
    padded extraction (pipeline pad_to) so padding cannot perturb real
    positions.
    """
    from dynamicpdb_tpu.ops.pallas.geom_attention import (
        MAX_FLASH_RES,
        fused_gated_geom_attention_t,
    )

    d = edge.shape[-1]
    edge = _normalize(edge)
    # a pallas_call is opaque to GSPMD: under a 'seq' mesh (parallel/sp.py)
    # the dense einsum path partitions, the fused kernel would all-gather
    use_flash = flash and edge.shape[-2] <= MAX_FLASH_RES and not sp.is_active()
    # The two layouts hold the same [edge, edge^T] pair; AXIS-MAJOR feeds
    # the fused kernel directly (per-(row, axis) blocks are contiguous), so
    # the flash path never materializes the axis-minor tensor (and vice
    # versa) — the einsum subscripts below absorb the difference.
    if use_flash:
        stacked_t = jnp.stack(
            [edge, jnp.swapaxes(edge, -2, -3)], axis=-3
        )  # [B, n_axis, L, d]
        sub_b = "qrkc,crh->rhqk"
        sub_row, sub_col, sub_g = (
            "irkd,drc->ikrc", "jrkd,drc->jkrc", "irjd,drc->ijrc",
        )
        stacked = stacked_t
    else:
        stacked = jnp.stack([edge, jnp.swapaxes(edge, -2, -3)], axis=-1)
        sub_b = "qkcr,crh->rhqk"
        sub_row, sub_col, sub_g = (
            "ikdr,drc->ikrc", "jkdr,drc->jkrc", "ijdr,drc->ijrc",
        )

    # attended branch: two-axis gated attention with projected edge bias.
    # NOTE: the reference initializes b with mask2bias and then fully
    # overwrites it with this einsum (modules.py:619-645) — its mask never
    # reaches the attended branch; mirrored here for parity (pad_safe
    # restores the key masking).
    b = jnp.einsum(sub_b, stacked, p.linear_b_w) + p.linear_b_b
    if pad_safe:
        b = b + _mask2bias(mask)[None, None, None, :]
    if use_flash:
        a = p.attn
        out5 = fused_gated_geom_attention_t(
            stacked_t, a.qg_weights, a.qg_bias, a.kv_weights, a.kv_bias,
            b, c=c, scale=c ** (-0.5),
        )  # [B, n_axis, H, L, c], gating applied in-kernel
        attended = _attn_out_proj(out5, a)
    else:
        attended = gated_attention(
            p.attn, stacked, stacked, b, c=c, gating=True, n_axis=2, q_dim=d,
        )
    attended = attended[..., 0] + jnp.swapaxes(attended[..., 1], -2, -3)

    # gated (triangle-multiplicative) branch
    row_w, row_b = _sliced(p.act_w, d, 0), _sliced(p.act_b, d, 0)
    col_w, col_b = _sliced(p.act_w, d, 1), _sliced(p.act_b, d, 1)
    act_row = _glu(jnp.einsum(sub_row, stacked, row_w) + row_b)
    act_row = act_row * mask[:, None, None, None]
    if pad_safe:
        act_row = act_row * mask[None, :, None, None]  # summed-out k axis
    act_col = _glu(jnp.einsum(sub_col, stacked, col_w) + col_b)
    act_col = act_col * mask[:, None, None, None]
    ab = jnp.einsum("ikrd,jkrd->ijrd", act_row, act_col)
    ab = _normalize(ab)
    gated = jnp.einsum("ijrd,rdc->ijrc", ab, p.out_proj_w) + p.out_proj_b
    act_g = jax.nn.sigmoid(
        jnp.einsum(sub_g, stacked, p.act_w[..., -d:])
        + p.act_b[..., -d:]
    )
    gated = gated * act_g[:, : gated.shape[1]]
    return attended + jnp.sum(gated, axis=-2)


def geom_params_from_torch(mod) -> GeomAttnParams:
    t = lambda x: jnp.asarray(x.detach().numpy())
    return GeomAttnParams(
        linear_b_w=t(mod.linear_b_weights), linear_b_b=t(mod.linear_b_bias),
        act_w=t(mod.act_w), act_b=t(mod.act_b),
        out_proj_w=t(mod.out_proj_w), out_proj_b=t(mod.out_proj_b),
        attn=attn_params_from_torch(mod.attention),
    )


# ---------------------------------------------------------------------------
# full block + trunk (geoformer.py:43-190)
# ---------------------------------------------------------------------------
class GeoFormerBlockParams(NamedTuple):
    attn_edge_bias: AttnWEdgeBiasParams
    column_attn: AttnParams
    node_transition: TransitionParams
    out_product: Node2EdgeParams
    geom: tuple  # tuple of GeomAttnParams
    edge_transition: TransitionParams


def geoformer_block(p: GeoFormerBlockParams, node, edge, mask, *,
                    attn_c: int, geom_c: int, geom_head: int,
                    flash: bool = False, pad_safe: bool = False):
    """node: [M, L, d_node]; edge: [L, L, d_edge]; mask: [M, L]."""
    # sequence parallelism (parallel/sp.py): the O(L^2) edge tensor shards
    # over 'seq' on its query axis, node over its residue axis — identities
    # when no 'seq' mesh is active. Constraints at the block boundary anchor
    # GSPMD's propagation through the attention/triangle einsums (and keep
    # the lax.scan carry sharded across the 50-block stack).
    node = sp.shard(node, None, "seq")
    edge = sp.shard(edge, "seq")
    # NOT flash: measured on v5e at release dims, flashing this attention
    # is net-negative (6.31 vs 6.23 s/seq and 4x the compile time) — its
    # dense projections are already large efficient matmuls and the logits
    # tensor is only [M, H, L, L] = 33 MB. The fused path remains available
    # (attention_w_edge_bias(flash=True)) for other shape regimes.
    node = node + attention_w_edge_bias(
        p.attn_edge_bias, node, edge, mask, c=attn_c
    )
    # column attention over the pseudo-MSA axis
    node_col = _normalize(jnp.swapaxes(node, -2, -3))
    col_bias = _mask2bias(mask.T[..., None, None, :])
    node_col = gated_attention(
        p.column_attn, node_col, node_col, col_bias,
        c=attn_c, gating=True, n_axis=1, q_dim=node.shape[-1],
    )
    node = node + jnp.swapaxes(node_col, -2, -3)
    node = node + transition(p.node_transition, node)

    edge = edge + node2edge(p.out_product, node, mask)
    for gp in p.geom:
        edge = edge + geometric_attention(
            gp, edge, mask[..., 0, :], c=geom_c, n_head=geom_head,
            flash=flash, pad_safe=pad_safe,
        )
        edge = sp.shard(edge, "seq")
    edge = edge + transition(p.edge_transition, edge)
    return node, edge


def block_params_from_torch(mod) -> GeoFormerBlockParams:
    t = lambda x: jnp.asarray(x.detach().numpy())
    return GeoFormerBlockParams(
        attn_edge_bias=AttnWEdgeBiasParams(
            proj_edge_w=t(mod.attention_w_edge_bias.proj_edge_bias.weight).T,
            proj_edge_b=t(mod.attention_w_edge_bias.proj_edge_bias.bias),
            attn=attn_params_from_torch(mod.attention_w_edge_bias.attention),
        ),
        column_attn=attn_params_from_torch(mod.column_attention),
        node_transition=transition_params_from_torch(mod.node_transition),
        out_product=node2edge_params_from_torch(mod.out_product),
        geom=tuple(geom_params_from_torch(g) for g in mod.geometric_attention),
        edge_transition=transition_params_from_torch(mod.edge_transition),
    )


# ---------------------------------------------------------------------------
# full GeoFormer (geoformer.py:141-190): block stack + final node projection
# ---------------------------------------------------------------------------
class GeoFormerParams(NamedTuple):
    blocks: GeoFormerBlockParams  # per-leaf leading [num_blocks] axis
    final_proj_w: jnp.ndarray  # [node_dim, struct_node_dim]
    final_proj_b: jnp.ndarray


def geoformer(p: GeoFormerParams, node, edge, mask, *, attn_c: int,
              geom_c: int, geom_head: int, flash: bool = False,
              pad_safe: bool = False):
    """node [M, L, d_node], edge [L, L, d_edge], mask [M, L].

    Returns (node_repr [M, L, d_node], edge_repr, final_node [M, L, d_struct])
    — matching GeoFormer.forward's (recycle node, recycle edge, structure
    input). The 50-block stack runs under lax.scan over stacked per-block
    params: one compiled block body instead of 50 unrolled copies.
    flash: fused Pallas attention for the GeometricAttention branches
    (TPU inference; forward-only).
    """

    def body(carry, bp):
        n, e = geoformer_block(
            bp, carry[0], carry[1], mask,
            attn_c=attn_c, geom_c=geom_c, geom_head=geom_head, flash=flash,
            pad_safe=pad_safe,
        )
        return (n, e), None

    (node, edge), _ = jax.lax.scan(body, (node, edge), p.blocks)
    final = jnp.einsum("...d,de->...e", node, p.final_proj_w) + p.final_proj_b
    return node, edge, final


def geoformer_params_from_torch(mod) -> GeoFormerParams:
    t = lambda x: jnp.asarray(x.detach().numpy())
    blocks = [block_params_from_torch(b) for b in mod.blocks]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
    return GeoFormerParams(
        blocks=stacked,
        final_proj_w=t(mod.node_final_proj.weight).T,
        final_proj_b=t(mod.node_final_proj.bias),
    )
