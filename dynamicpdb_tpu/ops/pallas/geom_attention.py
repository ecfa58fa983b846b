"""Fused GeometricAttention attended-branch for the OmegaFold GeoFormer
(Pallas/TPU).

Motivation (measured, tools/profile_geoformer.py + HLO at release dims
L=256): the attended branch materializes a [L, 2, H, L, L] f32 logits tensor
(537 MB) and streams it through separate dot / exp / divide fusions — >60%
of GeoFormer device time, which is itself 86% of an OmegaFold recycling
cycle. This kernel fuses the whole gated attention for one
(axis, head, batch row) per grid cell:

    per cell (h, b):  x = stacked[b, :, :, r]     [L, d]
                      qg = x @ Wqg[r,h] + bqg     (q | gate)
                      kv = x @ Wkv[r,h] + bkv     (k | v)
                      out = softmax(q k^T/sqrt(c) + bias[r,h]) v
                            * sigmoid(gate)

so neither the logits nor the projected q/k/v/gate tensors ever exist in
HBM. ONE pallas_call over grid (n_axis*H, B) with b fastest: the
per-(r, h) weight and bias blocks stay VMEM-resident across all B batch
steps, the axis index is recovered in the index maps as g // H, and the
output lands directly in [B, n_axis*H, L, c] (free reshape). Design
history: a first version fusing only logits+softmax was DMA-bound (tiny
per-head transfers) and barely beat XLA's dense fusions; a second that
unrolled all 8 (r, h) pairs inside one cell exceeded the 16 MB v5e
scoped-VMEM limit (34 MB of live unrolled intermediates); a third ran one
call per axis and spent 0.6 ms/block jnp.stack-ing the two outputs. The
(axis*head, batch) grid keeps per-cell VMEM ~1.5 MB with no stitch-up
copies.

Forward-only by design: the GeoFormer runs inference-only in this framework
(embedding extraction); differentiate the dense path instead
(geoformer.geometric_attention with flash=False).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# bias/logits blocks are [L, L]; past this many residues fall back to the
# dense XLA path (at large L the dense einsums are MXU-bound anyway, cf.
# the IPA kernel study in docs/DESIGN.md). Hardware-validated bound:
# compile+execute checked on v5e at L in {512, 768, 1024} (per-cell live
# VMEM at 1024 ~= 14 MB, inside the 16 MB scoped limit)
MAX_FLASH_RES = 1024


def _kernel(x_ref, qg_w_ref, qg_b_ref, kv_w_ref, kv_b_ref, bias_ref, o_ref,
            *, scale, c):
    x = x_ref[0, 0].astype(jnp.float32)  # [L, d]
    qg = jax.lax.dot_general(
        x, qg_w_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + qg_b_ref[0]  # [L, 2c]
    kv = jax.lax.dot_general(
        x, kv_w_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + kv_b_ref[0]
    q, gate = qg[:, :c], qg[:, c:]
    k, v = kv[:, :c], kv[:, c:]
    logits = jax.lax.dot_general(
        q * scale, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bias_ref[0].astype(jnp.float32)  # [L, L]
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    out = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0, 0] = (out * jax.nn.sigmoid(gate)).astype(o_ref.dtype)


def _kernel_masked(x_ref, qg_w_ref, qg_b_ref, kv_w_ref, kv_b_ref, bias_ref,
                   kmask_ref, o_ref, *, scale, c, inf=1e9):
    """_kernel plus a per-batch-row key mask (the AttentionWEdgeBias case:
    each pseudo-MSA row masks its own keys, geoformer.py bias broadcast)."""
    x = x_ref[0].astype(jnp.float32)  # [L, d]
    qg = jax.lax.dot_general(
        x, qg_w_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + qg_b_ref[0]
    kv = jax.lax.dot_general(
        x, kv_w_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + kv_b_ref[0]
    q, gate = qg[:, :c], qg[:, c:]
    k, v = kv[:, :c], kv[:, c:]
    logits = jax.lax.dot_general(
        q * scale, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bias_ref[0].astype(jnp.float32)
    logits = logits + (kmask_ref[0].astype(jnp.float32) - 1.0) * inf
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    out = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0, 0] = (out * jax.nn.sigmoid(gate)).astype(o_ref.dtype)


def fused_gated_node_attention(node, qg_w, qg_b, kv_w, kv_b, bias, kmask, *,
                               c: int, scale, interpret: bool | None = None):
    """AttentionWEdgeBias's gated self-attention, fully fused.

    node [M, L, d] (normalized pseudo-MSA rows); qg_w/kv_w [d, 1, H, 2c]
    (n_axis=1 layout); qg_b/kv_b [1, H, 1, 2c]; bias [H, L, L] (projected
    edge bias, shared across rows); kmask [M, L] (each row's key mask).
    Returns the gated attention output [M, H, L, c] (pre output-projection).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    M, L, d = node.shape
    H, two_c = qg_w.shape[2], qg_w.shape[3]
    assert two_c == 2 * c, (two_c, c)
    if L > MAX_FLASH_RES:
        raise ValueError(
            f"L={L} > MAX_FLASH_RES={MAX_FLASH_RES}; use the dense path"
        )

    kmask3 = kmask.reshape(M, 1, L)
    out = pl.pallas_call(
        functools.partial(_kernel_masked, scale=scale, c=c),
        grid=(H, M),  # m fastest: weight/bias blocks resident per head
        in_specs=[
            pl.BlockSpec((1, L, d), lambda h, m: (m, 0, 0)),
            pl.BlockSpec((1, d, two_c), lambda h, m: (h, 0, 0)),
            pl.BlockSpec((1, 1, two_c), lambda h, m: (h, 0, 0)),
            pl.BlockSpec((1, d, two_c), lambda h, m: (h, 0, 0)),
            pl.BlockSpec((1, 1, two_c), lambda h, m: (h, 0, 0)),
            pl.BlockSpec((1, L, L), lambda h, m: (h, 0, 0)),
            pl.BlockSpec((1, 1, L), lambda h, m: (m, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, L, c), lambda h, m: (m, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((M, H, L, c), node.dtype),
        interpret=interpret,
    )(
        node,
        jnp.transpose(qg_w[:, 0], (1, 0, 2)),  # [H, d, 2c]
        qg_b[0].reshape(H, 1, two_c),
        jnp.transpose(kv_w[:, 0], (1, 0, 2)),
        kv_b[0].reshape(H, 1, two_c),
        bias,
        kmask3,
    )
    return out


def fused_gated_geom_attention_t(stacked_t, qg_w, qg_b, kv_w, kv_b, bias, *,
                                 c: int, scale,
                                 interpret: bool | None = None):
    """Gated two-axis attention of GeometricAttention, fully fused, taking
    the AXIS-MAJOR stacked edge tensor.

    stacked_t [B, n_axis, L, d] (B == L: each row attends within its
    row/col); qg_w/kv_w [d, n_axis, H, 2c]; qg_b/kv_b [n_axis, H, 1, 2c];
    bias [n_axis, H, L, L] shared over B. Returns the GATED attention
    output [B, n_axis, H, L, c] (pre output-projection), matching
    core.attention's softmax sequence + sigmoid gating to fp reassociation.

    ONE pallas_call over grid (n_axis*H, B): the axis index is recovered in
    the index maps as g // H, and the output lands directly in
    [B, n_axis*H, L, c] layout (free reshape to [B, n_axis, H, L, c]) — an
    earlier two-calls-plus-jnp.stack variant spent 0.6 ms/block on the
    stack's layout copy alone.

    interpret=None auto-selects the Pallas interpreter off-TPU (same code
    path testable on CPU).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, n_axis, L, d = stacked_t.shape
    H, two_c = qg_w.shape[2], qg_w.shape[3]
    assert two_c == 2 * c, (two_c, c)
    if L > MAX_FLASH_RES:
        raise ValueError(
            f"L={L} > MAX_FLASH_RES={MAX_FLASH_RES}; use the dense path"
        )
    G = n_axis * H
    # axis-major flattening: g = r * H + h
    qg_w_g = jnp.transpose(qg_w, (1, 2, 0, 3)).reshape(G, d, two_c)
    kv_w_g = jnp.transpose(kv_w, (1, 2, 0, 3)).reshape(G, d, two_c)
    qg_b_g = qg_b.reshape(G, 1, two_c)
    kv_b_g = kv_b.reshape(G, 1, two_c)
    bias_g = bias.reshape(G, L, L)

    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, c=c),
        grid=(G, B),  # b fastest: per-(axis, head) blocks stay resident
        in_specs=[
            pl.BlockSpec((1, 1, L, d), lambda g, b: (b, g // H, 0, 0)),
            pl.BlockSpec((1, d, two_c), lambda g, b: (g, 0, 0)),
            pl.BlockSpec((1, 1, two_c), lambda g, b: (g, 0, 0)),
            pl.BlockSpec((1, d, two_c), lambda g, b: (g, 0, 0)),
            pl.BlockSpec((1, 1, two_c), lambda g, b: (g, 0, 0)),
            pl.BlockSpec((1, L, L), lambda g, b: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, L, c), lambda g, b: (b, g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, G, L, c), stacked_t.dtype),
        interpret=interpret,
    )(stacked_t, qg_w_g, qg_b_g, kv_w_g, kv_b_g, bias_g)
    return out.reshape(B, n_axis, H, L, c)


def fused_gated_geom_attention(stacked, qg_w, qg_b, kv_w, kv_b, bias, *,
                               c: int, scale, interpret: bool | None = None):
    """Axis-minor wrapper: stacked [B, L, d, n_axis] (the dense-path layout)
    -> fused_gated_geom_attention_t. Prefer the _t entry point when the
    caller can build the axis-major tensor directly (saves a transpose)."""
    return fused_gated_geom_attention_t(
        jnp.transpose(stacked, (0, 3, 1, 2)), qg_w, qg_b, kv_w, kv_b, bias,
        c=c, scale=scale, interpret=interpret,
    )
