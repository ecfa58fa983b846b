"""Fused Invariant-Point-Attention kernel (Pallas TPU).

Flash-attention-style kernel for the DFOLD IPA inner loop (models/ipa.py).
Per (frame, head, query-block), iterating key-blocks as the innermost
sequential grid dimension:

    logits = c_qk * (q @ k^T) + c_b * bias_h
             - 0.5 * w_h * (|qp|^2 + |kp|^2 - 2 qp @ kp^T) + mask
    a = online-softmax_j(logits)      (never materialized in HBM)
    o      = a @ v                    [C]
    o_pt   = a @ v_pts                [Pv*3]  (global-frame points)
    o_pair = a @ pair_z[i-rows]       [Dz]

The torch reference materializes the [F, N, N, H, Pq, 3] displacement tensor
plus the [F, H, N, N] attention matrix in HBM
(/root/reference/src/model/ipa_pytorch_dynamic.py:409-499). Here every
N x N quantity lives only in VMEM tiles; the point-distance term uses the
norm+matmul decomposition so all heavy math rides the MXU. For short
sequences (N <= ~384) the decomposed jnp path in models/ipa.py is already
MXU-bound; this kernel is the scaling path for long proteins where O(N^2)
HBM traffic dominates.

Inputs are pre-projected (the Linear layers stay in XLA and fuse with their
neighbors); the kernel fuses only the attention.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _ipa_attn_kernel(
    q_ref,        # [1, 1, blk_q, C]
    k_ref,        # [1, 1, blk_k, C]
    v_ref,        # [1, 1, blk_k, C]
    qp_ref,       # [1, 1, blk_q, P3q]
    kp_ref,       # [1, 1, blk_k, P3q]
    vp_ref,       # [1, 1, blk_k, P3v]
    bias_ref,     # [1, blk_q, blk_k]
    pairz_ref,    # [blk_q, blk_k, Dz]
    qmask_ref,    # [1, blk_q, 1]
    mask_ref,     # [1, blk_k, 1]
    hw_ref,       # [H, 1] (full array in SMEM; indexed by head program id)
    o_ref,        # [1, 1, blk_q, C]
    opt_ref,      # [1, 1, blk_q, P3v]
    opair_ref,    # [1, 1, blk_q, Dz]
    m_scr,        # [blk_q, 1] running max
    l_scr,        # [blk_q, 1] running denom
    acco_scr,     # [blk_q, C]
    accpt_scr,    # [blk_q, P3v]
    accpair_scr,  # [blk_q, Dz]
    *,
    c_qk: float,
    c_b: float,
    inf: float,
):
    kb = pl.program_id(3)
    num_kb = pl.num_programs(3)

    @pl.when(kb == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acco_scr[:] = jnp.zeros_like(acco_scr)
        accpt_scr[:] = jnp.zeros_like(accpt_scr)
        accpair_scr[:] = jnp.zeros_like(accpair_scr)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    qp = qp_ref[0, 0]
    kp = kp_ref[0, 0]
    hw = hw_ref[pl.program_id(1), 0]

    logits = c_qk * jnp.dot(q, k.T, preferred_element_type=jnp.float32)
    logits += c_b * bias_ref[0]
    qp_sq = jnp.sum(qp * qp, axis=-1, keepdims=True)
    kp_sq = jnp.sum(kp * kp, axis=-1)
    cross = jnp.dot(qp, kp.T, preferred_element_type=jnp.float32)
    logits += (-0.5) * hw * (qp_sq + kp_sq[None, :] - 2.0 * cross)
    # reference square-mask semantics: inf * (mask_i * mask_j - 1)
    logits += inf * (
        qmask_ref[0, :, :] * mask_ref[0, :, 0][None, :] - 1.0
    )

    m_prev = m_scr[:]
    l_prev = l_scr[:]
    m_cur = jnp.maximum(m_prev, jnp.max(logits, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_cur)
    p = jnp.exp(logits - m_cur)
    m_scr[:] = m_cur
    l_scr[:] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)

    acco_scr[:] = acco_scr[:] * alpha + jnp.dot(
        p, v_ref[0, 0], preferred_element_type=jnp.float32
    )
    accpt_scr[:] = accpt_scr[:] * alpha + jnp.dot(
        p, vp_ref[0, 0], preferred_element_type=jnp.float32
    )
    # per-row contraction o_pair[q, d] = sum_k p[q, k] * pz[q, k, d]: not a
    # matmul (contraction is per-query-row), so reduce on the VPU —
    # Mosaic cannot lower the equivalent batched dot_general
    accpair_scr[:] = accpair_scr[:] * alpha + jnp.sum(
        p[:, :, None] * pairz_ref[:], axis=1
    )

    @pl.when(kb == num_kb - 1)
    def _finalize():
        inv_l = 1.0 / l_scr[:]
        o_ref[0, 0] = (acco_scr[:] * inv_l).astype(o_ref.dtype)
        opt_ref[0, 0] = (accpt_scr[:] * inv_l).astype(opt_ref.dtype)
        opair_ref[0, 0] = (accpair_scr[:] * inv_l).astype(opair_ref.dtype)


def fused_ipa_attention(
    q, k, v,          # [F, N, H, C]
    q_pts, k_pts,     # [F, N, H, Pq, 3] global-frame points
    v_pts,            # [F, N, H, Pv, 3]
    bias,             # [N, N, H] pair bias (frame-shared)
    pair_z,           # [N, N, Dz]
    mask,             # [F, N]
    head_weights,     # [H] (already softplus'ed and sqrt-scaled)
    *,
    c_qk: float,
    c_b: float = math.sqrt(1.0 / 3),
    inf: float = 1e5,
    blk_q: int = 64,
    blk_k: int = 128,
    interpret: bool = False,
):
    """Returns (o [F,N,H,C], o_pt [F,N,H,Pv,3], o_pair [F,N,H,Dz])."""
    F, N, H, C = q.shape
    Pq, Pv = q_pts.shape[-2], v_pts.shape[-2]
    Dz = pair_z.shape[-1]
    blk_q = min(blk_q, N)
    blk_k = min(blk_k, N)
    assert N % blk_q == 0 and N % blk_k == 0, (N, blk_q, blk_k)

    def fh(x):  # [F, N, H, ...] -> [F, H, N, prod(...)]
        return x.transpose(0, 2, 1, *range(3, x.ndim)).reshape(F, H, N, -1)

    qf, kf, vf = fh(q), fh(k), fh(v)
    qpf, kpf, vpf = fh(q_pts), fh(k_pts), fh(v_pts)
    bias_f = jnp.transpose(bias, (2, 0, 1)).astype(jnp.float32)  # [H, N, N]
    hw = head_weights.reshape(H, 1).astype(jnp.float32)
    maskf = mask.reshape(F, N, 1).astype(jnp.float32)

    grid = (F, H, N // blk_q, N // blk_k)
    kernel = functools.partial(_ipa_attn_kernel, c_qk=c_qk, c_b=c_b, inf=inf)
    out_shapes = (
        jax.ShapeDtypeStruct((F, H, N, C), q.dtype),
        jax.ShapeDtypeStruct((F, H, N, Pv * 3), q.dtype),
        jax.ShapeDtypeStruct((F, H, N, Dz), q.dtype),
    )
    o, o_pt, o_pair = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, blk_q, C), lambda f, h, i, j: (f, h, i, 0)),
            pl.BlockSpec((1, 1, blk_k, C), lambda f, h, i, j: (f, h, j, 0)),
            pl.BlockSpec((1, 1, blk_k, C), lambda f, h, i, j: (f, h, j, 0)),
            pl.BlockSpec((1, 1, blk_q, Pq * 3), lambda f, h, i, j: (f, h, i, 0)),
            pl.BlockSpec((1, 1, blk_k, Pq * 3), lambda f, h, i, j: (f, h, j, 0)),
            pl.BlockSpec((1, 1, blk_k, Pv * 3), lambda f, h, i, j: (f, h, j, 0)),
            pl.BlockSpec((1, blk_q, blk_k), lambda f, h, i, j: (h, i, j)),
            pl.BlockSpec((blk_q, blk_k, Dz), lambda f, h, i, j: (i, j, 0)),
            pl.BlockSpec((1, blk_q, 1), lambda f, h, i, j: (f, i, 0)),
            pl.BlockSpec((1, blk_k, 1), lambda f, h, i, j: (f, j, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full [H, 1] scalars
        ],
        out_specs=(
            pl.BlockSpec((1, 1, blk_q, C), lambda f, h, i, j: (f, h, i, 0)),
            pl.BlockSpec((1, 1, blk_q, Pv * 3), lambda f, h, i, j: (f, h, i, 0)),
            pl.BlockSpec((1, 1, blk_q, Dz), lambda f, h, i, j: (f, h, i, 0)),
        ),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((blk_q, 1), jnp.float32),
            pltpu.VMEM((blk_q, 1), jnp.float32),
            pltpu.VMEM((blk_q, C), jnp.float32),
            pltpu.VMEM((blk_q, Pv * 3), jnp.float32),
            pltpu.VMEM((blk_q, Dz), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf, qpf, kpf, vpf, bias_f, pair_z, maskf, maskf, hw)

    def unfh(x, last):  # [F, H, N, D] -> [F, N, H, *last]
        return x.transpose(0, 2, 1, 3).reshape((F, N, H) + last)

    return (
        unfh(o, (C,)),
        unfh(o_pt, (Pv, 3)),
        unfh(o_pair, (Dz,)),
    )


# ---------------------------------------------------------------------------
# differentiable wrapper: kernel forward, dense-math backward
# ---------------------------------------------------------------------------
def _dense_reference(q, k, v, q_pts, k_pts, v_pts, bias, pair_z, mask,
                     head_weights, c_qk, c_b, inf):
    """Straight-line jnp computation with identical semantics (used for the
    VJP; XLA's attention backward is efficient and this avoids hand-writing
    the multi-stream flash backward)."""
    a = jnp.einsum("fihc,fjhc->fhij", q, k) * c_qk
    a = a + c_b * jnp.transpose(bias, (2, 0, 1))[None]
    qp_sq = jnp.sum(q_pts**2, axis=(-1, -2))
    kp_sq = jnp.sum(k_pts**2, axis=(-1, -2))
    cross = jnp.einsum("fihpx,fjhpx->fhij", q_pts, k_pts)
    pt = (
        qp_sq.transpose(0, 2, 1)[..., :, None]
        + kp_sq.transpose(0, 2, 1)[..., None, :]
        - 2 * cross
    )
    a = a + (-0.5) * head_weights[None, :, None, None] * pt
    a = a + inf * (mask[:, :, None] * mask[:, None, :] - 1.0)[:, None]
    a = jax.nn.softmax(a, axis=-1)
    return (
        jnp.einsum("fhij,fjhc->fihc", a, v),
        jnp.einsum("fhij,fjhpx->fihpx", a, v_pts),
        jnp.einsum("fhij,ijd->fihd", a, pair_z),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13, 14, 15))
def ipa_attention(q, k, v, q_pts, k_pts, v_pts, bias, pair_z, mask,
                  head_weights, c_qk, c_b=math.sqrt(1.0 / 3), inf=1e5,
                  blk_q=64, blk_k=128, interpret=False):
    """Differentiable fused IPA attention: Pallas kernel on the forward pass,
    dense-recompute VJP on the backward (the flash forward is the inference
    win; training pays one dense recompute, still cheaper than materializing
    the reference's displacement tensors)."""
    return fused_ipa_attention(
        q, k, v, q_pts, k_pts, v_pts, bias, pair_z, mask, head_weights,
        c_qk=c_qk, c_b=c_b, inf=inf, blk_q=blk_q, blk_k=blk_k,
        interpret=interpret,
    )


def _ipa_attention_fwd(q, k, v, q_pts, k_pts, v_pts, bias, pair_z, mask,
                       head_weights, c_qk, c_b, inf, blk_q, blk_k, interpret):
    out = fused_ipa_attention(
        q, k, v, q_pts, k_pts, v_pts, bias, pair_z, mask, head_weights,
        c_qk=c_qk, c_b=c_b, inf=inf, blk_q=blk_q, blk_k=blk_k,
        interpret=interpret,
    )
    return out, (q, k, v, q_pts, k_pts, v_pts, bias, pair_z, mask, head_weights)


def _ipa_attention_bwd(c_qk, c_b, inf, blk_q, blk_k, interpret, res, g):
    primals = res
    _, vjp = jax.vjp(
        lambda *args: _dense_reference(*args, c_qk, c_b, inf), *primals
    )
    return vjp(g)


ipa_attention.defvjp(_ipa_attention_fwd, _ipa_attention_bwd)
