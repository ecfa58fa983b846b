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
    lse_ref,      # [1, 1, blk_q, 1] log-sum-exp rows (saved for backward)
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
        lse_ref[0, 0] = m_scr[:] + jnp.log(l_scr[:])


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
    return_lse: bool = False,
):
    """Returns (o [F,N,H,C], o_pt [F,N,H,Pv,3], o_pair [F,N,H,Dz])
    (+ lse [F,H,N] when return_lse — the softmax row statistics the fused
    backward reuses to renormalize recomputed tiles)."""
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
        jax.ShapeDtypeStruct((F, H, N, 1), jnp.float32),
    )
    o, o_pt, o_pair, lse = pl.pallas_call(
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
            pl.BlockSpec((1, 1, blk_q, 1), lambda f, h, i, j: (f, h, i, 0)),
        ),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((blk_q, 1), jnp.float32),
            pltpu.VMEM((blk_q, 1), jnp.float32),
            pltpu.VMEM((blk_q, C), jnp.float32),
            pltpu.VMEM((blk_q, Pv * 3), jnp.float32),
            pltpu.VMEM((blk_q, Dz), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            # the [blk_q, blk_k, Dz] pair tile dominates; at block sizes
            # beyond the 64x128 default the double-buffered inputs exceed
            # the 16M default scoped-vmem budget
            vmem_limit_bytes=100 * 1024 * 1024,
        ) if not interpret else None,
        interpret=interpret,
    )(qf, kf, vf, qpf, kpf, vpf, bias_f, pair_z, maskf, maskf, hw)

    def unfh(x, last):  # [F, H, N, D] -> [F, N, H, *last]
        return x.transpose(0, 2, 1, 3).reshape((F, N, H) + last)

    outs = (
        unfh(o, (C,)),
        unfh(o_pt, (Pv, 3)),
        unfh(o_pair, (Dz,)),
    )
    return outs + (lse[..., 0],) if return_lse else outs


# ---------------------------------------------------------------------------
# fused backward: three flash-style kernels, no [F, H, N, N] tensor ever
# materialized in HBM
# ---------------------------------------------------------------------------
#
# With a = softmax(logits) recomputed per tile from the saved row LSE
# (a = exp(logits - lse)), the chain rule gives
#   dS_ij = g_o.v_j + g_opt.vp_j + g_opair_i . pz_ij
#   D_i   = g_o.o_i + g_opt.opt_i + g_opair_i . opair_i
#   dl_ij = a_ij (dS_ij - D_i)                    (softmax backward)
#   dq    = c_qk dl k            dk  = c_qk dl^T q
#   dqp_i = -w_h (rowsum(dl) qp_i - dl kp)        (and symmetrically dkp)
#   dv    = a^T g_o              dvp = a^T g_opt
#   dw_h  = -0.5 sum dist dl     dbias = c_b sum_f dl
#   dpz_ijd = sum_{f,h} a_ij g_opair[f,h,i,d]
#
# Kernel layout: dq-side quantities are indexed by (f, h, i) so kernel A runs
# grid (F, H, iB, jB) accumulating over j; dk/dv-side by (f, h, j) so kernel
# B runs (F, H, jB, iB); dbias/dpz are (i, j)-indexed reductions over f (and
# h), so kernel C runs (iB, jB, H, F) with f innermost — output tiles are
# revisited consecutively, which makes in-place accumulation legal.


def _tile_a_dl(q, k, qp, kp, v, vp, pz, bias, qmask, kmask, hw, lse, dvec,
               g_o, g_opt, g_pair, *, c_qk, c_b, inf):
    """Recompute one (blk_q x blk_k) tile's a and dl (shared by A/B/C)."""
    logits = c_qk * jnp.dot(q, k.T, preferred_element_type=jnp.float32)
    logits += c_b * bias
    qp_sq = jnp.sum(qp * qp, axis=-1, keepdims=True)
    kp_sq = jnp.sum(kp * kp, axis=-1)
    cross = jnp.dot(qp, kp.T, preferred_element_type=jnp.float32)
    dist = qp_sq + kp_sq[None, :] - 2.0 * cross
    logits += (-0.5) * hw * dist
    logits += inf * (qmask * kmask[None, :] - 1.0)
    a = jnp.exp(logits - lse)
    ds = jnp.dot(g_o, v.T, preferred_element_type=jnp.float32)
    ds += jnp.dot(g_opt, vp.T, preferred_element_type=jnp.float32)
    ds += jnp.sum(g_pair[:, None, :] * pz, axis=-1)
    dl = a * (ds - dvec)
    return a, dl, dist


def _bwd_dq_kernel(q_ref, k_ref, v_ref, qp_ref, kp_ref, vp_ref, bias_ref,
                   pairz_ref, qmask_ref, kmask_ref, hw_ref, lse_ref, d_ref,
                   go_ref, gopt_ref, gpair_ref,
                   dq_ref, dqp_ref, dhw_ref,
                   accdq_scr, accrow_scr, accdlkp_scr, accdhw_scr,
                   *, c_qk, c_b, inf):
    kb = pl.program_id(3)
    num_kb = pl.num_programs(3)

    @pl.when(kb == 0)
    def _init():
        accdq_scr[:] = jnp.zeros_like(accdq_scr)
        accrow_scr[:] = jnp.zeros_like(accrow_scr)
        accdlkp_scr[:] = jnp.zeros_like(accdlkp_scr)
        accdhw_scr[:] = jnp.zeros_like(accdhw_scr)

    hw = hw_ref[pl.program_id(1), 0]
    q, k, qp, kp = q_ref[0, 0], k_ref[0, 0], qp_ref[0, 0], kp_ref[0, 0]
    a, dl, dist = _tile_a_dl(
        q, k, qp, kp, v_ref[0, 0], vp_ref[0, 0], pairz_ref[:], bias_ref[0],
        qmask_ref[0], kmask_ref[0, :, 0], hw, lse_ref[0, 0],
        d_ref[0, 0], go_ref[0, 0], gopt_ref[0, 0], gpair_ref[0, 0],
        c_qk=c_qk, c_b=c_b, inf=inf,
    )
    accdq_scr[:] += c_qk * jnp.dot(dl, k, preferred_element_type=jnp.float32)
    accrow_scr[:] += jnp.sum(dl, axis=-1, keepdims=True)
    accdlkp_scr[:] += jnp.dot(dl, kp, preferred_element_type=jnp.float32)
    accdhw_scr[:] += jnp.sum(-0.5 * dist * dl, axis=-1, keepdims=True)

    @pl.when(kb == num_kb - 1)
    def _finalize():
        dq_ref[0, 0] = accdq_scr[:].astype(dq_ref.dtype)
        dqp_ref[0, 0] = (
            -hw * (accrow_scr[:] * qp_ref[0, 0] - accdlkp_scr[:])
        ).astype(dqp_ref.dtype)
        dhw_ref[0, 0] = accdhw_scr[:]


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, qp_ref, kp_ref, vp_ref, bias_ref,
                    pairz_ref, qmask_ref, kmask_ref, hw_ref, lse_ref, d_ref,
                    go_ref, gopt_ref, gpair_ref,
                    dk_ref, dkp_ref, dv_ref, dvp_ref,
                    accdk_scr, acccol_scr, accdlqp_scr, accdv_scr, accdvp_scr,
                    *, c_qk, c_b, inf):
    ib = pl.program_id(3)
    num_ib = pl.num_programs(3)

    @pl.when(ib == 0)
    def _init():
        accdk_scr[:] = jnp.zeros_like(accdk_scr)
        acccol_scr[:] = jnp.zeros_like(acccol_scr)
        accdlqp_scr[:] = jnp.zeros_like(accdlqp_scr)
        accdv_scr[:] = jnp.zeros_like(accdv_scr)
        accdvp_scr[:] = jnp.zeros_like(accdvp_scr)

    hw = hw_ref[pl.program_id(1), 0]
    q, k, qp, kp = q_ref[0, 0], k_ref[0, 0], qp_ref[0, 0], kp_ref[0, 0]
    a, dl, _ = _tile_a_dl(
        q, k, qp, kp, v_ref[0, 0], vp_ref[0, 0], pairz_ref[:], bias_ref[0],
        qmask_ref[0], kmask_ref[0, :, 0], hw, lse_ref[0, 0],
        d_ref[0, 0], go_ref[0, 0], gopt_ref[0, 0], gpair_ref[0, 0],
        c_qk=c_qk, c_b=c_b, inf=inf,
    )
    accdk_scr[:] += c_qk * jnp.dot(dl.T, q, preferred_element_type=jnp.float32)
    acccol_scr[:] += jnp.sum(dl, axis=0)[:, None]
    accdlqp_scr[:] += jnp.dot(dl.T, qp, preferred_element_type=jnp.float32)
    accdv_scr[:] += jnp.dot(a.T, go_ref[0, 0], preferred_element_type=jnp.float32)
    accdvp_scr[:] += jnp.dot(a.T, gopt_ref[0, 0], preferred_element_type=jnp.float32)

    @pl.when(ib == num_ib - 1)
    def _finalize():
        dk_ref[0, 0] = accdk_scr[:].astype(dk_ref.dtype)
        dkp_ref[0, 0] = (
            -hw * (acccol_scr[:] * kp_ref[0, 0] - accdlqp_scr[:])
        ).astype(dkp_ref.dtype)
        dv_ref[0, 0] = accdv_scr[:].astype(dv_ref.dtype)
        dvp_ref[0, 0] = accdvp_scr[:].astype(dvp_ref.dtype)


def _bwd_pair_kernel(q_ref, k_ref, v_ref, qp_ref, kp_ref, vp_ref, bias_ref,
                     pairz_ref, qmask_ref, kmask_ref, hw_ref, lse_ref, d_ref,
                     go_ref, gopt_ref, gpair_ref,
                     dbias_ref, dpz_ref,
                     *, c_qk, c_b, inf):
    # grid (iB, jB, H, F): f innermost — dbias tile (h, i, j) accumulates
    # over f, dpz tile (i, j) over (h, f); both revisits are consecutive
    hb, fb = pl.program_id(2), pl.program_id(3)

    @pl.when(fb == 0)
    def _init_bias():
        dbias_ref[0] = jnp.zeros_like(dbias_ref[0])

    @pl.when((fb == 0) & (hb == 0))
    def _init_pz():
        dpz_ref[:] = jnp.zeros_like(dpz_ref[:])

    hw = hw_ref[hb, 0]
    q, k, qp, kp = q_ref[0, 0], k_ref[0, 0], qp_ref[0, 0], kp_ref[0, 0]
    a, dl, _ = _tile_a_dl(
        q, k, qp, kp, v_ref[0, 0], vp_ref[0, 0], pairz_ref[:], bias_ref[0],
        qmask_ref[0], kmask_ref[0, :, 0], hw, lse_ref[0, 0],
        d_ref[0, 0], go_ref[0, 0], gopt_ref[0, 0], gpair_ref[0, 0],
        c_qk=c_qk, c_b=c_b, inf=inf,
    )
    dbias_ref[0] += (c_b * dl).astype(dbias_ref.dtype)
    dpz_ref[:] += (
        a[:, :, None] * gpair_ref[0, 0][:, None, :]
    ).astype(dpz_ref.dtype)


def _fused_ipa_backward(qf, kf, vf, qpf, kpf, vpf, bias_f, pair_z, maskf,
                        hw, lse, dvec, go, gopt, gpair, *,
                        c_qk, c_b, inf, blk_q, blk_k, interpret):
    """All-Pallas backward. fh-layout inputs ([F, H, N, D]); returns grads in
    the same layouts."""
    F, H, N, C = qf.shape
    P3q, P3v = qpf.shape[-1], vpf.shape[-1]
    Dz = pair_z.shape[-1]

    qspec = lambda D: pl.BlockSpec((1, 1, blk_q, D), lambda f, h, i, j: (f, h, i, 0))
    kspec = lambda D: pl.BlockSpec((1, 1, blk_k, D), lambda f, h, i, j: (f, h, j, 0))
    common = dict(
        bias=pl.BlockSpec((1, blk_q, blk_k), lambda f, h, i, j: (h, i, j)),
        pz=pl.BlockSpec((blk_q, blk_k, Dz), lambda f, h, i, j: (i, j, 0)),
        qmask=pl.BlockSpec((1, blk_q, 1), lambda f, h, i, j: (f, i, 0)),
        kmask=pl.BlockSpec((1, blk_k, 1), lambda f, h, i, j: (f, j, 0)),
        hw=pl.BlockSpec(memory_space=pltpu.SMEM),
        row=pl.BlockSpec((1, 1, blk_q, 1), lambda f, h, i, j: (f, h, i, 0)),
    )
    inputs = (qf, kf, vf, qpf, kpf, vpf, bias_f, pair_z, maskf, maskf, hw,
              lse, dvec, go, gopt, gpair)

    def in_specs(imap_q, imap_k, imap_row, imap_bias, imap_pz, imap_mask_q,
                 imap_mask_k):
        return [
            pl.BlockSpec((1, 1, blk_q, C), imap_q),
            pl.BlockSpec((1, 1, blk_k, C), imap_k),
            pl.BlockSpec((1, 1, blk_k, C), imap_k),
            pl.BlockSpec((1, 1, blk_q, P3q), imap_q),
            pl.BlockSpec((1, 1, blk_k, P3q), imap_k),
            pl.BlockSpec((1, 1, blk_k, P3v), imap_k),
            pl.BlockSpec((1, blk_q, blk_k), imap_bias),
            pl.BlockSpec((blk_q, blk_k, Dz), imap_pz),
            pl.BlockSpec((1, blk_q, 1), imap_mask_q),
            pl.BlockSpec((1, blk_k, 1), imap_mask_k),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, blk_q, 1), imap_row),
            pl.BlockSpec((1, 1, blk_q, 1), imap_row),
            pl.BlockSpec((1, 1, blk_q, C), imap_q),
            pl.BlockSpec((1, 1, blk_q, P3v), imap_q),
            pl.BlockSpec((1, 1, blk_q, Dz), imap_q),
        ]

    # --- kernel A: grid (F, H, iB, jB), j innermost ------------------------
    dq, dqp, dhw_rows = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, c_qk=c_qk, c_b=c_b, inf=inf),
        grid=(F, H, N // blk_q, N // blk_k),
        in_specs=in_specs(
            lambda f, h, i, j: (f, h, i, 0),
            lambda f, h, i, j: (f, h, j, 0),
            lambda f, h, i, j: (f, h, i, 0),
            lambda f, h, i, j: (h, i, j),
            lambda f, h, i, j: (i, j, 0),
            lambda f, h, i, j: (f, i, 0),
            lambda f, h, i, j: (f, j, 0),
        ),
        out_specs=(
            pl.BlockSpec((1, 1, blk_q, C), lambda f, h, i, j: (f, h, i, 0)),
            pl.BlockSpec((1, 1, blk_q, P3q), lambda f, h, i, j: (f, h, i, 0)),
            pl.BlockSpec((1, 1, blk_q, 1), lambda f, h, i, j: (f, h, i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((F, H, N, C), qf.dtype),
            jax.ShapeDtypeStruct((F, H, N, P3q), qpf.dtype),
            jax.ShapeDtypeStruct((F, H, N, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((blk_q, C), jnp.float32),
            pltpu.VMEM((blk_q, 1), jnp.float32),
            pltpu.VMEM((blk_q, P3q), jnp.float32),
            pltpu.VMEM((blk_q, 1), jnp.float32),
        ],
        interpret=interpret,
    )(*inputs)

    # --- kernel B: grid (F, H, jB, iB), i innermost ------------------------
    dk, dkp, dv, dvp = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, c_qk=c_qk, c_b=c_b, inf=inf),
        grid=(F, H, N // blk_k, N // blk_q),
        in_specs=in_specs(
            lambda f, h, j, i: (f, h, i, 0),
            lambda f, h, j, i: (f, h, j, 0),
            lambda f, h, j, i: (f, h, i, 0),
            lambda f, h, j, i: (h, i, j),
            lambda f, h, j, i: (i, j, 0),
            lambda f, h, j, i: (f, i, 0),
            lambda f, h, j, i: (f, j, 0),
        ),
        out_specs=(
            pl.BlockSpec((1, 1, blk_k, C), lambda f, h, j, i: (f, h, j, 0)),
            pl.BlockSpec((1, 1, blk_k, P3q), lambda f, h, j, i: (f, h, j, 0)),
            pl.BlockSpec((1, 1, blk_k, C), lambda f, h, j, i: (f, h, j, 0)),
            pl.BlockSpec((1, 1, blk_k, P3v), lambda f, h, j, i: (f, h, j, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((F, H, N, C), kf.dtype),
            jax.ShapeDtypeStruct((F, H, N, P3q), kpf.dtype),
            jax.ShapeDtypeStruct((F, H, N, C), vf.dtype),
            jax.ShapeDtypeStruct((F, H, N, P3v), vpf.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((blk_k, C), jnp.float32),
            pltpu.VMEM((blk_k, 1), jnp.float32),
            pltpu.VMEM((blk_k, P3q), jnp.float32),
            pltpu.VMEM((blk_k, C), jnp.float32),
            pltpu.VMEM((blk_k, P3v), jnp.float32),
        ],
        interpret=interpret,
    )(*inputs)

    # --- kernel C: grid (iB, jB, H, F), f innermost ------------------------
    dbias_f, dpz = pl.pallas_call(
        functools.partial(_bwd_pair_kernel, c_qk=c_qk, c_b=c_b, inf=inf),
        grid=(N // blk_q, N // blk_k, H, F),
        in_specs=in_specs(
            lambda i, j, h, f: (f, h, i, 0),
            lambda i, j, h, f: (f, h, j, 0),
            lambda i, j, h, f: (f, h, i, 0),
            lambda i, j, h, f: (h, i, j),
            lambda i, j, h, f: (i, j, 0),
            lambda i, j, h, f: (f, i, 0),
            lambda i, j, h, f: (f, j, 0),
        ),
        out_specs=(
            pl.BlockSpec((1, blk_q, blk_k), lambda i, j, h, f: (h, i, j)),
            pl.BlockSpec((blk_q, blk_k, Dz), lambda i, j, h, f: (i, j, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((H, N, N), jnp.float32),
            # accumulate dpz in f32 across the F*H grid revisits; under bf16
            # inputs an in-place bf16 += would round away low-order gradient
            # mass each revisit (the caller casts back to pair_z.dtype once)
            jax.ShapeDtypeStruct((N, N, Dz), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            # the dpz tile + double-buffered inputs need slightly more than
            # the 16M default scoped-vmem at flagship dims (measured 16.12M)
            vmem_limit_bytes=64 * 1024 * 1024,
        ) if not interpret else None,
        interpret=interpret,
    )(*inputs)

    dhw = jnp.sum(dhw_rows[..., 0], axis=(0, 2))  # [H]
    return dq, dk, dv, dqp, dkp, dvp, dbias_f, dpz, dhw


def _dense_reference(q, k, v, q_pts, k_pts, v_pts, bias, pair_z, mask,
                     head_weights, c_qk, c_b, inf):
    """The model's dense attention (used for the VJP; XLA's attention
    backward is efficient and this avoids hand-writing the multi-stream
    flash backward). Delegates to models.ipa.dense_ipa_attention — the ONE
    dense implementation — so the kernel is always verified against the
    exact semantics the model ships."""
    from dynamicpdb_tpu.models.ipa import dense_ipa_attention

    return dense_ipa_attention(
        q, k, v, q_pts, k_pts, v_pts, bias, pair_z, mask, head_weights,
        c_qk, c_b=c_b, inf=inf,
    )


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13, 14, 15, 16)
)
def ipa_attention(q, k, v, q_pts, k_pts, v_pts, bias, pair_z, mask,
                  head_weights, c_qk, c_b=math.sqrt(1.0 / 3), inf=1e5,
                  blk_q=64, blk_k=128, interpret=False, fused_bwd=True):
    """Differentiable fused IPA attention: Pallas kernel forward AND a
    flash-style three-kernel Pallas backward (attention recomputed per tile
    from the saved row LSE) — training memory stays O(blk), never
    O(F·H·N²). fused_bwd=False falls back to a dense-recompute VJP
    (debug/verification path)."""
    return fused_ipa_attention(
        q, k, v, q_pts, k_pts, v_pts, bias, pair_z, mask, head_weights,
        c_qk=c_qk, c_b=c_b, inf=inf, blk_q=blk_q, blk_k=blk_k,
        interpret=interpret,
    )


def _ipa_attention_fwd(q, k, v, q_pts, k_pts, v_pts, bias, pair_z, mask,
                       head_weights, c_qk, c_b, inf, blk_q, blk_k, interpret,
                       fused_bwd):
    o, o_pt, o_pair, lse = fused_ipa_attention(
        q, k, v, q_pts, k_pts, v_pts, bias, pair_z, mask, head_weights,
        c_qk=c_qk, c_b=c_b, inf=inf, blk_q=blk_q, blk_k=blk_k,
        interpret=interpret, return_lse=True,
    )
    res = (q, k, v, q_pts, k_pts, v_pts, bias, pair_z, mask, head_weights,
           lse, o, o_pt, o_pair)
    return (o, o_pt, o_pair), res


def _ipa_attention_bwd(c_qk, c_b, inf, blk_q, blk_k, interpret, fused_bwd,
                       res, g):
    (q, k, v, q_pts, k_pts, v_pts, bias, pair_z, mask, head_weights,
     lse, o, o_pt, o_pair) = res
    if not fused_bwd:
        _, vjp = jax.vjp(
            lambda *args: _dense_reference(*args, c_qk, c_b, inf),
            q, k, v, q_pts, k_pts, v_pts, bias, pair_z, mask, head_weights,
        )
        return vjp(g)

    g_o, g_opt, g_opair = g
    F, N, H, C = q.shape
    Pq, Pv = q_pts.shape[-2], v_pts.shape[-2]
    Dz = pair_z.shape[-1]
    bq, bk = min(blk_q, N), min(blk_k, N)

    def fh(x):
        return x.transpose(0, 2, 1, *range(3, x.ndim)).reshape(F, H, N, -1)

    go_f, gopt_f, gpair_f = fh(g_o), fh(g_opt), fh(g_opair)
    # D_i = <g, out>_i per (f, h, i) — the softmax-backward row constant
    dvec = (
        jnp.sum(go_f * fh(o), -1)
        + jnp.sum(gopt_f * fh(o_pt), -1)
        + jnp.sum(gpair_f * fh(o_pair), -1)
    )

    dq, dk, dv, dqp, dkp, dvp, dbias_f, dpz, dhw = _fused_ipa_backward(
        fh(q), fh(k), fh(v), fh(q_pts), fh(k_pts), fh(v_pts),
        jnp.transpose(bias, (2, 0, 1)).astype(jnp.float32), pair_z,
        mask.reshape(F, N, 1).astype(jnp.float32),
        head_weights.reshape(H, 1).astype(jnp.float32),
        lse[..., None], dvec[..., None], go_f, gopt_f, gpair_f,
        c_qk=c_qk, c_b=c_b, inf=inf, blk_q=bq, blk_k=bk,
        interpret=interpret,
    )

    def unfh(x, last):
        return x.transpose(0, 2, 1, 3).reshape((F, N, H) + last)

    return (
        unfh(dq, (C,)).astype(q.dtype),
        unfh(dk, (C,)).astype(k.dtype),
        unfh(dv, (C,)).astype(v.dtype),
        unfh(dqp, (Pq, 3)).astype(q_pts.dtype),
        unfh(dkp, (Pq, 3)).astype(k_pts.dtype),
        unfh(dvp, (Pv, 3)).astype(v_pts.dtype),
        jnp.transpose(dbias_f, (1, 2, 0)).astype(bias.dtype),
        dpz.astype(pair_z.dtype),
        jnp.zeros_like(mask),
        dhw.astype(head_weights.dtype),
    )


ipa_attention.defvjp(_ipa_attention_fwd, _ipa_attention_bwd)
