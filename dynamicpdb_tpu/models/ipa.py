"""Invariant Point Attention (DFOLD fork) in flax/jnp.

Functional reimplementation of the reference's InvariantPointAttention
(/root/reference/src/model/ipa_pytorch_dynamic.py:242-516) — the OpenFold
Algorithm-22 fork with the DFOLD extras:

  * the pair representation z is a SINGLE [N, N, c_z] tensor shared by all
    frames (the reference broadcasts it through torch matmul batching;
    here the sharing is explicit in the einsums — big memory win at F > 1);
  * an extra family of NON-frame-inverted point outputs (``o_pt_global``,
    reference's o_pt_out_ti, lines 470-504), doubling the point features:
    concat dim per head = c_hidden + c_z//4 + 8 * no_v_points.

Shapes: s [F, N, c_s], z [N, N, c_z], rigids Rigid [F, N], mask [F, N].
All contractions are MXU-friendly einsums; XLA fuses the three logit terms.
A Pallas fused-attention variant can swap in behind the same signature for
long sequences (see ops/pallas).
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp
from jax.nn.initializers import zeros as zeros_init

from dynamicpdb_tpu.config import IPAConfig
from dynamicpdb_tpu.models.layers import INITS, Linear
from dynamicpdb_tpu.ops.rigid import Rigid
from dynamicpdb_tpu.parallel import sp


class _LinearParams(nn.Module):
    """Declares EXACTLY the params of ``Linear(features, init)`` (same
    submodule/param names, shapes, and init streams -> bit-identical
    param tree) but returns (kernel, bias) instead of applying them, so
    the caller can run several projections as ONE concatenated matmul.
    Measured on v5e at the production shapes (tools/bench_ipa_tail.py):
    the four separate s-side projections cost 0.155 ms/block fwd, the
    fused single matmul 0.116 ms — the win is fewer HBM output-write
    round-trips and one fusion boundary instead of four."""

    features: int
    init: str = "default"

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", INITS[self.init], (in_features, self.features)
        )
        bias = self.param("bias", zeros_init, (self.features,))
        return kernel, bias


def dense_ipa_attention(q, k, v, q_pts, k_pts, v_pts, bias, pair_z, mask,
                        head_weights, c_qk, c_b=math.sqrt(1.0 / 3),
                        inf=1e5):
    """Dense (non-Pallas) IPA attention — the semantics of record.

    Point-distance term decomposed for the MXU:
      sum_p |qp_i - kp_j|^2 = |qp_i|^2 + |kp_j|^2 - 2 qp_i . kp_j
    (the torch reference materializes [F, N, N, H, Pq, 3] in HBM; the cross
    term here is one [N, N] matmul per (f, h)).

    Mixed precision: q/k/v/bias/pair_z may arrive bfloat16 (the production
    compute_dtype path); every einsum accumulates in float32
    (preferred_element_type), so the logits, softmax, and all outputs are
    float32 regardless — only the projection ACTIVATION traffic narrows.
    The point tensors are always float32 (geometry). With f32 inputs this
    is bit-identical to the pre-mixed-precision version.

    The ONE dense implementation: the model's non-Pallas branch AND the
    Pallas kernel's dense-recompute VJP/verification path both call this,
    so a masking/scaling change cannot silently diverge between them.
    Returns (o [F,N,H,C], o_pt_global [F,N,H,P,3], o_pair [F,N,H,Dz]).
    """
    f32 = jnp.float32
    a = jnp.einsum("fihc,fjhc->fhij", q, k, preferred_element_type=f32) * c_qk
    a = a + c_b * jnp.transpose(bias.astype(f32), (2, 0, 1))[None]
    qp_sq = jnp.sum(q_pts**2, axis=(-1, -2))  # [F, N, H]
    kp_sq = jnp.sum(k_pts**2, axis=(-1, -2))  # [F, N, H]
    cross = jnp.einsum("fihpx,fjhpx->fhij", q_pts, k_pts)
    pt_att = (
        qp_sq.transpose(0, 2, 1)[..., :, None]
        + kp_sq.transpose(0, 2, 1)[..., None, :]
        - 2 * cross
    )  # [F, H, N, N]
    a = a + (-0.5) * head_weights[None, :, None, None] * pt_att
    a = a + inf * (mask[:, :, None] * mask[:, None, :] - 1.0)[:, None]
    # sequence parallelism: the [F, H, N, N] logits — the O(N^2) memory
    # peak — shard over 'seq' on the query axis (identity when inactive)
    a = sp.shard(a, None, None, "seq", None)
    a = nn.softmax(a, axis=-1)  # [F, H, N, N] float32
    return (
        jnp.einsum("fhij,fjhc->fihc", a, v, preferred_element_type=f32),
        jnp.einsum("fhij,fjhpx->fihpx", a, v_pts, preferred_element_type=f32),
        jnp.einsum("fhij,ijd->fihd", a, pair_z, preferred_element_type=f32),
    )


class InvariantPointAttention(nn.Module):
    """``dtype`` (None => float32 everywhere) is the compute dtype for the
    six linear projections — the production bfloat16 path. Params stay
    float32, and so do the attention logits, softmax, point geometry
    (frame lift/invert, distances, norms) and every einsum accumulator
    (see dense_ipa_attention): bf16 narrows only the projection activation
    traffic, which the headroom microbench identified as the block's cost
    (tools/bench_mxu_headroom.py — the attention core itself is 0.16 ms of
    the 0.95 ms f32 block forward at B=8)."""

    cfg: IPAConfig
    inf: float = 1e5
    eps: float = 1e-8
    dtype: object = None

    @nn.compact
    def __call__(self, s, z, r: Rigid, mask):
        c = self.cfg
        F, N, _ = s.shape
        H, C, Pq, Pv = c.no_heads, c.c_hidden, c.no_qk_points, c.no_v_points
        dt = self.dtype
        sd = s.astype(dt) if dt is not None else s

        # scalar + point qkv: FOUR projections of sd fused into ONE matmul
        # (identical params + math to the separate Linears — concatenated
        # output columns; see _LinearParams). Declaration order preserves
        # the historical param-init RNG paths.
        c_in = sd.shape[-1]
        kq, bq = _LinearParams(H * C, "torch", name="linear_q")(c_in)
        kkv, bkv = _LinearParams(2 * H * C, "torch", name="linear_kv")(c_in)
        kqp, bqp = _LinearParams(
            H * Pq * 3, "torch", name="linear_q_points"
        )(c_in)
        kkvp, bkvp = _LinearParams(
            H * (Pq + Pv) * 3, "torch", name="linear_kv_points"
        )(c_in)
        wcat = jnp.concatenate([kq, kkv, kqp, kkvp], axis=1)
        bcat = jnp.concatenate([bq, bkv, bqp, bkvp])
        if dt is not None:
            wcat, bcat = wcat.astype(dt), bcat.astype(dt)
        allp = sd @ wcat + bcat
        o0, o1, o2 = H * C, 3 * H * C, 3 * H * C + H * Pq * 3
        q = allp[..., :o0].reshape(F, N, H, C)
        kv = allp[..., o0:o1].reshape(F, N, H, 2 * C)
        k, v = jnp.split(kv, 2, axis=-1)

        # point qkv (in local frames, lifted to global); the frame lift is
        # geometry -> always float32
        q_pts = allp[..., o1:o2].astype(jnp.float32).reshape(F, N, H * Pq, 3)
        q_pts = r[..., None].apply(q_pts).reshape(F, N, H, Pq, 3)
        kv_pts = allp[..., o2:].astype(jnp.float32)
        kv_pts = kv_pts.reshape(F, N, H * (Pq + Pv), 3)
        kv_pts = r[..., None].apply(kv_pts).reshape(F, N, H, Pq + Pv, 3)
        k_pts, v_pts = kv_pts[..., :Pq, :], kv_pts[..., Pq:, :]

        # pair projections (frame-shared), fused the same way -------------
        zd = z.astype(dt) if dt is not None else z
        kb_, bb_ = _LinearParams(H, "torch", name="linear_b")(z.shape[-1])
        kdz, bdz = _LinearParams(
            c.c_z // 4, "torch", name="down_z"
        )(z.shape[-1])
        wz = jnp.concatenate([kb_, kdz], axis=1)
        bz = jnp.concatenate([bb_, bdz])
        if dt is not None:
            wz, bz = wz.astype(dt), bz.astype(dt)
        zall = zd @ wz + bz
        b = sp.shard(zall[..., :H], "seq")  # [N, N, H]
        pair_z = sp.shard(zall[..., H:], "seq")
        head_weights = nn.softplus(
            self.param(
                "head_weights",
                # explicit dtype: a weak-typed param would flip to strong
                # after the first optimizer step and force jit retraces
                lambda key, shape: jnp.full(shape, 0.541324854612918, jnp.float32),
                (H,),
            )
        ) * math.sqrt(1.0 / (3 * (Pq * 9.0 / 2)))
        c_qk = math.sqrt(1.0 / (3 * C))

        use_pallas = c.use_pallas_attention
        if isinstance(use_pallas, str):
            # CLI/YAML values arrive as strings ("true"/"Auto"/...).
            # Normalize case FIRST: an unnormalized truthy string like
            # "Auto" must not fall through to `if use_pallas:` and
            # force-enable the kernel.
            use_pallas = (
                "auto" if use_pallas.lower() == "auto"
                else use_pallas.lower() in ("1", "true", "yes", "on")
            )
        if use_pallas == "auto":
            # memory-only fallback: the kernel loses to the dense path at
            # every N that fits HBM (tiling-independent — docs/DESIGN.md
            # round-4 closure), so "auto" engages it only beyond
            # pallas_min_n where the dense [F,H,N,N] tensors cannot fit
            # at all. Pallas needs a real TPU (or interpret mode).
            import jax

            on_tpu = jax.default_backend() == "tpu" or c.pallas_interpret
            use_pallas = on_tpu and N >= c.pallas_min_n and N % 128 == 0
        if sp.is_active():
            # a pallas_call is opaque to GSPMD: under a 'seq' mesh it would
            # force an all-gather of its operands, defeating the sharding.
            # The dense einsum path partitions cleanly (see parallel/sp.py).
            use_pallas = False
        if use_pallas:
            from dynamicpdb_tpu.ops.pallas.ipa_attention import ipa_attention

            # the Pallas kernel is written for f32 operands; the dense path
            # below handles bf16 natively (f32 accumulators)
            o, o_pt_global, o_pair = ipa_attention(
                q.astype(jnp.float32), k.astype(jnp.float32),
                v.astype(jnp.float32), q_pts, k_pts, v_pts,
                b.astype(jnp.float32), pair_z.astype(jnp.float32),
                mask, head_weights,
                c_qk, math.sqrt(1.0 / 3), self.inf, 64, 128,
                c.pallas_interpret,
            )
            o = o.reshape(F, N, H * C)
            o_pair = o_pair.reshape(F, N, -1)
        else:
            o, o_pt_global, o_pair = dense_ipa_attention(
                q, k, v, q_pts, k_pts, v_pts, b, pair_z, mask,
                head_weights, c_qk, inf=self.inf,
            )
            o = o.reshape(F, N, H * C)
            o_pair = o_pair.reshape(F, N, -1)

        # DFOLD extra: keep the non-inverted (global-frame) point outputs
        o_pt_local = r[..., None, None].invert_apply(o_pt_global)
        o_pt_norm = jnp.sqrt(jnp.sum(o_pt_local**2, -1) + self.eps)
        o_pt_global_norm = jnp.sqrt(jnp.sum(o_pt_global**2, -1) + self.eps)

        # feature order mirrors the reference concat
        # (o, o_pt xyz-unbound, |o_pt|, o_pair, o_pt_global xyz, |o_pt_global|)
        def unbind_xyz(p):  # [F, N, H, Pv, 3] -> 3 x [F, N, H*Pv]
            return [p[..., i].reshape(F, N, H * Pv) for i in range(3)]

        o_feats = jnp.concatenate(
            [
                o,
                *unbind_xyz(o_pt_local),
                o_pt_norm.reshape(F, N, H * Pv),
                o_pair,
                *unbind_xyz(o_pt_global),
                o_pt_global_norm.reshape(F, N, H * Pv),
            ],
            axis=-1,
        )
        # the out-projection may compute in bf16 (its 3072-wide input is the
        # block's largest activation); the block's OUTPUT stays float32 so
        # downstream semantics (GlobalStatNorm, BackboneUpdate geometry) are
        # dtype-independent
        out = Linear(c.c_s, "final", dtype=dt, name="linear_out")(o_feats)
        return out.astype(jnp.float32)
