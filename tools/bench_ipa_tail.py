"""Decompose the IPA block's non-attention tail at production shapes.

bench_mxu_headroom.py established (docs/DESIGN.md): at B=8/F=2/N=256 one
IPA block forward costs ~0.95 ms of which the dense attention core is only
~0.16 ms — the rest is projections, the point lift, and the output tail.
VERDICT r3 names this tail (4x blocks, fwd+bwd ~10.9 ms/step) as the main
MFU lever left. This tool splits the tail into stages and A/Bs candidate
rewrites, using the SAME param tree as the shipped module so any winning
variant is exactly transplantable:

  stage.proj_scalar   q + kv Linears (+ reshape/split)           [s -> q,k,v]
  stage.proj_points   q_pts + kv_pts Linears (+ reshape)         [s -> flat pts]
  stage.lift          frame lift of the point projections        (f32 geometry)
  stage.proj_pair     b + down_z Linears on z                    [z -> bias,pz]
  stage.post_tail     invert_apply + norms + unbind + concat + linear_out
  block.full          the shipped module forward (reference point)

  ab.fused_sproj      ONE concatenated [c_s, 6720] matmul for all four
                      s-side projections, sliced after (same params)
  ab.block_fused      full block with the fused s-projection transplanted

Usage: python tools/bench_ipa_tail.py [--reps 5] [--iters 64] [--batch 8]
Writes the table to stdout as JSON; analysis goes to docs/DESIGN.md.
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time_one(fn):
    t0 = time.time()
    fn()
    return time.time() - t0


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args(argv)
    R = args.iters

    from dynamicpdb_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from dynamicpdb_tpu.config import IPAConfig
    from dynamicpdb_tpu.models.ipa import InvariantPointAttention, dense_ipa_attention
    from dynamicpdb_tpu.ops.rigid import Rigid

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    triv = jax.jit(lambda x: x + 1.0)
    float(triv(jnp.float32(0.0)))
    floor = min(_time_one(lambda: float(triv(jnp.float32(i)))) for i in range(7))
    print(f"per-call floor: {floor * 1e3:.1f} ms", file=sys.stderr)

    def timeit(fn, *a):
        @jax.jit
        def many(*a):
            def body(carry, _):
                out = fn(carry, *a[1:])
                s = sum(
                    jnp.sum(x.astype(jnp.float32))
                    for x in jax.tree_util.tree_leaves(out)
                )
                return carry + (1e-12 * s).astype(carry.dtype), s

            carry, ss = jax.lax.scan(body, a[0], None, length=R)
            return jnp.sum(ss)

        float(many(*a))
        best = min(_time_one(lambda: float(many(*a))) for _ in range(args.reps))
        return max(best - floor, 1e-5) * 1e3 / R

    out = {"device": str(dev), "floor_ms": round(floor * 1e3, 1), "iters": R}

    def record(tag, ms):
        out[tag] = round(ms, 3)
        print(f"{tag}: {ms:.3f} ms", file=sys.stderr)

    key = jax.random.PRNGKey(0)
    B, F, N = args.batch, 2, 256
    cfg = IPAConfig()
    H, C, Pq, Pv = cfg.no_heads, cfg.c_hidden, cfg.no_qk_points, cfg.no_v_points
    Dz = cfg.c_z // 4
    bf16 = jnp.bfloat16

    ipa = InvariantPointAttention(cfg, dtype=bf16)
    s = jax.random.normal(key, (B, F, N, cfg.c_s), jnp.float32)
    z = jax.random.normal(key, (N, N, cfg.c_z), jnp.float32)
    q7 = jnp.zeros((B, F, N, 7)).at[..., 0].set(1.0)
    nmask = jnp.ones((B, F, N))
    params = jax.jit(ipa.init)(key, s[0], z, Rigid.from_tensor_7(q7[0]), nmask[0])
    p = params["params"]

    def W(name):  # [in, out] torch-layout kernels stored transposed by flax
        return p[name]["kernel"], p[name]["bias"]

    # ---- shipped full block ------------------------------------------------
    def block_full(sc, pp):
        return jax.vmap(
            lambda si, qi: ipa.apply(pp, si, z, Rigid.from_tensor_7(qi), nmask[0])
        )(sc, q7)

    record("block_full", timeit(block_full, s, params))

    # ---- stages (mirrors models/ipa.py body; bf16 proj, f32 geometry) ------
    def lin(x, name, dt=bf16):
        k, b = W(name)
        return x.astype(dt) @ k.astype(dt) + b.astype(dt)

    def proj_scalar(sc, _):
        q = lin(sc, "linear_q").reshape(B, F, N, H, C)
        kv = lin(sc, "linear_kv").reshape(B, F, N, H, 2 * C)
        k_, v_ = jnp.split(kv, 2, axis=-1)
        return q, k_, v_

    record("stage_proj_scalar", timeit(proj_scalar, s, params))

    def proj_points_nolift(sc, _):
        qp = lin(sc, "linear_q_points").astype(jnp.float32)
        kvp = lin(sc, "linear_kv_points").astype(jnp.float32)
        return qp, kvp

    record("stage_proj_points_nolift", timeit(proj_points_nolift, s, params))

    r_all = jax.vmap(Rigid.from_tensor_7)(q7)

    def proj_points_lift(sc, _):
        qp, kvp = proj_points_nolift(sc, None)
        r = Rigid(r_all.quat, r_all.trans)
        qp = r[..., None].apply(qp.reshape(B, F, N, H * Pq, 3))
        kvp = r[..., None].apply(kvp.reshape(B, F, N, H * (Pq + Pv), 3))
        return qp, kvp

    record("stage_proj_points_lift", timeit(proj_points_lift, s, params))

    def proj_pair(sc, _):
        zz = z.astype(bf16)
        return lin(zz, "linear_b"), lin(zz, "down_z")

    record("stage_proj_pair", timeit(proj_pair, s, params))

    # precomputed attention outputs for the post tail
    o = jax.random.normal(key, (B, F, N, H * C), jnp.float32)
    o_pt = jax.random.normal(key, (B, F, N, H, Pv, 3), jnp.float32)
    o_pair = jax.random.normal(key, (B, F, N, H * Dz), jnp.float32)

    def post_tail(oc, _):
        r = Rigid(r_all.quat, r_all.trans)
        o_pt_local = r[..., None, None].invert_apply(o_pt)
        o_pt_norm = jnp.sqrt(jnp.sum(o_pt_local**2, -1) + 1e-8)
        o_pt_gnorm = jnp.sqrt(jnp.sum(o_pt**2, -1) + 1e-8)

        def unbind(pt):
            return [pt[..., i].reshape(B, F, N, H * Pv) for i in range(3)]

        feats = jnp.concatenate(
            [
                oc,
                *unbind(o_pt_local),
                o_pt_norm.reshape(B, F, N, H * Pv),
                o_pair,
                *unbind(o_pt),
                o_pt_gnorm.reshape(B, F, N, H * Pv),
            ],
            axis=-1,
        )
        return lin(feats, "linear_out").astype(jnp.float32)

    record("stage_post_tail", timeit(post_tail, o, params))

    # attention core (for completeness at this B)
    cqk = math.sqrt(1.0 / (3 * C))
    hw = jnp.ones((H,), jnp.float32)
    qf = jax.random.normal(key, (B, F, N, H, C), jnp.float32)
    qpf = jax.random.normal(key, (B, F, N, H, Pq, 3), jnp.float32)
    vpf = jax.random.normal(key, (B, F, N, H, Pv, 3), jnp.float32)
    bias = jax.random.normal(key, (N, N, H), jnp.float32)
    pz = jax.random.normal(key, (N, N, Dz), jnp.float32)

    def att_core(qc, _):
        return jax.vmap(
            lambda qi: dense_ipa_attention(
                qi, qf[0], qf[0], qpf[0], qpf[0], vpf[0], bias, pz,
                nmask[0], hw, cqk
            )
        )(qc)

    record("stage_attn_core", timeit(att_core, qf, params))

    # ---- A/B: fused s-side projection (one [c_s, 6720] matmul) ------------
    ks = [W(n) for n in ("linear_q", "linear_kv", "linear_q_points",
                         "linear_kv_points")]
    widths = [k.shape[1] for k, _ in ks]

    def fused_sproj(sc, _):
        kcat = jnp.concatenate([k for k, _ in ks], axis=1).astype(bf16)
        bcat = jnp.concatenate([b for _, b in ks]).astype(bf16)
        allp = sc.astype(bf16) @ kcat + bcat
        i0, i1, i2 = widths[0], widths[0] + widths[1], sum(widths[:3])
        q = allp[..., :i0].reshape(B, F, N, H, C)
        kv = allp[..., i0:i1].reshape(B, F, N, H, 2 * C)
        k_, v_ = jnp.split(kv, 2, axis=-1)
        qp = allp[..., i1:i2].astype(jnp.float32)
        kvp = allp[..., i2:].astype(jnp.float32)
        return q, k_, v_, qp, kvp

    record("ab_fused_sproj", timeit(fused_sproj, s, params))

    def sep_sproj(sc, _):
        q, k_, v_ = proj_scalar(sc, None)
        qp, kvp = proj_points_nolift(sc, None)
        return q, k_, v_, qp, kvp

    record("ab_separate_sproj", timeit(sep_sproj, s, params))

    print(json.dumps(out))


if __name__ == "__main__":
    main()
