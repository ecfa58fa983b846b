"""Where does the remaining MFU headroom live? On-chip microbenchmarks.

The shipped B=8 train step measures 42% MFU (bench.py / docs/DESIGN.md) and
the stage profile says fwd+bwd is ~94% of device compute. This tool bounds
what is achievable by timing each compute component standalone at the
production shapes (B=8, F=2, N=256), with the ~30 ms per-device-call tunnel
floor measured explicitly and subtracted (a lax.scan of R iterations pays
the floor once, so per-iter cost = (T - floor) / R):

  1. pure bf16 matmul ceiling on THIS chip (1024..8192 square) -> the
     achievable fraction of the 197 TF/s v5e datasheet peak;
  2. the shared ConvNet (~90% of model FLOPs, bf16) fwd and fwd+bwd vs its
     analytic FLOPs -> isolated MXU efficiency of the dominant op;
  3. one InvariantPointAttention block (f32 params, as shipped): full
     block, and the dense_ipa_attention core alone -> how much the
     attention einsum chain vs the linear/point-lift tail costs. NOTE:
     f32 jnp matmuls still run the MXU in bf16 (JAX default matmul
     precision on TPU), so "f32" here costs bandwidth, not MXU rate;
  4. the conditioning tail: 5x MLPEmbedder + AngleResnet.

Usage: python tools/bench_mxu_headroom.py [--reps 5] [--iters 64]
Results table + analysis: docs/DESIGN.md "MFU headroom accounting".
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    from dynamicpdb_tpu.models.layers import AngleResnet, ConvNet, MLPEmbedder
    from dynamicpdb_tpu.ops.rigid import Rigid

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    # --- per-call floor: a trivial jitted scalar op, host-fetch synced ----
    triv = jax.jit(lambda x: x + 1.0)
    float(triv(jnp.float32(0.0)))
    floor = min(
        _time_one(lambda: float(triv(jnp.float32(i)))) for i in range(7)
    )
    print(f"per-call floor: {floor * 1e3:.1f} ms", file=sys.stderr)

    def timeit(fn, *a):
        """Floor-corrected ms per iteration of fn (first arg = carry)."""

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

        float(many(*a))  # compile + warm
        best = min(
            _time_one(lambda: float(many(*a))) for _ in range(args.reps)
        )
        # floor varies with host contention; clamp so a sub-floor
        # measurement reads as "too fast to resolve", not zero
        return max(best - floor, 1e-5) * 1e3 / R

    out = {"device": str(dev), "floor_ms": round(floor * 1e3, 1), "iters": R}
    key = jax.random.PRNGKey(0)
    B, F, N, C = args.batch, 2, 256, 1280

    def record(tag, ms, flops=None):
        row = {"ms": round(ms, 3)}
        if flops:
            tf = flops / (ms * 1e-3) / 1e12
            row |= {"tf_per_s": round(tf, 1),
                    "pct_peak": round(100 * tf / 197, 1)}
        out[tag] = row
        extra = (f"  {row['tf_per_s']} TF/s ({row['pct_peak']}% of 197)"
                 if flops else "")
        print(f"{tag}: {ms:.3f} ms{extra}", file=sys.stderr)

    # --- 1. bf16 matmul ceiling ------------------------------------------
    for m in (1024, 2048, 4096, 8192):
        a = jax.random.normal(key, (m, m), jnp.bfloat16)
        b = jax.random.normal(key, (m, m), jnp.bfloat16)
        record(f"matmul_{m}", timeit(lambda x, y: x @ y, a, b), 2 * m**3)

    # --- 2. ConvNet standalone (the model's dominant op) ------------------
    conv = ConvNet(C, dtype=jnp.bfloat16)
    x = jax.random.normal(key, (B, F, N, C), jnp.bfloat16)
    mask = jnp.ones((B, F, N))
    cparams = jax.jit(conv.init)(key, x[0], mask[0])
    # analytic FLOPs per window (unfolded small-F path, layers.py): 4
    # residual blocks x 2 convs x F_out*F_in=4 einsum terms, each
    # N * (5*Cin) * Cout MACs; conv1 (C->C/2) and conv2 (C/2->C) terms are
    # equal, so per conv = 4*N*5*C*(C/2)*2 FLOPs
    conv_flops = B * 4 * 2 * (4 * N * 5 * C * (C // 2) * 2)

    def conv_fwd(xc, p):
        return jax.vmap(lambda xi: conv.apply(p, xi, mask[0]))(xc)

    record("convnet_fwd", timeit(conv_fwd, x, cparams), conv_flops)
    gc = jax.grad(
        lambda xc, p: jnp.sum(conv_fwd(xc, p).astype(jnp.float32) ** 2),
        argnums=1,
    )
    record("convnet_fwdbwd", timeit(lambda xc, p: gc(xc, p), x, cparams),
           3 * conv_flops)

    # --- 3. IPA block standalone (f32, as shipped) ------------------------
    cfg = IPAConfig()
    H, Ch, Pq, Pv = cfg.no_heads, cfg.c_hidden, cfg.no_qk_points, cfg.no_v_points
    ipa = InvariantPointAttention(cfg)
    s = jax.random.normal(key, (B, F, N, cfg.c_s), jnp.float32)
    z = jax.random.normal(key, (N, N, cfg.c_z), jnp.float32)
    q7 = jnp.zeros((B, F, N, 7)).at[..., 0].set(1.0)
    nmask = jnp.ones((B, F, N))
    iparams = jax.jit(ipa.init)(
        key, s[0], z, Rigid.from_tensor_7(q7[0]), nmask[0]
    )

    def ipa_fwd(sc, p):
        return jax.vmap(
            lambda si, qi: ipa.apply(p, si, z, Rigid.from_tensor_7(qi), nmask[0])
        )(sc, q7)

    record("ipa_block_fwd_f32", timeit(ipa_fwd, s, iparams))
    gi = jax.grad(lambda sc, p: jnp.sum(ipa_fwd(sc, p) ** 2), argnums=1)
    record("ipa_block_fwdbwd_f32", timeit(lambda sc, p: gi(sc, p), s, iparams))

    # same block with the production bf16 projection path (logits/softmax/
    # geometry stay f32 — ipa.py dtype field); params are identical
    ipa16 = InvariantPointAttention(cfg, dtype=jnp.bfloat16)

    def ipa16_fwd(sc, p):
        return jax.vmap(
            lambda si, qi: ipa16.apply(
                p, si, z, Rigid.from_tensor_7(qi), nmask[0]
            )
        )(sc, q7)

    record("ipa_block_fwd_bf16proj", timeit(ipa16_fwd, s, iparams))
    gi16 = jax.grad(lambda sc, p: jnp.sum(ipa16_fwd(sc, p) ** 2), argnums=1)
    record("ipa_block_fwdbwd_bf16proj",
           timeit(lambda sc, p: gi16(sc, p), s, iparams))

    # attention core alone (precomputed projections)
    import math

    q = jax.random.normal(key, (B, F, N, H, Ch), jnp.float32)
    k = jax.random.normal(key, (B, F, N, H, Ch), jnp.float32)
    v = jax.random.normal(key, (B, F, N, H, Ch), jnp.float32)
    qp = jax.random.normal(key, (B, F, N, H, Pq, 3), jnp.float32)
    kp = jax.random.normal(key, (B, F, N, H, Pq, 3), jnp.float32)
    vp = jax.random.normal(key, (B, F, N, H, Pv, 3), jnp.float32)
    bias = jax.random.normal(key, (N, N, H), jnp.float32)
    pz = jax.random.normal(key, (N, N, cfg.c_z // 4), jnp.float32)
    hw = jnp.ones((H,), jnp.float32)
    cqk = math.sqrt(1.0 / (3 * Ch))

    def att_core(qc, *rest):
        return jax.vmap(
            lambda qi, ki, vi, qpi, kpi, vpi: dense_ipa_attention(
                qi, ki, vi, qpi, kpi, vpi, bias, pz, nmask[0], hw, cqk
            )
        )(qc, *rest)

    record("ipa_attention_core_fwd_f32", timeit(att_core, q, k, v, qp, kp, vp))

    # --- 4. conditioning tail: 5x MLPEmbedder + AngleResnet ---------------
    emb = MLPEmbedder(256, dtype=jnp.bfloat16)
    xe = jax.random.normal(key, (B, F, N, 14), jnp.float32)
    eparams = jax.jit(emb.init)(key, xe[0], nmask[0])

    def emb5(xc, p):
        o = 0.0
        for i in range(5):
            o = o + jax.vmap(
                lambda xi: emb.apply(p, xi + i, nmask[0])
            )(xc).astype(jnp.float32)
        return o

    record("embedder_x5_fwd", timeit(emb5, xe, eparams))

    ar = AngleResnet(C, no_blocks=2, no_angles=7, eps=1e-12,
                     dtype=jnp.bfloat16)
    xa = jax.random.normal(key, (B, F, N, C), jnp.float32)
    aparams = jax.jit(ar.init)(key, xa[0], xa[0])

    def ar_fwd(xc, p):
        u, a = jax.vmap(lambda xi: ar.apply(p, xi, xi))(xc)
        return u.astype(jnp.float32), a.astype(jnp.float32)

    record("angle_resnet_fwd", timeit(ar_fwd, xa, aparams))

    print(json.dumps(out))


def _time_one(f):
    t0 = time.time()
    f()
    return time.time() - t0


if __name__ == "__main__":
    main()
