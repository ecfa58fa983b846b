"""Benchmark the fused Pallas IPA kernel vs the decomposed jnp path on the
attached TPU: forward and forward+backward at N in {256, 512, 1024}.

Emits a markdown table (for docs/DESIGN.md) and a JSON line. The flagship
attention shape is used (H=8, C=256, Pq=8, Pv=12, Dz=32), F=2 frames.

    python tools/bench_pallas.py [--sizes 256,512,1024] [--reps 3]
"""
from __future__ import annotations

import argparse
import functools
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--sizes", default="256,512,1024")
    parser.add_argument("--reps", type=int, default=3)
    parser.add_argument("--f", type=int, default=2)
    parser.add_argument("--blk-q", type=int, default=64)
    parser.add_argument("--blk-k", type=int, default=128)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dynamicpdb_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from dynamicpdb_tpu.ops.pallas.ipa_attention import (
        _dense_reference,
        ipa_attention,
    )

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    F, H, C, Pq, Pv, Dz = args.f, 8, 256, 8, 12, 32
    c_qk = math.sqrt(1.0 / (3 * C))

    rows = []
    for N in [int(s) for s in args.sizes.split(",")]:
        rng = np.random.default_rng(0)
        f32 = lambda *s: jnp.asarray(rng.normal(size=s) * 0.3, jnp.float32)
        d = dict(
            q=f32(F, N, H, C), k=f32(F, N, H, C), v=f32(F, N, H, C),
            q_pts=f32(F, N, H, Pq, 3), k_pts=f32(F, N, H, Pq, 3),
            v_pts=f32(F, N, H, Pv, 3), bias=f32(N, N, H),
            pair_z=f32(N, N, Dz), mask=jnp.ones((F, N)),
            head_weights=jnp.asarray(rng.uniform(0.3, 1, H), jnp.float32),
        )
        arglist = (d["q"], d["k"], d["v"], d["q_pts"], d["k_pts"],
                   d["v_pts"], d["bias"], d["pair_z"], d["mask"],
                   d["head_weights"])

        def pallas_fwd(*a):
            return ipa_attention(*a, c_qk, math.sqrt(1 / 3), 1e5,
                                 args.blk_q, args.blk_k, False, True)

        def dense_fwd(*a):
            return _dense_reference(*a, c_qk, math.sqrt(1 / 3), 1e5)

        def loss(fwd):
            def f(*a):
                o, o_pt, o_pair = fwd(*a)
                return (jnp.sum(o**2) + jnp.sum(o_pt**2)
                        + jnp.sum(o_pair**2))
            return f

        R = 32  # iterations fused in one device call: the tunneled chip has
        # ~50-100 us dispatch latency that would swamp sub-ms kernels

        def timeit(fn, *a):
            @jax.jit
            def many(*a):
                def body(carry, _):
                    out = fn(carry, *a[1:])
                    s = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(out))
                    # data dependence so XLA can't hoist/dedup iterations
                    return carry + 1e-12 * s, s
                carry, ss = jax.lax.scan(body, a[0], None, length=R)
                return jnp.sum(ss)

            # NOTE: jax.block_until_ready does NOT synchronize through the
            # axon tunnel (measured: 8 chained 4096^3 matmuls "done" in
            # 60 us) — a host fetch of the scalar result is the only true
            # barrier
            float(many(*a))
            best = float("inf")
            for _ in range(args.reps):
                t0 = time.time()
                float(many(*a))
                best = min(best, time.time() - t0)
            return best * 1e3 / R  # ms per iteration

        row = {"N": N}
        try:
            row["pallas_fwd_ms"] = timeit(jax.jit(pallas_fwd), *arglist)
            grad_p = jax.jit(jax.grad(loss(pallas_fwd), argnums=(0, 6, 7)))
            row["pallas_fwdbwd_ms"] = timeit(grad_p, *arglist)
        except Exception as e:  # OOM at long N etc.
            row["pallas_error"] = str(e)[:200]
        try:
            row["dense_fwd_ms"] = timeit(jax.jit(dense_fwd), *arglist)
            grad_d = jax.jit(jax.grad(loss(dense_fwd), argnums=(0, 6, 7)))
            row["dense_fwdbwd_ms"] = timeit(grad_d, *arglist)
        except Exception as e:
            row["dense_error"] = str(e)[:200]
        if "pallas_fwdbwd_ms" in row and "dense_fwdbwd_ms" in row:
            row["speedup_fwd"] = round(
                row["dense_fwd_ms"] / row["pallas_fwd_ms"], 2
            )
            row["speedup_fwdbwd"] = round(
                row["dense_fwdbwd_ms"] / row["pallas_fwdbwd_ms"], 2
            )
        rows.append(row)
        print(row, file=sys.stderr)

    print("| N | dense fwd (ms) | pallas fwd (ms) | dense fwd+bwd | "
          "pallas fwd+bwd | speedup fwd | speedup fwd+bwd |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['N']} | {r.get('dense_fwd_ms', float('nan')):.2f} | "
              f"{r.get('pallas_fwd_ms', float('nan')):.2f} | "
              f"{r.get('dense_fwdbwd_ms', float('nan')):.2f} | "
              f"{r.get('pallas_fwdbwd_ms', float('nan')):.2f} | "
              f"{r.get('speedup_fwd', '-')} | {r.get('speedup_fwdbwd', '-')} |")
    print(json.dumps({"device": str(dev), "rows": rows}))


if __name__ == "__main__":
    main()
