"""Scan-fused K steps vs pipelined donated single-step calls.

The B=8 profile (tools/profile_train_breakdown.py) measures ~70 ms of
single-step compute, but the shipped scan-fused step (bench.py,
multi_train_step) delivers ~83 ms/step — the round-1 B=1 profile already
showed a 14% "copies" bucket (25k events) from scan-carry plumbing. A
lax.scan cannot donate its carry buffers the way jit(donate_argnums)
does, so the 184M-param f32 tree + bf16 AMSGrad moments may be copied
every iteration.

Hypothesis: K sequential calls of the DONATED single-step executable,
with NO host fetch in between, pipeline through the async dispatch queue
(the tunnel's ~30 ms floor is paid on the final fetch only, amortized
over K) and skip the carry copies entirely.

    python tools/bench_step_modes.py [--batch 8] [--k 8] [--reps 3]

Prints ms/step for both modes + the implied windows/s and MFU.
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
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args(argv)
    B, K = args.batch, args.k

    from dynamicpdb_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dynamicpdb_tpu.config import Config, ModelConfig
    from dynamicpdb_tpu.data.synthetic import make_window
    from dynamicpdb_tpu.diffusion.r3_diffuser import R3Config
    from dynamicpdb_tpu.diffusion.se3_diffuser import SE3Config
    from dynamicpdb_tpu.diffusion.so3_diffuser import SO3Config
    from dynamicpdb_tpu.train.experiment import Trainer

    cfg = Config(
        model=ModelConfig(compute_dtype="bfloat16", remat=False),
        diffuser=SE3Config(so3=SO3Config(cache_dir=".cache/igso3"),
                           r3=R3Config(coordinate_scaling=1.0)),
    )
    cfg = dataclasses.replace(
        cfg,
        experiment=dataclasses.replace(cfg.experiment,
                                       opt_state_dtype="bfloat16"),
    )
    window = make_window(n_res=256, frame_time=2, seed=0)
    trainer = Trainer(cfg)
    key = jax.random.PRNGKey(0)
    params, opt_state = trainer.init_params(key, window)
    dev = jax.devices()[0]
    peak = 197e12 if "v5 lite" in getattr(dev, "device_kind", "") else None

    batch1 = jax.device_put(
        jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(jnp.asarray(x)[None], (B,) + x.shape),
            window,
        )
    )
    batchK = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (K,) + x.shape), batch1
    )

    # --- mode A: scan-fused (shipped) -------------------------------------
    stepK = jax.jit(trainer.multi_train_step, donate_argnums=(0, 1))
    t0 = time.time()
    cK = stepK.lower(params, opt_state, key, batchK).compile()
    print(f"scan compile: {time.time() - t0:.1f}s", file=sys.stderr)
    fK = None
    try:
        cost = cK.cost_analysis()
        fK = float((cost[0] if isinstance(cost, (list, tuple)) else cost)["flops"])
    except Exception:
        pass
    params, opt_state, aux = cK(params, opt_state, key, batchK)
    float(aux["total_loss"])
    scan_ms = []
    for rep in range(args.reps):
        t0 = time.time()
        params, opt_state, aux = cK(
            params, opt_state, jax.random.fold_in(key, rep), batchK
        )
        float(aux["total_loss"])
        scan_ms.append((time.time() - t0) * 1e3 / K)
    scan_med = float(np.median(scan_ms))
    print(f"scan-fused: {scan_med:.2f} ms/step", file=sys.stderr)

    # --- mode B: pipelined donated single steps ---------------------------
    step1 = jax.jit(trainer.train_step, donate_argnums=(0, 1))
    t0 = time.time()
    c1 = step1.lower(params, opt_state, key, batch1).compile()
    print(f"single-step compile: {time.time() - t0:.1f}s", file=sys.stderr)
    params, opt_state, aux = c1(params, opt_state, key, batch1)
    float(aux["total_loss"])
    pipe_ms = []
    for rep in range(args.reps):
        t0 = time.time()
        for i in range(K):
            params, opt_state, aux = c1(
                params, opt_state, jax.random.fold_in(key, 100 * rep + i),
                batch1,
            )
        float(aux["total_loss"])  # ONE fetch: the only true barrier
        pipe_ms.append((time.time() - t0) * 1e3 / K)
    pipe_med = float(np.median(pipe_ms))
    print(f"pipelined donated: {pipe_med:.2f} ms/step", file=sys.stderr)

    out = {
        "device": str(dev), "B": B, "K": K,
        "scan_ms_per_step": round(scan_med, 2),
        "pipelined_ms_per_step": round(pipe_med, 2),
        "scan_wps": round(B / scan_med * 1e3, 1),
        "pipelined_wps": round(B / pipe_med * 1e3, 1),
    }
    if fK and peak:
        # XLA cost analysis counts a lax.scan body ONCE -> fK is per-step
        # FLOPs already (bench.py round-3 accounting note)
        out["scan_mfu"] = round(fK * (1e3 / scan_med) / peak, 4)
        out["pipelined_mfu"] = round(fK * (1e3 / pipe_med) / peak, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
