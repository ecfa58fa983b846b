"""Long-sequence training envelope on the attached TPU: flagship train step
at N in {256, 512, 1024} with the memory levers DESIGN.md names (remat,
Pallas flash-IPA) actually engaged.

The per-N story is qualitative in docs/DESIGN.md ("remat is the long-N
memory lever"); this measures it: steps/sec + peak-memory proxy per config,
and whether each config compiles/runs at all on one v5e (16 GB HBM).

Usage: python tools/bench_long_n.py [--ns 256,512,1024]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FRAME_TIME = 2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ns", default="256,512,1024")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=None,
                    help="also write the JSON to this artifact path "
                         "(bench.py surfaces docs/artifacts/long_n.json "
                         "as the long-N extra)")
    args = ap.parse_args()

    from dynamicpdb_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from dynamicpdb_tpu.config import Config, IPAConfig, ModelConfig
    from dynamicpdb_tpu.data.synthetic import make_window
    from dynamicpdb_tpu.diffusion.r3_diffuser import R3Config
    from dynamicpdb_tpu.diffusion.se3_diffuser import SE3Config
    from dynamicpdb_tpu.diffusion.so3_diffuser import SO3Config
    from dynamicpdb_tpu.train.experiment import Trainer

    results = {}
    for n_res in [int(x) for x in args.ns.split(",")]:
        for remat in ([False, True] if n_res > 256 else [False]):
            name = f"n{n_res}_remat{int(remat)}"
            cfg = Config(
                model=ModelConfig(
                    compute_dtype="bfloat16", remat=remat,
                    ipa=IPAConfig(use_pallas_attention="auto"),
                ),
                diffuser=SE3Config(
                    so3=SO3Config(cache_dir=".cache/igso3"),
                    r3=R3Config(coordinate_scaling=1.0),
                ),
            )
            cfg = dataclasses.replace(
                cfg, experiment=dataclasses.replace(
                    cfg.experiment, opt_state_dtype="bfloat16"
                )
            )
            window = make_window(n_res=n_res, frame_time=FRAME_TIME, seed=0)
            trainer = Trainer(cfg)
            key = jax.random.PRNGKey(0)
            K = 8  # scan-fused steps per device call: amortizes the ~45 ms
            # host-dispatch/fetch tunnel latency that dominates single-step
            # calls (same technique as bench.py)
            try:
                params, opt_state = trainer.init_params(key, window)
                batch = jax.device_put(jax.tree_util.tree_map(
                    lambda x: jnp.broadcast_to(
                        jnp.asarray(x)[None, None], (K, 1) + x.shape
                    ),
                    window,
                ))
                step = jax.jit(
                    trainer.multi_train_step, donate_argnums=(0, 1)
                )
                t0 = time.time()
                compiled = step.lower(params, opt_state, key, batch).compile()
                compile_s = time.time() - t0
                mem = compiled.memory_analysis()
                peak = getattr(mem, "temp_size_in_bytes", None)
                params, opt_state, aux = compiled(
                    params, opt_state, key, batch
                )
                float(aux["total_loss"])  # host fetch = true barrier
                times = []
                for rep in range(args.reps):
                    t0 = time.time()
                    params, opt_state, aux = compiled(
                        params, opt_state, jax.random.fold_in(key, rep), batch
                    )
                    float(aux["total_loss"])
                    times.append(time.time() - t0)
                results[name] = {
                    "steps_per_sec": round(K / float(np.median(times)), 2),
                    "compile_s": round(compile_s, 1),
                    "temp_bytes_gb": round(peak / 1e9, 2) if peak else None,
                    "loss": round(float(aux["total_loss"]), 3),
                }
            except Exception as e:  # OOM/compile failure IS the datum
                results[name] = {"error": str(e)[:160]}
            print(name, results[name], file=sys.stderr)
            # free device buffers before the next (larger) config — stale
            # params/opt-state/batch would contaminate the HBM envelope
            # this tool exists to measure
            params = opt_state = batch = compiled = aux = None  # noqa: F841
            del trainer
            import gc

            gc.collect()
    results["device"] = str(jax.devices()[0])
    print(json.dumps(results))
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
