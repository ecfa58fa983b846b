"""Per-device batch-size sweep of the flagship train step on the attached
TPU: locates the throughput knee that sets ExperimentConfig.batch_size
(docs/DESIGN.md). Prints windows/sec + MFU per B.

    python tools/bench_batch_sweep.py [--bs 1,2,4,8,12,16] [--k 4]
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
    ap.add_argument("--bs", default="1,2,4,8,12,16")
    ap.add_argument("--k", type=int, default=4,
                    help="scan-fused steps per device call")
    ap.add_argument("--n-res", type=int, default=256)
    args = ap.parse_args(argv)

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

    from bench import _flops_of, _peak_flops  # repo-root bench.py helpers

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    peak = _peak_flops(dev)

    cfg = Config(
        model=ModelConfig(compute_dtype="bfloat16", remat=False),
        diffuser=SE3Config(so3=SO3Config(cache_dir=".cache/igso3"),
                           r3=R3Config(coordinate_scaling=1.0)),
    )
    cfg = dataclasses.replace(
        cfg, experiment=dataclasses.replace(
            cfg.experiment, opt_state_dtype="bfloat16"
        ),
    )
    window = make_window(n_res=args.n_res, frame_time=2, seed=0)
    trainer = Trainer(cfg)
    key = jax.random.PRNGKey(0)
    params, opt_state = trainer.init_params(key, window)

    rows = []
    for B in [int(b) for b in args.bs.split(",")]:
        K = args.k
        batch = jax.device_put(
            jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(
                    jnp.asarray(x)[None, None], (K, B) + x.shape
                ),
                window,
            )
        )
        step = jax.jit(trainer.multi_train_step, donate_argnums=(0, 1))
        t0 = time.time()
        try:
            compiled = step.lower(params, opt_state, key, batch).compile()
        except Exception as e:
            print(f"B={B}: compile failed ({type(e).__name__}: {e})",
                  file=sys.stderr)
            break
        compile_s = time.time() - t0
        try:
            params, opt_state, aux = compiled(params, opt_state, key, batch)
            float(aux["total_loss"])  # host fetch = the only true barrier
        except Exception as e:
            print(f"B={B}: run failed ({type(e).__name__})", file=sys.stderr)
            break
        wps = []
        for rep in range(3):
            t0 = time.time()
            params, opt_state, aux = compiled(
                params, opt_state, jax.random.fold_in(key, rep), batch
            )
            float(aux["total_loss"])
            wps.append(K * B / (time.time() - t0))
        med = float(np.median(wps))
        # scan body counted once by cost analysis => total == per-step
        f = _flops_of(compiled)
        mfu = (f * (med / B) / peak) if f and peak else None
        rows.append({"B": B, "windows_per_sec": round(med, 2),
                     "mfu": round(mfu, 4) if mfu else None,
                     "compile_s": round(compile_s, 1)})
        print(f"B={B:3d}: {med:7.2f} win/s  MFU={mfu:.4f}  "
              f"(compile {compile_s:.0f}s)", file=sys.stderr)
        del batch, compiled

    print(json.dumps(rows))


if __name__ == "__main__":
    main()
