"""A/B the optimizer-state dtype lever (train/optim.py) on the attached TPU.

The flagship train step is optimizer-bound at B=1 — the AMSGrad pass is pure
HBM traffic over params + three f32 moments (docs/DESIGN.md profile: 40% of
device time). Storing moments in bf16 halves that traffic. This measures
steps/sec at B=1 and windows/sec at B=4 for f32 vs bf16 state in one process.

Usage: python tools/bench_opt_state.py
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_RES = 256
FRAME_TIME = 2
K = 16


def main():
    from dynamicpdb_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from dynamicpdb_tpu.config import Config, ModelConfig
    from dynamicpdb_tpu.data.synthetic import make_window
    from dynamicpdb_tpu.diffusion.r3_diffuser import R3Config
    from dynamicpdb_tpu.diffusion.se3_diffuser import SE3Config
    from dynamicpdb_tpu.diffusion.so3_diffuser import SO3Config
    from dynamicpdb_tpu.train.experiment import Trainer

    window = make_window(n_res=N_RES, frame_time=FRAME_TIME, seed=0)
    out = {}
    for name in ["float32", "bfloat16"]:
        cfg = Config(
            model=ModelConfig(compute_dtype="bfloat16", remat=False),
            diffuser=SE3Config(
                so3=SO3Config(cache_dir=".cache/igso3"),
                r3=R3Config(coordinate_scaling=1.0),
            ),
        )
        cfg = dataclasses.replace(
            cfg, experiment=dataclasses.replace(
                cfg.experiment, opt_state_dtype=name
            )
        )
        trainer = Trainer(cfg)
        key = jax.random.PRNGKey(0)
        params, opt_state = trainer.init_params(key, window)
        res = {}
        for B in (1, 4):
            batch = jax.device_put(jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(
                    jnp.asarray(x)[None, None], (K, B) + x.shape
                ),
                window,
            ))
            step = jax.jit(trainer.multi_train_step, donate_argnums=(0, 1))
            t0 = time.time()
            compiled = step.lower(params, opt_state, key, batch).compile()
            print(f"{name} B={B}: compile {time.time()-t0:.1f}s",
                  file=sys.stderr)
            params, opt_state, aux = compiled(params, opt_state, key, batch)
            float(aux["total_loss"])  # host fetch = true barrier (axon)
            runs = []
            for rep in range(3):
                t0 = time.time()
                params, opt_state, aux = compiled(
                    params, opt_state, jax.random.fold_in(key, rep), batch
                )
                float(aux["total_loss"])
                runs.append(K * B / (time.time() - t0))
            res[f"windows_per_sec_b{B}"] = round(float(np.median(runs)), 2)
            print(f"{name} B={B}: {res[f'windows_per_sec_b{B}']} win/s "
                  f"(loss {float(aux['total_loss']):.3f})", file=sys.stderr)
        out[name] = res
        del params, opt_state
    out["speedup_b1"] = round(
        out["bfloat16"]["windows_per_sec_b1"]
        / out["float32"]["windows_per_sec_b1"], 3
    )
    out["speedup_b4"] = round(
        out["bfloat16"]["windows_per_sec_b4"]
        / out["float32"]["windows_per_sec_b4"], 3
    )
    out["device"] = str(jax.devices()[0])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
