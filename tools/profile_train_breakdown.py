"""Stage-level timing of one flagship train step at the production batch.

Times jitted PREFIXES of the step with true host-fetch sync (the axon
tunnel ignores block_until_ready), so stage cost = adjacent difference:

  featurize   featurize_window + diffuse_training_window (vmapped)
  +forward    + score_forward
  +backward   + loss + grad (value_and_grad)
  +optimizer  + AMSGrad update + apply (the FULL train step)

Updates the docs/DESIGN.md "where a train step goes" table at the shipped
B=8 configuration (the committed table was measured at B=1).

Usage: python tools/profile_train_breakdown.py [--batch 8] [--n-res 256]
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
    ap.add_argument("--n-res", type=int, default=256)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args(argv)

    from dynamicpdb_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dynamicpdb_tpu.config import Config, ModelConfig
    from dynamicpdb_tpu.data.featurize import (
        diffuse_training_window, featurize_window,
    )
    from dynamicpdb_tpu.data.synthetic import make_window
    from dynamicpdb_tpu.diffusion.r3_diffuser import R3Config
    from dynamicpdb_tpu.diffusion.se3_diffuser import SE3Config
    from dynamicpdb_tpu.diffusion.so3_diffuser import SO3Config
    from dynamicpdb_tpu.models.score_network import score_forward
    from dynamicpdb_tpu.train.experiment import Trainer

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
    B = args.batch
    batch = jax.device_put(
        jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(jnp.asarray(x)[None], (B,) + x.shape),
            window,
        )
    )
    diffuser = trainer.diffuser
    min_t = cfg.data.min_t

    def feat_one(key, raw):
        feats = featurize_window(raw)
        return diffuse_training_window(key, feats, diffuser, min_t)

    def featurize_stage(params, key, raw_batch):
        keys = jax.random.split(key, B)
        feats = jax.vmap(feat_one)(keys, raw_batch)
        return jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x.astype(jnp.float32)), feats, 0.0
        )

    def forward_stage(params, key, raw_batch):
        keys = jax.random.split(key, B)
        feats = jax.vmap(feat_one)(keys, raw_batch)
        out = jax.vmap(
            lambda f: score_forward(trainer.model, params, diffuser, f)
        )(feats)
        return jnp.sum(out["rigids"].astype(jnp.float32))

    def backward_stage(params, key, raw_batch):
        (loss, _), grads = jax.value_and_grad(
            trainer.loss_fn, has_aux=True
        )(params, key, raw_batch)
        return loss + jax.tree_util.tree_reduce(
            lambda a, g: a + jnp.sum(g.astype(jnp.float32)), grads, 0.0
        )

    def full_stage(params, opt_state, key, raw_batch):
        p, s, aux = trainer.train_step(params, opt_state, key, raw_batch)
        return aux["total_loss"] + jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x.astype(jnp.float32)), p, 0.0
        )

    # per-call dispatch+fetch floor: through the axon tunnel a TRIVIAL jit
    # call costs ~30 ms — any stage's ABSOLUTE time includes it, so the
    # first stage would otherwise absorb the floor as fake compute
    # (discovered when "featurize" read 30 ms but frames-only and
    # torsions-only each also read ~29 ms)
    triv = jax.jit(lambda v: jnp.sum(v))
    float(triv(jnp.ones((8,))))
    floor = float(np.median(
        [_timed(lambda: float(triv(jnp.ones((8,))))) for _ in range(7)]
    ))
    print(f"per-call floor: {floor*1e3:.1f} ms", file=sys.stderr)

    stages = [
        ("featurize", jax.jit(featurize_stage), (params, key, batch)),
        ("+forward", jax.jit(forward_stage), (params, key, batch)),
        ("+backward", jax.jit(backward_stage), (params, key, batch)),
        ("+optimizer", jax.jit(full_stage), (params, opt_state, key, batch)),
    ]
    times = {}
    for name, fn, a in stages:
        t0 = time.time()
        out = fn(*a)
        float(out)
        compile_s = time.time() - t0
        reps = []
        for r in range(args.reps):
            t0 = time.time()
            float(fn(*a))
            reps.append(time.time() - t0)
        times[name] = float(np.median(reps))
        print(f"{name:<11} {times[name]*1e3:8.1f} ms  "
              f"(compile {compile_s:.0f}s)", file=sys.stderr)

    names = [s[0] for s in stages]
    deltas = {}
    prev = floor  # subtract the dispatch floor from the first stage
    for n in names:
        deltas[n] = max(times[n] - prev, 0.0)
        prev = times[n]
    total = max(times[names[-1]] - floor, 1e-9)
    print("\nstage deltas, floor-corrected (B=%d, N=%d; compute total "
          "%.1f ms):" % (B, args.n_res, total * 1e3), file=sys.stderr)
    for n in names:
        print(f"  {n:<11} {deltas[n]*1e3:8.1f} ms  "
              f"{deltas[n]/total:6.1%}", file=sys.stderr)
    print(json.dumps({"B": B, "n_res": args.n_res,
                      "per_call_floor_ms": round(floor * 1e3, 1),
                      "stage_ms": {k: round(v * 1e3, 1)
                                   for k, v in times.items()},
                      "delta_ms": {k: round(v * 1e3, 1)
                                   for k, v in deltas.items()}}))


def _timed(fn):
    t0 = time.time()
    fn()
    return time.time() - t0


if __name__ == "__main__":
    main()
