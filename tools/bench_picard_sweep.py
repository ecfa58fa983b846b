"""Find (or refute) a win region for the Picard parallel-in-time sampler.

VERDICT r3 item 6: picard.py is measured-negative at the release num_t=10
("wavefront-limited", docstring) — sweep num_t toward the 50-200 range the
reference uses in other configs and either find the crossover or record the
negative result and keep the sampler demoted.

Why num_t could change the verdict: each reverse Euler-Maruyama substep is
x -> x + beta(t)*dt*(...) with dt = 1/num_t, so the per-step map approaches
identity as num_t grows; if sweep-to-sweep contraction improves faster than
the sweep count T-1 grows, total sweeps M(T) flattens and the batched sweep
(T-1 model evals on the MXU at once) beats T sequential evals.

Measures, at the flagship model (N=256, F=2, random init weights):
  sequential rollout of ONE window, num_t steps   -> wall ms
  picard_reverse_sample, tol=1e-3                 -> wall ms, n_sweeps
  the break-even sweep count: seq_ms / sweep_ms

Usage: python tools/bench_picard_sweep.py [--num-t 10,25,50,100]
Prints one JSON line; analysis goes to docs/DESIGN.md + the picard
docstring.
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
    ap.add_argument("--num-t", default="10,25,50,100")
    ap.add_argument("--n-res", type=int, default=256)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tol", type=float, default=1e-3)
    args = ap.parse_args(argv)

    from dynamicpdb_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dynamicpdb_tpu.config import Config, ModelConfig
    from dynamicpdb_tpu.data.featurize import eval_init_window, featurize_window
    from dynamicpdb_tpu.data.synthetic import make_window
    from dynamicpdb_tpu.diffusion.r3_diffuser import R3Config
    from dynamicpdb_tpu.diffusion.se3_diffuser import SE3Config, SE3Diffuser
    from dynamicpdb_tpu.diffusion.so3_diffuser import SO3Config
    from dynamicpdb_tpu.models.score_network import DFoldScoreNetwork
    from dynamicpdb_tpu.sampling.picard import picard_reverse_sample
    from dynamicpdb_tpu.sampling.reverse import reverse_sample

    cfg = Config(
        model=ModelConfig(compute_dtype="bfloat16", remat=False),
        diffuser=SE3Config(so3=SO3Config(cache_dir=".cache/igso3"),
                           r3=R3Config(coordinate_scaling=1.0)),
    )
    model = DFoldScoreNetwork(cfg.model)
    diffuser = SE3Diffuser(cfg.diffuser)
    window = make_window(n_res=args.n_res, frame_time=2, seed=0)
    key = jax.random.PRNGKey(0)
    feats = featurize_window(jax.tree_util.tree_map(jnp.asarray, window))
    feats = eval_init_window(jax.random.PRNGKey(1), feats, diffuser)
    params = jax.jit(model.init)(key, feats)

    dev = jax.devices()[0]
    rows = []
    for T in [int(x) for x in args.num_t.split(",")]:
        seq = jax.jit(
            lambda p, k, T=T: reverse_sample(
                k, model, p, diffuser, feats, num_t=T, noise_scale=0.1,
            )["rigids"]
        )
        pic = jax.jit(
            lambda p, k, T=T: picard_reverse_sample(
                k, model, p, diffuser, feats, num_t=T, noise_scale=0.1,
                tol=args.tol,
            )
        )
        r = np.asarray(seq(params, key))  # compile + warm
        po = pic(params, key)
        np.asarray(po["rigids"])

        def best(fn):
            ts = []
            for i in range(args.reps):
                t0 = time.time()
                out = fn(jax.random.fold_in(key, i))
                np.asarray(
                    out["rigids"] if isinstance(out, dict) else out
                )  # host fetch = real sync through the axon tunnel
                ts.append(time.time() - t0)
            return min(ts)

        seq_s = best(lambda k2: seq(params, k2))
        pic_s = best(lambda k2: pic(params, k2))
        n_sweeps = int(po["n_sweeps"])
        # trajectory agreement at the fixed point (exactness regression)
        err = float(
            np.max(np.abs(np.asarray(po["rigids"]) - r))
        ) if n_sweeps >= T - 1 else None
        row = {
            "num_t": T,
            "seq_ms": round(seq_s * 1e3, 1),
            "picard_ms": round(pic_s * 1e3, 1),
            "speedup": round(seq_s / pic_s, 3),
            "n_sweeps": n_sweeps,
            "sweeps_over_T": round(n_sweeps / max(T - 1, 1), 3),
            "fixed_point_err": err,
        }
        rows.append(row)
        print(row, file=sys.stderr)

    print(json.dumps({"device": str(dev), "tol": args.tol, "rows": rows}))


if __name__ == "__main__":
    main()
