"""Classifier-free-guidance value experiment (VERDICT r1 item 10).

The reference's drop_ref is a documented no-op (SURVEY §4); our repaired
path makes CFG functional. This experiment measures whether cfg_gamma
actually moves the eval metrics: train one small model WITH conditioning
dropout (cfg_drop_rate=0.1), then evaluate the same checkpoint at
gamma in {None (off), 1.0, 1.5, 2.0} and record the metrics of record.

    python tools/cfg_experiment.py [--steps 300] [--n-res 32]

Writes docs/artifacts/cfg_experiment.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--n-res", type=int, default=32)
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--out", default="docs/artifacts/cfg_experiment")
    args = parser.parse_args(argv)

    import logging

    logging.basicConfig(level=logging.INFO)

    import jax

    from dynamicpdb_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from dynamicpdb_tpu.config import Config, IPAConfig, ModelConfig
    from dynamicpdb_tpu.data.synthetic import make_window
    from dynamicpdb_tpu.diffusion.se3_diffuser import SE3Config
    from dynamicpdb_tpu.diffusion.so3_diffuser import SO3Config
    from dynamicpdb_tpu.sampling.evaluate import evaluate
    from dynamicpdb_tpu.train.experiment import Experiment

    cfg = Config(
        model=ModelConfig(
            node_embed_size=64, edge_embed_size=32,
            cfg_drop_rate=0.1, cfg_gamma=2.0,
            ipa=IPAConfig(c_s=64, c_z=32, c_hidden=32, no_heads=4,
                          no_qk_points=4, no_v_points=6, num_blocks=2),
        ),
        diffuser=SE3Config(so3=SO3Config(cache_dir=".cache/igso3")),
    )

    windows = [make_window(n_res=args.n_res, frame_time=2, seed=s)
               for s in range(4)]

    def data_iter(epoch):
        rng = np.random.default_rng(epoch)
        order = rng.permutation(len(windows))
        for i in order:
            w = dict(windows[i])
            yield {k: np.stack([v, v]) for k, v in w.items()}

    sample = dict(windows[0])
    exp = Experiment(cfg, data_iter, sample)
    history = exp.train(num_epochs=10_000, max_steps=args.steps)

    results = {}
    for gamma in (None, 1.0, 1.5, 2.0):
        rows, means = evaluate(
            exp.trainer.model, exp.params, exp.trainer.diffuser,
            [dict(w, name=f"w{i}") for i, w in enumerate(windows)],
            key=jax.random.PRNGKey(11), num_t=10, min_t=0.01,
            noise_scale=0.1, cfg_gamma=gamma,
        )
        results[str(gamma)] = means
        print(f"gamma={gamma}: ave_trans={means['ave_trans']:.4f} "
              f"ave_rot={means['ave_rot']:.4f} "
              f"rmsd={means['all_atom_rmsd']:.4f}")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out + ".json", "w") as f:
        json.dump(
            {
                "steps": args.steps,
                "cfg_drop_rate": 0.1,
                "final_loss": history[-1]["total_loss"] if history else None,
                "eval_by_gamma": results,
            },
            f, indent=1,
        )
    print("wrote", args.out + ".json")


if __name__ == "__main__":
    main()
