"""Measure conditioning-refresh in long autoregressive rollouts.

The reference's eval_extension (train_DFOLD_dynamics.py:931-1000) slides only
the rigid window; the force/velocity/torsion conditioning stays frozen at the
initial window and goes stale over the horizon. sampling/reverse.rollout
(refresh_conditioning=True) re-derives velocities from the predicted rigid
translations (backward difference over dt_ps) and slides the torsion window
with the model's predicted angles.

This experiment quantifies the effect end-to-end on realistic mean-reverting
torsion-OU dynamics (data/realistic.py — the in-env stand-in for MD):

  1. build ONE long trajectory; train on sliding F=2 windows from its first
     T_train frames (velocities are the generator's backward differences, so
     the refresh rule matches the training-data convention exactly);
  2. roll out H frames from the last training window, frozen vs refreshed;
  3. per-frame Ca RMSD (plain + Kabsch-aligned) vs the held-out GT frames.

Writes docs/artifacts/rollout_refresh.json. Conclusion (keep / negative) is
recorded in docs/DESIGN.md.

Usage: python tools/rollout_refresh_experiment.py [--steps 800] [--horizon 32]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-res", type=int, default=32)
    ap.add_argument("--t-train", type=int, default=64)
    ap.add_argument("--horizon", type=int, default=32)
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--dyn-backbone-deg", type=float, default=0.3)
    ap.add_argument("--out", default="docs/artifacts/rollout_refresh.json")
    args = ap.parse_args(argv)

    from dynamicpdb_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from dynamicpdb_tpu.analysis.metrics import superimposed_rmsd
    from dynamicpdb_tpu.config import Config, IPAConfig, ModelConfig
    from dynamicpdb_tpu.data.featurize import eval_init_window, featurize_window
    from dynamicpdb_tpu.data.realistic import make_realistic_window
    from dynamicpdb_tpu.diffusion.r3_diffuser import R3Config
    from dynamicpdb_tpu.diffusion.se3_diffuser import SE3Config
    from dynamicpdb_tpu.diffusion.so3_diffuser import SO3Config
    from dynamicpdb_tpu.sampling.reverse import rollout
    from dynamicpdb_tpu.train.experiment import Trainer

    T = args.t_train + 1 + args.horizon
    traj = make_realistic_window(
        n_res=args.n_res, frame_time=T, seed=args.seed,
        dyn_backbone_deg=args.dyn_backbone_deg,
    )
    shared = {
        k: traj[k]
        for k in ("atom37_mask", "aatype", "residue_index",
                  "node_repr", "edge_repr")
    }

    def window_at(f):
        return dict(
            shared,
            atom37=traj["atom37"][f : f + 2],
            force=traj["force"][f : f + 2],
            vel=traj["vel"][f : f + 2],
        )

    cfg = Config(
        model=ModelConfig(
            node_embed_size=128, edge_embed_size=64,
            ipa=IPAConfig(c_s=128, c_z=64, c_hidden=64, no_heads=4,
                          no_qk_points=4, no_v_points=8, num_blocks=2),
        ),
        diffuser=SE3Config(
            so3=SO3Config(cache_dir=".cache/igso3"),
            r3=R3Config(coordinate_scaling=1.0),
        ),
    )
    trainer = Trainer(cfg)
    key = jax.random.PRNGKey(args.seed)
    w0 = window_at(0)
    params, opt_state = trainer.init_params(key, w0)
    step = jax.jit(trainer.train_step, donate_argnums=(0, 1))

    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    loss0 = loss = None
    for i in range(args.steps):
        starts = rng.integers(0, args.t_train - 1, size=args.batch)
        batch = {
            k: jnp.asarray(np.stack([window_at(int(s))[k] for s in starts]))
            for k in w0
        }
        key, sub = jax.random.split(key)
        params, opt_state, aux = step(params, opt_state, sub, batch)
        if i % 100 == 0 or i == args.steps - 1:
            loss = float(aux["total_loss"])
            loss0 = loss if loss0 is None else loss0
            print(f"step {i}: loss {loss:.4f}", file=sys.stderr)
    train_s = time.time() - t0

    # rollout from the last training window [t_train-1, t_train]; rolled
    # frame k re-predicts GT frame t_train + k. Frame k=0's GT features
    # (rigids, velocity, torsions) are INSIDE the initial window, so it is
    # near-teacher-forced — roll horizon+1 frames and score only k >= 1
    # (frames t_train+1 onward), so no evaluated frame's GT features appear
    # anywhere in the input (round-4 advisor finding).
    s = args.t_train - 1
    n_roll = args.horizon + 1
    feats = featurize_window(
        jax.tree_util.tree_map(jnp.asarray, window_at(s))
    )
    feats = eval_init_window(jax.random.PRNGKey(1), feats, trainer.diffuser)
    gt_ca = traj["atom37"][s + 2 : s + 2 + args.horizon, :, 1]  # [H, N, 3]

    def gt_conditioning_rollout():
        """Oracle control: rigids slide autoregressively, but the
        force/vel/torsion channels come from the TRUE window at each step
        (incl. the target frame's true velocity — the channel the training
        windows expose, Dfold_data_loader_dynamic.py:192-198). Isolates
        conditioning-channel quality from rigid-feedback error."""
        from dynamicpdb_tpu.sampling.reverse import reverse_sample

        sampler = jax.jit(
            lambda p, k, f: reverse_sample(
                k, trainer.model, p, trainer.diffuser, f,
                num_t=10, noise_scale=0.1,
            )
        )
        rigids_0 = feats["rigids_0"]
        key_r = jax.random.PRNGKey(2)
        out_frames = []
        for h in range(n_roll):
            wgt = featurize_window(
                jax.tree_util.tree_map(jnp.asarray, window_at(s + h))
            )
            f = dict(wgt, rigids_0=rigids_0)
            key_r, k1, k2 = jax.random.split(key_r, 3)
            f = eval_init_window(k1, f, trainer.diffuser)
            out = sampler(params, k2, f)
            pred = out["rigids"]
            out_frames.append(np.asarray(out["atom37"][-1]))
            rigids_0 = jnp.concatenate([pred[1:], pred[-1:]], axis=0)
        return np.stack(out_frames)

    results = {}
    for mode, refresh in (
        ("frozen", False), ("refresh", True), ("gt_conditioning", None)
    ):
        if mode == "gt_conditioning":
            atom_traj = gt_conditioning_rollout()
        else:
            atom_traj, _ = jax.jit(
                lambda p, k, r=refresh: rollout(
                    k, trainer.model, p, trainer.diffuser, feats,
                    n_steps=n_roll, num_t=10, noise_scale=0.1,
                    refresh_conditioning=r, dt_ps=1.0,
                )
            )(params, jax.random.PRNGKey(2))
        # drop rolled frame 0 (near-teacher-forced; see comment above)
        pred_ca = np.asarray(atom_traj[1:, :, 1])  # [H, N, 3]
        plain = np.sqrt(
            ((pred_ca - gt_ca) ** 2).sum(-1).mean(-1)
        )  # [H]
        aligned = np.array([
            float(superimposed_rmsd(pred_ca[h], gt_ca[h]))
            for h in range(args.horizon)
        ])
        results[mode] = {
            "ca_rmsd_per_frame": [round(float(x), 5) for x in plain],
            "ca_rmsd_aligned_per_frame": [round(float(x), 5) for x in aligned],
            "ca_rmsd_median": round(float(np.median(plain)), 5),
            "ca_rmsd_final": round(float(plain[-1]), 5),
            "ca_rmsd_aligned_median": round(float(np.median(aligned)), 5),
        }
        print(f"{mode}: median Ca RMSD {results[mode]['ca_rmsd_median']} "
              f"(aligned {results[mode]['ca_rmsd_aligned_median']}), "
              f"final {results[mode]['ca_rmsd_final']}", file=sys.stderr)

    payload = {
        "config": {
            "n_res": args.n_res, "t_train": args.t_train,
            "horizon": args.horizon, "steps": args.steps,
            "batch": args.batch, "seed": args.seed,
            "dyn_backbone_deg": args.dyn_backbone_deg,
            "device": str(jax.devices()[0]),
        },
        "train": {"loss_first": loss0, "loss_last": loss,
                  "seconds": round(train_s, 1)},
        "results": results,
        "delta_median": round(
            results["frozen"]["ca_rmsd_median"]
            - results["refresh"]["ca_rmsd_median"], 5
        ),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({k: v for k, v in payload.items() if k != "results"}))


if __name__ == "__main__":
    main()
