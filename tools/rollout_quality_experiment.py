"""North-star rollout QUALITY: is a 1000-frame extension physically sane?

Round-4 verdict: the 1000-frame rollout was measured for speed only (331
fps); nothing committed showed what those frames LOOK like. This experiment
closes that: train on realistic mean-reverting torsion-OU dynamics
(data/realistic.py — the in-env stand-in for MD), roll the production
frozen-conditioning sampler out to the full 1000-frame horizon, and score
every frame two ways:

  * accuracy vs the held-out GT trajectory: plain + Kabsch-aligned Ca RMSD
    per horizon bucket (32/128/512/1000), against the RefAsPred floor
    (last observed frame repeated — the reference's own baseline,
    train_DFOLD_dynamics.py:1558-1559) and the oracle ceiling (GT
    force/vel/torsion conditioning at every step, rigid window still
    autoregressive); a deterministic serving row (fast_x0 + noise_scale=0)
    separates reverse-SDE noise accumulation from model-error feedback;
  * physical sanity of the predictions THEMSELVES, no GT needed: exact AF2
    violation metrics (analysis/violations.py, golden-tested vs the
    reference torch stack), Ca-Ca bond deviation, steric clashes, radius
    of gyration, and DSSP secondary-structure fractions per bucket,
    side-by-side with the same metrics on GT frames of the same bucket.

Eval split follows the round-4 advisor fix: the rollout's frame 0
re-predicts a frame whose GT features sit in the initial window, so
horizon+1 frames are rolled and frame 0 is dropped — every scored frame is
strictly beyond the observed data (mirrors eval_extension's horizon
semantics, train:931-1000).

Artifact: docs/artifacts/rollout_quality_1000.json (summarized in
docs/DESIGN.md; bench.py reports the headline drift figure as an extra).

Usage: python tools/rollout_quality_experiment.py [--horizon 1000]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bucket_slices(horizon: int, buckets: list[int]):
    """(label, slice) per bucket: frames (prev_bucket, bucket]."""
    out, prev = [], 0
    for b in buckets:
        if b > horizon:
            break
        out.append((str(b), slice(prev, b)))
        prev = b
    return out


def structure_stats(atom37_frames, mask37, aatype, residue_index) -> dict:
    """Physical-sanity aggregate over a set of frames (mean of per-frame
    protein_metrics; violations are the exact AF2 formulation)."""
    from dynamicpdb_tpu.analysis.structure_checks import protein_metrics

    keys = None
    acc: dict[str, list] = {}
    for f in atom37_frames:
        m = protein_metrics(np.asarray(f), mask37, aatype=aatype,
                            residue_index=residue_index)
        m = {k: v for k, v in m.items() if np.isscalar(v) or np.ndim(v) == 0}
        keys = keys or list(m)
        for k in keys:
            acc.setdefault(k, []).append(float(m[k]))
    return {k: round(float(np.mean(v)), 5) for k, v in acc.items()}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-res", type=int, default=32)
    ap.add_argument("--t-train", type=int, default=64)
    ap.add_argument("--horizon", type=int, default=1000)
    ap.add_argument("--buckets", default="32,128,512,1000")
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--dyn-backbone-deg", type=float, default=0.3)
    ap.add_argument("--frames-per-bucket-stats", type=int, default=6,
                    help="frames sampled per bucket for the (expensive) "
                         "violation/DSSP stats")
    ap.add_argument("--cond-noise-trans", type=float, default=0.0,
                    help="train with the exposure-bias robustifier: std (A) "
                         "of SE(3) translation error on conditioning frames")
    ap.add_argument("--cond-noise-rot-deg", type=float, default=0.0)
    ap.add_argument("--ema-decay", type=float, default=0.0,
                    help="train with parameter EMA and add a model_ema "
                         "rollout row (same training run — EMA is a pure "
                         "observer, so live-vs-EMA is perfectly controlled); "
                         "size the decay to the step budget (0.99 ~ a "
                         "100-step window)")
    ap.add_argument("--unroll-steps", type=int, default=1,
                    help="train with the K-step rollout-consistent "
                         "(scheduled-sampling) loss; windows grow by K-1 "
                         "frames")
    ap.add_argument("--out", default="docs/artifacts/rollout_quality_1000.json")
    args = ap.parse_args(argv)
    buckets = [int(b) for b in args.buckets.split(",")]

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
    from dynamicpdb_tpu.sampling.reverse import reverse_sample, rollout
    from dynamicpdb_tpu.train.experiment import Trainer

    T = args.t_train + 2 + args.horizon
    print(f"generating {T}-frame realistic trajectory "
          f"(n_res={args.n_res})...", file=sys.stderr)
    traj = make_realistic_window(
        n_res=args.n_res, frame_time=T, seed=args.seed,
        dyn_backbone_deg=args.dyn_backbone_deg,
    )
    shared = {
        k: traj[k]
        for k in ("atom37_mask", "aatype", "residue_index",
                  "node_repr", "edge_repr")
    }

    def window_at(f, length=2):
        return dict(
            shared,
            atom37=traj["atom37"][f : f + length],
            force=traj["force"][f : f + length],
            vel=traj["vel"][f : f + length],
        )

    # same training setup as tools/rollout_refresh_experiment.py
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
    if (args.cond_noise_trans > 0 or args.cond_noise_rot_deg > 0
            or args.unroll_steps > 1 or args.ema_decay > 0):
        import dataclasses

        cfg = dataclasses.replace(
            cfg,
            experiment=dataclasses.replace(
                cfg.experiment,
                cond_noise_trans=args.cond_noise_trans,
                cond_noise_rot_deg=args.cond_noise_rot_deg,
                unroll_steps=args.unroll_steps,
                ema_decay=args.ema_decay or None,
            ),
        )
    trainer = Trainer(cfg)
    key = jax.random.PRNGKey(args.seed)
    wlen = 2 + max(0, args.unroll_steps - 1)  # raw frames per train window
    w0 = window_at(0, wlen)
    params, opt_state = trainer.init_params(key, w0)
    step = jax.jit(trainer.train_step, donate_argnums=(0, 1))

    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    loss0 = loss = None
    for i in range(args.steps):
        starts = rng.integers(0, args.t_train - wlen + 1, size=args.batch)
        batch = {
            k: jnp.asarray(
                np.stack([window_at(int(s), wlen)[k] for s in starts])
            )
            for k in w0
        }
        key, sub = jax.random.split(key)
        params, opt_state, aux = step(params, opt_state, sub, batch)
        if i % 100 == 0 or i == args.steps - 1:
            loss = float(aux["total_loss"])
            loss0 = loss if loss0 is None else loss0
            print(f"step {i}: loss {loss:.4f}", file=sys.stderr)
    train_s = time.time() - t0

    # ---- rollouts ---------------------------------------------------------
    s = args.t_train - 1  # initial window [t_train-1, t_train]
    n_roll = args.horizon + 1  # frame 0 dropped (advisor split fix)
    feats = featurize_window(
        jax.tree_util.tree_map(jnp.asarray, window_at(s))
    )
    feats = eval_init_window(jax.random.PRNGKey(1), feats, trainer.diffuser)
    gt37 = traj["atom37"][s + 2 : s + 2 + args.horizon]  # [H, N, 37, 3]
    gt_ca = gt37[:, :, 1]
    mask37 = np.asarray(traj["atom37_mask"], np.float32)
    aatype = np.asarray(traj["aatype"])
    residue_index = np.asarray(traj["residue_index"])

    print(f"frozen-conditioning {n_roll}-frame rollout...", file=sys.stderr)
    t0 = time.time()
    atom_traj, _ = jax.jit(
        lambda p, k: rollout(
            k, trainer.model, p, trainer.diffuser, feats,
            n_steps=n_roll, num_t=10, noise_scale=0.1,
        )
    )(params, jax.random.PRNGKey(2))
    pred37 = np.asarray(atom_traj[1:])  # [H, N, 37, 3]
    roll_s = time.time() - t0

    # deterministic serving mode: fast_x0 (1 forward/frame) + zero noise —
    # isolates model-error feedback from reverse-SDE noise accumulation
    print("deterministic (noise_scale=0, fast_x0) rollout...",
          file=sys.stderr)
    atom_traj_det, _ = jax.jit(
        lambda p, k: rollout(
            k, trainer.model, p, trainer.diffuser, feats,
            n_steps=n_roll, num_t=10, noise_scale=0.0, fast_x0=True,
        )
    )(params, jax.random.PRNGKey(2))
    det37 = np.asarray(atom_traj_det[1:])

    ema37 = None
    if args.ema_decay > 0:
        from dynamicpdb_tpu.train.optim import ema_params

        print("EMA-weights rollout (same training run)...", file=sys.stderr)
        atom_traj_ema, _ = jax.jit(
            lambda p, k: rollout(
                k, trainer.model, p, trainer.diffuser, feats,
                n_steps=n_roll, num_t=10, noise_scale=0.1,
            )
        )(ema_params(opt_state), jax.random.PRNGKey(2))
        ema37 = np.asarray(atom_traj_ema[1:])

    # RefAsPred floor: the last OBSERVED frame as the prediction forever
    ref37 = np.broadcast_to(
        traj["atom37"][args.t_train][None], pred37.shape
    )

    # oracle ceiling: GT conditioning channels at every step, rigid window
    # still autoregressive (isolates conditioning quality from feedback)
    print("oracle GT-conditioning rollout...", file=sys.stderr)
    t0 = time.time()
    sampler = jax.jit(
        lambda p, k, f: reverse_sample(
            k, trainer.model, p, trainer.diffuser, f,
            num_t=10, noise_scale=0.1,
        )
    )
    rigids_0 = feats["rigids_0"]
    key_r = jax.random.PRNGKey(2)
    oracle_frames = []
    for h in range(n_roll):
        wgt = featurize_window(
            jax.tree_util.tree_map(jnp.asarray, window_at(s + h))
        )
        f = dict(wgt, rigids_0=rigids_0)
        key_r, k1, k2 = jax.random.split(key_r, 3)
        f = eval_init_window(k1, f, trainer.diffuser)
        out = sampler(params, k2, f)
        oracle_frames.append(np.asarray(out["atom37"][-1]))
        pred = out["rigids"]
        rigids_0 = jnp.concatenate([pred[1:], pred[-1:]], axis=0)
    oracle37 = np.stack(oracle_frames[1:])
    oracle_s = time.time() - t0

    # ---- accuracy vs GT per bucket ----------------------------------------
    def rmsd_series(p37):
        ca = p37[:, :, 1]
        plain = np.sqrt(((ca - gt_ca) ** 2).sum(-1).mean(-1))
        aligned = np.array([
            float(superimposed_rmsd(ca[h], gt_ca[h]))
            for h in range(len(ca))
        ])
        return plain, aligned

    series = {
        "model": rmsd_series(pred37),
        "model_det": rmsd_series(det37),
        "refaspred": rmsd_series(ref37),
        "oracle": rmsd_series(oracle37),
    }
    if ema37 is not None:
        series["model_ema"] = rmsd_series(ema37)
    slices = bucket_slices(args.horizon, buckets)
    accuracy = {}
    for name, (plain, aligned) in series.items():
        accuracy[name] = {
            label: {
                "ca_rmsd_median": round(float(np.median(plain[sl])), 4),
                "ca_rmsd_aligned_median": round(
                    float(np.median(aligned[sl])), 4),
            }
            for label, sl in slices
        }
        accuracy[name]["final_frame"] = {
            "ca_rmsd": round(float(plain[-1]), 4),
            "ca_rmsd_aligned": round(float(aligned[-1]), 4),
        }

    # ---- physical sanity per bucket (pred vs GT frames, no cross-ref) ----
    print("per-bucket structure stats (violations/DSSP/Rg)...",
          file=sys.stderr)
    k = args.frames_per_bucket_stats
    sanity = {}
    for label, sl in slices:
        pick = np.linspace(sl.start, sl.stop - 1, k).astype(int)
        sanity[label] = {
            "pred": structure_stats(pred37[pick], mask37, aatype,
                                    residue_index),
            "pred_det": structure_stats(det37[pick], mask37, aatype,
                                        residue_index),
            "gt": structure_stats(gt37[pick], mask37, aatype,
                                  residue_index),
        }

    # headline drift: aligned-RMSD medians across buckets + sanity flags
    model_drift = [
        accuracy["model"][label]["ca_rmsd_aligned_median"]
        for label, _ in slices
    ]
    last = slices[-1][0]
    payload = {
        "config": {
            "n_res": args.n_res, "t_train": args.t_train,
            "horizon": args.horizon, "buckets": buckets,
            "steps": args.steps, "batch": args.batch, "seed": args.seed,
            "dyn_backbone_deg": args.dyn_backbone_deg,
            "cond_noise_trans": args.cond_noise_trans,
            "cond_noise_rot_deg": args.cond_noise_rot_deg,
            "unroll_steps": args.unroll_steps,
            "ema_decay": args.ema_decay,
            "noise_scale": 0.1, "num_t": 10,
            "frames_per_bucket_stats": k,
            "device": str(jax.devices()[0]),
        },
        "train": {"loss_first": loss0, "loss_last": loss,
                  "seconds": round(train_s, 1)},
        "timing": {"rollout_s": round(roll_s, 1),
                   "oracle_s": round(oracle_s, 1)},
        "accuracy_vs_gt": accuracy,
        "physical_sanity": sanity,
        "headline": {
            "aligned_rmsd_by_bucket": dict(
                zip([label for label, _ in slices], model_drift)
            ),
            "aligned_rmsd_by_bucket_det": {
                label: accuracy["model_det"][label][
                    "ca_rmsd_aligned_median"]
                for label, _ in slices
            },
            "aligned_rmsd_final_bucket": model_drift[-1],
            "violations_per_residue_final_bucket_pred":
                sanity[last]["pred"].get("violations_per_residue") if
                sanity else None,
            "rg_final_bucket_pred": sanity[last]["pred"].get(
                "radius_of_gyration"),
            "rg_final_bucket_pred_det": sanity[last]["pred_det"].get(
                "radius_of_gyration"),
            "rg_final_bucket_gt": sanity[last]["gt"].get(
                "radius_of_gyration"),
        },
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload["headline"]))
    for name in ("model", "model_det", "refaspred", "oracle"):
        print(name, {label: accuracy[name][label]["ca_rmsd_aligned_median"]
                     for label, _ in slices}, file=sys.stderr)


if __name__ == "__main__":
    main()
