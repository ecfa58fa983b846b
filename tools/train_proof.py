"""End-to-end training proof on dynamicPDB-release-LAYOUT data.

Produces the committed artifact docs/artifacts/train_proof.json (+ .png):
loss curves for a single-protein training run through the exact on-disk
contract of the dynamicPDB release (multi-file layout: {pid}_new_w_pp.npz,
{pid}_F_Ca.pkl / {pid}_V_ca.pkl, {pid}.npz embeddings, CSV manifest —
/root/reference/README.md:184-211), followed by the eval metrics of record.

With --release-dir pointing at an actual dynamicPDB download (containing
{pid}_T.pkl/_F.pkl/_V.pkl + {pid}.pdb), the same script trains on the real
release files. Offline (no network), it synthesizes an MD-like trajectory
with data/synthetic and writes it through the SAME release layout + loaders,
so every byte of the data path is exercised.

    python tools/train_proof.py [--pid 1a62_A] [--release-dir DIR]
        [--n-res 48] [--steps 300]

--n-proteins K > 1 produces the MULTI-protein variant (BASELINE.json
config 2, "10-protein dynamicPDB subset"): K synthetic proteins with
DIFFERENT lengths (n_res/2 .. n_res) and different conformations/
sequences, one shared manifest, batches via EpochSampler, per-protein
eval rows in the artifact. NOTE: EpochSampler groups each batch from a
SINGLE protein (batch_size repeats of one index, mirroring the
reference's DistributedTrainSampler repetition), so length/padding
variety occurs ACROSS batches, not within one — pad_to masking inside a
heterogeneous batch is covered separately by tests/test_pad_invariance:

    python tools/train_proof.py --n-proteins 10 --steps 800 --batch 4 \
        --out docs/artifacts/train_proof_multi
"""
from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_release_files(workdir: str, pid: str, n_res: int, n_frames: int,
                       rot_wiggle: float = 0.0, seed: int = 1):
    """Synthesize an MD-like trajectory and write the reference release
    multi-file layout."""
    from dynamicpdb_tpu.data.synthetic import make_window

    w = make_window(n_res=n_res, frame_time=n_frames, seed=seed,
                    rot_wiggle=rot_wiggle)
    os.makedirs(workdir, exist_ok=True)
    npz = os.path.join(workdir, f"{pid}_new_w_pp.npz")
    np.savez_compressed(
        npz,
        all_atom_positions=w["atom37"],
        all_atom_mask=w["atom37_mask"],
        aatype=np.eye(21, dtype=np.float32)[w["aatype"]],
        residue_index=w["residue_index"],
    )
    # CA force/vel pkls with the reference's _Ca/_ca casing quirk
    with open(os.path.join(workdir, f"{pid}_F_Ca.pkl"), "wb") as f:
        pickle.dump(w["force"], f)
    with open(os.path.join(workdir, f"{pid}_V_ca.pkl"), "wb") as f:
        pickle.dump(w["vel"], f)
    embed = os.path.join(workdir, f"{pid}.npz")
    np.savez_compressed(
        embed, node_repr=w["node_repr"], edge_repr=w["edge_repr"]
    )
    return {
        "atlas_npz": npz,
        "force_path": os.path.join(workdir, f"{pid}_F.pkl"),
        "vel_path": os.path.join(workdir, f"{pid}_V.pkl"),
        "embed_path": embed,
        "seq_len": n_res,
    }


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--pid", default="1a62_A")
    parser.add_argument("--release-dir", default=None,
                        help="real dynamicPDB release dir with "
                        "{pid}_T/_F/_V.pkl + {pid}.pdb")
    parser.add_argument("--workdir", default="/tmp/dynamicpdb_train_proof")
    parser.add_argument("--out", default="docs/artifacts/train_proof")
    parser.add_argument("--n-res", type=int, default=48)
    parser.add_argument("--n-frames", type=int, default=32)
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--batch", type=int, default=2)
    parser.add_argument("--rollout", type=int, default=0,
                        help=">0: after eval, run an N-frame autoregressive "
                             "rollout with the freshly trained model and "
                             "write <out>_rollout.html (interactive 3D CA "
                             "trajectory) — the full train->eval->serve "
                             "demo in one offline command")
    parser.add_argument("--n-proteins", type=int, default=1,
                        help=">1: multi-protein training proof (BASELINE "
                             "config 2) — K synthetic proteins of varying "
                             "length n_res/2..n_res (one protein per batch, "
                             "varying across batches), per-protein eval rows")
    parser.add_argument("--rot-wiggle", type=float, default=0.05,
                        help="per-residue rotational MD wiggle (radians); "
                        ">0 makes the rotation channel non-degenerate "
                        "(RefAsPred rot error would otherwise be exactly 0)")
    parser.add_argument("--set", action="append", default=[],
                        dest="overrides", metavar="key=value",
                        help="extra config overrides, e.g. "
                             "--set experiment.opt_state_dtype=bfloat16")
    args = parser.parse_args(argv)

    import logging

    logging.basicConfig(level=logging.INFO)

    import jax

    from dynamicpdb_tpu.utils.platform import honor_cpu_request

    honor_cpu_request()

    from dynamicpdb_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import csv

    from dynamicpdb_tpu.config import (
        Config, DataConfig, IPAConfig, ModelConfig,
    )
    from dynamicpdb_tpu.data.dataset import (
        EpochSampler, TrajectoryDataset, batch_iterator,
    )
    from dynamicpdb_tpu.diffusion.se3_diffuser import SE3Config
    from dynamicpdb_tpu.diffusion.so3_diffuser import SO3Config
    from dynamicpdb_tpu.sampling.evaluate import evaluate
    from dynamicpdb_tpu.train.experiment import Experiment

    # --- data in release layout -------------------------------------------
    if args.release_dir:
        from dynamicpdb_tpu.preprocess.pack import pack_from_dynamicpdb_release

        bundle = os.path.join(args.workdir, f"{args.pid}.npz")
        os.makedirs(args.workdir, exist_ok=True)
        pack_from_dynamicpdb_release(bundle, args.release_dir, args.pid)
        row = {"atlas_npz": bundle, "seq_len": 0}
        rows_by_pid = {args.pid: row}
        data_source = f"real release dir {args.release_dir}"
    elif args.n_proteins > 1:
        # BASELINE config 2: a K-protein subset with DIFFERENT lengths
        # (deterministic spread n_res/2 .. n_res); batches rotate across
        # proteins epoch-to-epoch (EpochSampler groups one protein per
        # batch, like the reference sampler's batch_size repetition)
        rows_by_pid = {}
        for i in range(args.n_proteins):
            pid = f"synth{i:02d}_A"
            n_i = args.n_res // 2 + (
                (args.n_res - args.n_res // 2) * i
            ) // max(args.n_proteins - 1, 1)
            rows_by_pid[pid] = make_release_files(
                args.workdir, pid, n_i, args.n_frames,
                rot_wiggle=args.rot_wiggle, seed=100 + i,
            )
        data_source = (
            f"synthetic MD, {args.n_proteins} proteins of length "
            f"{args.n_res // 2}..{args.n_res}, release layout (offline run)"
        )
    else:
        row = make_release_files(
            args.workdir, args.pid, args.n_res, args.n_frames,
            rot_wiggle=args.rot_wiggle,
        )
        rows_by_pid = {args.pid: row}
        data_source = "synthetic MD in release layout (offline run)"

    manifest = os.path.join(args.workdir, "manifest.csv")
    fieldnames = ["name"] + list(next(iter(rows_by_pid.values())))
    with open(manifest, "w", newline="") as f:
        wtr = csv.DictWriter(f, fieldnames=fieldnames)
        wtr.writeheader()
        for pid, row in rows_by_pid.items():
            wtr.writerow({"name": pid, **row})

    # --- config (BASELINE.json config-1 shape: F=2 window, small IPA) ------
    n_res = args.n_res
    cfg = Config(
        model=ModelConfig(
            node_embed_size=64, edge_embed_size=32,
            ipa=IPAConfig(c_s=64, c_z=32, c_hidden=32, no_heads=4,
                          no_qk_points=4, no_v_points=6, num_blocks=2),
        ),
        diffuser=SE3Config(so3=SO3Config(cache_dir=".cache/igso3")),
    )
    from dynamicpdb_tpu.config import apply_overrides

    cfg = apply_overrides(cfg, [
        f"data.csv_path={manifest}",
        "data.frame_time=2",
        f"data.filtering.max_len={max(n_res, 16)}",
        "experiment.log_freq=10",
    ] + args.overrides)

    dataset = TrajectoryDataset(cfg.data, split="train", pad_to=n_res)
    sampler = EpochSampler(
        n_items=len(dataset), batch_size=args.batch,
        seed=cfg.experiment.seed,
    )

    def data_iter(epoch):
        return batch_iterator(dataset, sampler, epoch)

    sample = dataset.get_window(0, np.random.default_rng(0))
    sample.pop("name", None)
    exp = Experiment(cfg, data_iter, sample)

    t0 = time.time()
    history = exp.train(num_epochs=10_000, max_steps=args.steps)
    train_s = time.time() - t0

    # --- eval (metrics of record) ------------------------------------------
    test_ds = TrajectoryDataset(cfg.data, split="test", pad_to=n_res)

    def windows():
        for i in range(len(test_ds)):
            yield test_ds.get_window(i, np.random.default_rng(1))

    rows, means = evaluate(
        exp.trainer.model, exp.params, exp.trainer.diffuser, windows(),
        key=jax.random.PRNGKey(7), num_t=cfg.data.num_t,
        min_t=cfg.data.min_t, noise_scale=0.1, decompose=True,
    )

    # --- artifact -----------------------------------------------------------
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    artifact = {
        "pid": ",".join(rows_by_pid) if args.n_proteins > 1 else args.pid,
        "data_source": data_source,
        "steps": args.steps,
        "train_seconds": round(train_s, 1),
        "loss_curve": history,
        "eval_means": means,
        # per-protein metric rows (interesting in the multi-protein proof:
        # shows every length in the padded batch learned, not just the mean)
        "eval_rows": rows if args.n_proteins > 1 else None,
        "atom_error_note": (
            "floor_* = GT rigids + GT torsions through the idealized-"
            "geometry decoder vs raw GT atoms (irreducible); model_* = "
            "the model's reconstruction; rigids_only_*/torsion_only_* "
            "swap one predicted channel in. model ~= floor means the "
            "rigid/torsion->atom path is exact and the residual is data "
            "representability, not a model defect."
        ),
        "device": str(jax.devices()[0]),
    }
    with open(args.out + ".json", "w") as f:
        json.dump(artifact, f, indent=1)
    print("wrote", args.out + ".json")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        steps = [h["step"] for h in history]
        fig, ax = plt.subplots(figsize=(7, 4))
        for k in ("total_loss", "trans_loss", "rot_loss", "torsion_loss"):
            ax.plot(steps, [h[k] for h in history], label=k)
        ax.set_yscale("log")
        ax.set_xlabel("step")
        ax.set_ylabel("loss")
        title = (
            f"{args.n_proteins}-protein training"
            if args.n_proteins > 1
            else f"{args.pid} single-protein training"
        )
        ax.set_title(f"{title} ({data_source})")
        ax.legend()
        fig.tight_layout()
        fig.savefig(args.out + ".png", dpi=120)
        print("wrote", args.out + ".png")
    except ImportError:
        pass

    if args.rollout:
        import jax.numpy as jnp

        from dynamicpdb_tpu.analysis.interactive import (
            trajectory_figure, write_html,
        )
        from dynamicpdb_tpu.data.featurize import featurize_window
        from dynamicpdb_tpu.sampling.reverse import rollout as rollout_fn

        raw = test_ds.get_window(0, np.random.default_rng(2))
        raw.pop("name", None)
        feats = featurize_window(jax.tree_util.tree_map(jnp.asarray, raw))
        atom_traj, _ = jax.jit(
            lambda p, k, f: rollout_fn(
                k, exp.trainer.model, p, exp.trainer.diffuser, f,
                n_steps=args.rollout, num_t=cfg.data.num_t, noise_scale=0.1,
            )
        )(exp.params, jax.random.PRNGKey(11), feats)
        keep = np.asarray(feats["res_mask"][0]) > 0  # drop pad rows
        ca = np.asarray(atom_traj)[:, keep, 1]  # atom37 index 1 = CA
        html = write_html(
            trajectory_figure(ca), args.out + "_rollout.html"
        )
        print("wrote", html)

    final = history[-1]["total_loss"] if history else float("nan")
    first = history[0]["total_loss"] if history else float("nan")
    print(f"loss {first:.3f} -> {final:.3f}; eval ave_rot={means['ave_rot']:.3f} "
          f"ave_trans={means['ave_trans']:.3f} rmsd={means['all_atom_rmsd']:.3f}")


if __name__ == "__main__":
    main()
