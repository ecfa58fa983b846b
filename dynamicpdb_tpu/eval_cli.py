"""Evaluation CLI.

    python -m dynamicpdb_tpu.eval_cli --ckpt step_1000.ckpt \
        data.test_csv_path=test.csv experiment.noise_scale=0.1

Replaces /root/reference/eval_DFOLD_dynamics.py: loads the checkpoint
(merging its saved model config over the live config, as the reference
Evaluator does at eval:121), builds the test dataset, reverse-samples every
protein and prints ave_rot / ave_trans / ave_atom_mae / ave_atom_rmsd.
"""
from __future__ import annotations

import argparse
import json
import logging

import jax


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", required=True,
                        help="our msgpack checkpoint, or (with --ref-ckpt) a "
                        "reference torch checkpoint (.pth/.pkl)")
    parser.add_argument("--ref-ckpt", action="store_true",
                        help="treat --ckpt as a REFERENCE torch checkpoint "
                        "(train_DFOLD_dynamics format) and import its "
                        "weights via train/import_torch")
    parser.add_argument("--config", default=None)
    parser.add_argument("--save-dir", default=None)
    parser.add_argument("--metrics-json", default=None,
                        help="also write {rows, means} to this JSON path")
    parser.add_argument("--fast-x0", action="store_true",
                        help="1 forward per rollout frame instead of num_t "
                        "(exact for this x0-predictor architecture; "
                        "trajectories identical, ~num_t x faster serving)")
    parser.add_argument("--extension", type=int, default=0,
                        help="if >0, run an N-step autoregressive rollout "
                        "per protein instead of single-window eval")
    parser.add_argument("--refresh-conditioning", action="store_true",
                        help="extension only: re-derive velocities from "
                        "predicted frames and slide the torsion window "
                        "with predicted angles instead of freezing the "
                        "initial window's channels (sampling/reverse."
                        "refresh_window_conditioning)")
    parser.add_argument("--dt-ps", type=float, default=1.0,
                        help="frame spacing (ps) for the velocity "
                        "re-derivation (release data: 1 ps x stride)")
    parser.add_argument("--ema", action="store_true",
                        help="evaluate with the EMA weights stored in the "
                        "checkpoint's optimizer state (train with "
                        "experiment.ema_decay=<d> and pass the same "
                        "override here so the state template matches)")
    parser.add_argument("--save-dcd", action="store_true",
                        help="extension only: also write the rollout as "
                        "{name}_extension.dcd plus a matching "
                        "{name}_topology.pdb so VMD/PyMOL/mdtraj open it "
                        "directly (preprocess/dcd.py)")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    log = logging.getLogger("eval")

    from dynamicpdb_tpu.utils.platform import honor_cpu_request

    honor_cpu_request()

    from dynamicpdb_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import numpy as np

    from dynamicpdb_tpu import config as config_lib
    from dynamicpdb_tpu.data.dataset import TrajectoryDataset, eval_windows
    from dynamicpdb_tpu.sampling.evaluate import evaluate
    from dynamicpdb_tpu.train import checkpoint as ckpt_lib
    from dynamicpdb_tpu.train.experiment import Trainer

    cfg = (
        config_lib.load_yaml(args.config, args.overrides)
        if args.config
        else config_lib.apply_overrides(config_lib.Config(), args.overrides)
    )

    if args.ref_ckpt:
        from dynamicpdb_tpu.train.import_torch import import_reference_checkpoint

        dataset = TrajectoryDataset(
            cfg.data, split="test", pad_to=cfg.data.filtering.max_len
        )
        trainer = Trainer(cfg)
        params, extras = import_reference_checkpoint(args.ckpt, cfg.model)
        log.info("imported reference checkpoint %s (step %s)",
                 args.ckpt, extras.get("step"))
        key = jax.random.PRNGKey(cfg.experiment.seed)
        _run_eval(args, cfg, trainer, params, dataset, key, log)
        return

    # restore checkpoint; merge its saved model config (eval:113-136)
    with open(args.ckpt, "rb") as f:
        from flax import serialization

        payload = serialization.msgpack_restore(f.read())
    if payload.get("config"):
        saved = json.loads(payload["config"])

        def flatten(prefix, tree, out):
            for k, v in tree.items():
                if isinstance(v, dict):
                    flatten(f"{prefix}{k}.", v, out)
                elif v is not None:
                    out.append(f"{prefix}{k}={v}")
            return out

        cfg = config_lib.apply_overrides(
            cfg, flatten("model.", saved.get("model", {}), [])
        )

    dataset = TrajectoryDataset(
        cfg.data, split="test", pad_to=cfg.data.filtering.max_len
    )
    trainer = Trainer(cfg)
    sample = dataset.get_window(0, np.random.default_rng(0))
    sample.pop("name", None)
    key = jax.random.PRNGKey(cfg.experiment.seed)
    params, opt_template = trainer.init_params(key, sample)
    state = ckpt_lib.restore(
        args.ckpt, params, opt_template if args.ema else None
    )
    params = state["params"]
    if args.ema:
        from dynamicpdb_tpu.train.optim import ema_params

        if state["opt_state"] is None:
            raise SystemExit(
                "--ema: checkpoint has no optimizer state to read the EMA "
                "weights from"
            )
        params = ema_params(state["opt_state"])
        log.info("evaluating with EMA weights")
    log.info("loaded %s (step %d)", args.ckpt, state["step"])

    _run_eval(args, cfg, trainer, params, dataset, key, log)


def _run_eval(args, cfg, trainer, params, dataset, key, log):
    import numpy as np

    import jax

    from dynamicpdb_tpu.data.dataset import eval_windows
    from dynamicpdb_tpu.sampling.evaluate import evaluate

    if args.extension:
        import jax.numpy as jnp

        from dynamicpdb_tpu.data.featurize import featurize_window
        from dynamicpdb_tpu.sampling.reverse import rollout

        for raw in eval_windows(dataset):
            name = raw.pop("name")
            feats = featurize_window(jax.tree_util.tree_map(jnp.asarray, raw))
            atom_traj, rigid_traj = jax.jit(
                lambda p, k, f: rollout(
                    k, trainer.model, p, trainer.diffuser, f,
                    n_steps=args.extension, num_t=cfg.data.num_t,
                    noise_scale=cfg.experiment.noise_scale,
                    fast_x0=args.fast_x0,
                    refresh_conditioning=args.refresh_conditioning,
                    dt_ps=args.dt_ps,
                )
            )(params, key, feats)
            out = f"{args.save_dir or '.'}/{name}_extension.npz"
            np.savez_compressed(
                out,
                atom_traj=np.asarray(atom_traj),
                rigid_traj=np.asarray(rigid_traj),
                aatype=raw["aatype"],
            )
            log.info("extension saved: %s", out)
            if args.save_dcd:
                from dynamicpdb_tpu.analysis.pdb_io import write_pdb
                from dynamicpdb_tpu.chem import constants as chem
                from dynamicpdb_tpu.preprocess.dcd import write_dcd

                at = np.asarray(atom_traj)
                mask = np.asarray(chem.restype_atom37_mask)[
                    np.asarray(raw["aatype"])
                ]
                base = f"{args.save_dir or '.'}/{name}"
                # same residue-major atom37 ordering as write_pdb's ATOM
                # records, so the DCD columns match the topology file
                write_pdb(f"{base}_topology.pdb", at[0],
                          np.asarray(raw["aatype"]), mask)
                write_dcd(f"{base}_extension.dcd", at[:, mask > 0.5],
                          timestep_ps=args.dt_ps)
                log.info("dcd saved: %s_extension.dcd", base)
        return

    cfg_gamma = (
        cfg.model.cfg_gamma if cfg.model.cfg_drop_rate > 0.01 else None
    )
    rows, means = evaluate(
        trainer.model, params, trainer.diffuser, eval_windows(dataset),
        key=key,
        num_t=cfg.data.num_t,
        min_t=cfg.data.min_t,
        noise_scale=cfg.experiment.noise_scale,
        cfg_gamma=cfg_gamma,
        save_dir=args.save_dir,
    )
    print("ave_rot:", means["ave_rot"])
    print("ave_trans:", means["ave_trans"])
    print("ave_atom_mae:", means["all_atom_mae"])
    print("ave_atom_rmsd:", means["all_atom_rmsd"])
    if args.metrics_json:
        import json as _json

        with open(args.metrics_json, "w") as f:
            _json.dump(
                {"rows": rows, "means": {k: float(v) for k, v in means.items()}},
                f, indent=1, default=float,
            )


if __name__ == "__main__":
    main()
