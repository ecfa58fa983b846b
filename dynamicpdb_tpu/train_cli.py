"""Training CLI.

Usage (mirrors the reference's Hydra-override style, run_train.sh):

    python -m dynamicpdb_tpu.train_cli [--config cfg.yaml] \
        data.csv_path=train.csv data.frame_time=2 \
        experiment.trans_loss_weight=100.0 ...

Replaces /root/reference/train_DFOLD_dynamics.py's __main__ + DDP launch:
multi-chip runs need no torchrun-style launcher — JAX SPMD drives all local
devices from one process (multi-host: one process per host, same command).
"""
from __future__ import annotations

import argparse
import os
import logging

import jax
import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default=None, help="YAML config path")
    parser.add_argument("--pad-to", type=int, default=None,
                        help="pad residue axis to fixed size (static shapes)")
    parser.add_argument("--max-steps", type=int, default=None)
    parser.add_argument("--eval-every", type=int, default=0,
                        help="epochs between eval passes (0 = off)")
    parser.add_argument("--resume", action="store_true",
                        help="auto-resume from the newest checkpoint in "
                        "experiment.ckpt_dir (full optimizer state)")
    parser.add_argument("overrides", nargs="*", help="a.b=c config overrides")
    args = parser.parse_args(argv)

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s: %(message)s",
    )
    log = logging.getLogger("train")

    from dynamicpdb_tpu.utils.platform import honor_cpu_request

    honor_cpu_request()

    from dynamicpdb_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from dynamicpdb_tpu.config import Config, apply_overrides, load_yaml
    from dynamicpdb_tpu.data.dataset import (
        TrajectoryDataset,
        batch_iterator,
        make_sampler,
    )
    from dynamicpdb_tpu.parallel import mesh as mesh_lib
    from dynamicpdb_tpu.train.experiment import Experiment

    cfg = (
        load_yaml(args.config, args.overrides)
        if args.config
        else apply_overrides(Config(), args.overrides)
    )

    mesh_lib.maybe_initialize_distributed()
    pad_to = args.pad_to or cfg.data.filtering.max_len
    dataset = TrajectoryDataset(cfg.data, split="train", pad_to=pad_to)
    n_dev = jax.device_count()
    if cfg.experiment.mesh_shape:
        # explicit mesh from config: e.g. mesh_shape=(2,4),
        # mesh_axes=('data','seq') for residue-axis sequence parallelism
        # (parallel/sp.py) or ('data','model') for tensor parallelism
        mesh = mesh_lib.make_mesh(
            tuple(cfg.experiment.mesh_shape), tuple(cfg.experiment.mesh_axes)
        )
    elif n_dev > 1:
        n_slices = mesh_lib.detect_num_slices()
        mesh = (
            mesh_lib.make_hybrid_mesh()  # DCN-aware ('slice','data') mesh
            if n_slices > 1
            else mesh_lib.make_mesh()
        )
    else:
        mesh = None
    # batch_size is PER DEVICE (configs/release.yaml); the old
    # max(batch, n_dev) silently degraded B=8 on 8 devices to 1/device.
    # Only data-like axes replicate the step over the batch — 'model'/'seq'
    # shard within a window, so they don't multiply the global batch.
    if mesh is not None:
        n_batch_dev = int(
            np.prod([
                mesh.shape[a] for a in mesh.axis_names
                if a not in ("model", "seq")
            ])
        )
    else:
        n_batch_dev = 1
    global_batch = cfg.experiment.batch_size * max(n_batch_dev, 1)
    sampler = make_sampler(
        dataset, cfg.data,
        batch_size=global_batch,
        seed=cfg.experiment.seed,
        num_hosts=jax.process_count(),
        host_index=jax.process_index(),
    )
    log.info(
        "devices=%d hosts=%d global_batch=%d pad_to=%d",
        n_dev, jax.process_count(), global_batch, pad_to,
    )

    sample_window = dataset.get_window(0, np.random.default_rng(0))
    sample_window.pop("name", None)

    def data_iter(epoch):
        return batch_iterator(dataset, sampler, epoch)

    eval_fn = None
    if args.eval_every:
        from dynamicpdb_tpu.data.dataset import eval_windows
        from dynamicpdb_tpu.sampling.evaluate import evaluate

        val_dataset = TrajectoryDataset(cfg.data, split="val", pad_to=pad_to)
        eval_key = jax.random.PRNGKey(cfg.experiment.seed + 1)

        def eval_fn(params, _val=val_dataset):
            _, means = evaluate(
                exp.trainer.model, params, exp.trainer.diffuser,
                eval_windows(_val), key=eval_key,
                num_t=cfg.data.num_t, min_t=cfg.data.min_t,
                noise_scale=cfg.experiment.noise_scale,
            )
            return {
                k: means[k]
                for k in ("ave_rot", "ave_trans", "all_atom_mae", "all_atom_rmsd")
            }

    from dynamicpdb_tpu.utils.logging import MetricsWriter

    writer = MetricsWriter(
        os.path.join(cfg.experiment.eval_dir, "logs"), use_tensorboard=True
    )
    exp = Experiment(
        cfg, data_iter, sample_window, mesh=mesh,
        eval_fn=eval_fn, eval_every=args.eval_every, metrics_writer=writer,
    )
    if cfg.experiment.warm_start:
        exp.load_checkpoint(cfg.experiment.warm_start)
        log.info("warm start from %s at step %d", cfg.experiment.warm_start, exp.step)
    elif args.resume:
        # preemption-safe auto-resume: newest step_*.ckpt in ckpt_dir
        # (full state: params + optimizer + step/epoch; the reference's warm
        # start restores weights only, train:468-499)
        import glob
        import re

        ckpts = glob.glob(os.path.join(cfg.experiment.ckpt_dir, "step_*.ckpt"))
        if ckpts:
            latest = max(
                ckpts,
                key=lambda p: int(re.search(r"step_(\d+)", p).group(1)),
            )
            exp.load_checkpoint(latest)
            log.info("auto-resumed from %s (step %d, epoch %d)",
                     latest, exp.step, exp.epoch)

    exp.train(max_steps=args.max_steps)
    exp.save_checkpoint()


if __name__ == "__main__":
    main()
