"""Measure what sequence parallelism (parallel/sp.py) buys per device.

Compares the compiled train step's per-device memory (XLA
``memory_analysis``: temp = activations + workspace) and, when run on
real hardware, step time, between:

  * DP   — mesh (D,) over 'data', one full window per device;
  * SP   — mesh (1, D) over ('data', 'seq'), ONE window with its residue
           axis sharded D ways (the O(N^2) edge tensor / IPA logits are
           partitioned; GSPMD inserts the halo/all-gather collectives).

The reference has no equivalent (SURVEY §2.4: no sequence/context
parallelism; max_len capped at 256). This tool quantifies the long-N
story: per-device activation memory scales ~1/D with 'seq', raising the
trainable sequence length at constant HBM.

Usage (8 virtual CPU devices unless a TPU pod is attached):
  JAX_PLATFORMS=cpu python tools/bench_seq_parallel.py --n-res 256
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-res", type=int, default=256)
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--tiny", action="store_true",
                   help="1-block toy model (fast compile smoke)")
    p.add_argument("--steps", type=int, default=0,
                   help="also execute+time this many steps per case")
    p.add_argument("--out", default=None, help="write a JSON artifact here")
    args = p.parse_args()

    from dynamicpdb_tpu.utils.platform import honor_cpu_request

    if honor_cpu_request():
        import jax

        jax.config.update("jax_num_cpu_devices", max(args.devices, 8))
    import jax
    import numpy as np

    from dynamicpdb_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import __graft_entry__ as g
    from dynamicpdb_tpu.parallel import mesh as mesh_lib, sp
    from dynamicpdb_tpu.train.experiment import Trainer

    D = args.devices
    assert jax.device_count() >= D, (
        f"need {D} devices, have {jax.device_count()}"
    )
    cfg, window = g._flagship(n_res=args.n_res, tiny=args.tiny)
    key = jax.random.PRNGKey(0)

    def one_case(label, shape, axes, batch_per_data):
        mesh = mesh_lib.make_mesh(shape, axes)
        tr = Trainer(cfg, mesh=mesh)
        params, opt_state = tr.init_params(key, window)
        batch = {k: np.stack([v] * batch_per_data) for k, v in window.items()}
        batch = mesh_lib.shard_batch(mesh, batch)
        bspec = mesh_lib.batch_sharding(mesh)
        rspec = mesh_lib.replicated(mesh)
        pspec = tr._param_shardings or rspec
        ospec = tr.opt_state_shardings(opt_state) or rspec
        with sp.activated(mesh):
            compiled = (
                jax.jit(
                    tr.train_step,
                    donate_argnums=(0, 1),
                    in_shardings=(pspec, ospec, rspec, bspec),
                    out_shardings=(pspec, ospec, rspec),
                )
                .lower(params, opt_state, key, batch)
                .compile()
            )
            mem = compiled.memory_analysis()
            row = {
                "case": label,
                "mesh": {k: int(v) for k, v in dict(mesh.shape).items()},
                "global_batch": batch_per_data,
                "temp_mb_per_device": round(mem.temp_size_in_bytes / 1e6, 1),
                "args_mb_per_device": round(
                    mem.argument_size_in_bytes / 1e6, 1
                ),
            }
            if args.steps:
                p_, o_ = params, opt_state
                p_, o_, aux = compiled(p_, o_, key, batch)  # warmup
                jax.block_until_ready(aux["total_loss"])
                t0 = time.perf_counter()
                for i in range(args.steps):
                    p_, o_, aux = compiled(
                        p_, o_, jax.random.PRNGKey(i + 1), batch
                    )
                jax.block_until_ready(aux["total_loss"])
                dt = (time.perf_counter() - t0) / args.steps
                row["step_ms"] = round(dt * 1e3, 1)
                row["windows_per_sec"] = round(batch_per_data / dt, 2)
                assert np.isfinite(float(aux["total_loss"]))
        return row

    def grad_only_case(label, mesh):
        """Model fwd+bwd only (no optimizer): isolates the activation
        memory SP targets from the replicated param-grad / Adam floor.
        NOTE the arguments must live on the mesh — a jit over
        single-device args compiles with num_partitions=1 and silently
        no-ops every sharding constraint."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from dynamicpdb_tpu.data.featurize import (
            diffuse_training_window,
            featurize_window,
        )
        from dynamicpdb_tpu.diffusion.se3_diffuser import SE3Diffuser
        from dynamicpdb_tpu.models.score_network import DFoldScoreNetwork

        import jax.numpy as jnp

        diffuser = SE3Diffuser(cfg.diffuser)
        model = DFoldScoreNetwork(cfg.model)
        feats = featurize_window(jax.tree_util.tree_map(jnp.asarray, window))
        feats = diffuse_training_window(key, feats, diffuser, cfg.data.min_t)
        params = model.init(key, feats)

        def fwd(p, f):
            return model.apply(p, f)["rigids"].sum()

        if mesh is not None:
            rep = NamedSharding(mesh, P())
            params = jax.device_put(params, rep)
            feats = jax.device_put(feats, rep)
        with sp.activated(mesh):
            compiled = jax.jit(jax.grad(fwd)).lower(params, feats).compile()
        mem = compiled.memory_analysis()
        return {
            "case": label,
            "temp_mb_per_device": round(mem.temp_size_in_bytes / 1e6, 1),
        }

    sp_mesh = mesh_lib.make_mesh((1, D), ("data", "seq"))
    rows = [
        # DP: one full window per device — the per-device O(N^2) baseline
        one_case("dp", (D,), ("data",), D),
        # SP: one window total, residue axis sharded D ways
        one_case("sp", (1, D), ("data", "seq"), 1),
        # activation-only view (no optimizer/ZeRO confound)
        grad_only_case("grad_1dev", None),
        grad_only_case("grad_sp", sp_mesh),
    ]
    ratio = rows[2]["temp_mb_per_device"] / max(
        rows[3]["temp_mb_per_device"], 1e-9
    )
    result = {
        "n_res": args.n_res,
        "devices": D,
        "tiny": args.tiny,
        "backend": jax.default_backend(),
        "cases": rows,
        "grad_1dev_over_sp_temp_ratio": round(ratio, 2),
    }
    print(json.dumps(result, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
