"""Stage-level timing of one OmegaFold recycling cycle at release dims.

Times jitted PREFIXES of omegafold_cycle (deep_sequence_embed; +recycle;
+geoformer; full cycle) with true host-fetch sync, so stage cost = adjacent
difference. Used to find where the 9.7 s/sequence (10 cycles) actually goes
(docs/OMEGAFOLD_PORT.md acceptance: >= 10 seq/min target).

Usage: python tools/profile_omegafold_breakdown.py [--n-res 256] [--dtype bfloat16]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-res", type=int, default=256)
    ap.add_argument("--pseudo-msa", type=int, default=15)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--dtype", choices=["float32", "bfloat16"],
                    default="float32")
    args = ap.parse_args()

    from dynamicpdb_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from bench_omegafold import build_release_params  # noqa: local tool
    from dynamicpdb_tpu.models.omegafold import model as M
    from dynamicpdb_tpu.models.omegafold import pipeline as P
    from dynamicpdb_tpu.models.omegafold.embedders import recycle_embedder
    from dynamicpdb_tpu.models.omegafold.geoformer import geoformer
    from dynamicpdb_tpu.models.omegafold.structure import (
        confidence_head,
        structure_module,
    )
    from dynamicpdb_tpu.models.omegafold import atoms

    ref = build_release_params()
    params, cfg = M.params_from_torch(ref)
    leaves = jax.tree_util.tree_leaves(params)
    float(leaves[0].reshape(-1)[0])
    print("params on device", file=sys.stderr)
    if args.dtype == "bfloat16":
        params = M._cast_float_leaves(params, jnp.bfloat16)
    act = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    rng = np.random.default_rng(0)
    seq = "".join(rng.choice(list("ACDEFGHIKLMNPQRSTVWY"), args.n_res))
    _, cycles = next(P.fasta2inputs(
        [">t\n", seq + "\n"], num_pseudo_msa=args.pseudo_msa, num_cycle=1,
    ))
    cyc = cycles[0]
    p_msa = jnp.asarray(cyc["p_msa"])
    p_msa_mask = jnp.asarray(cyc["p_msa_mask"]).astype(act)
    L = args.n_res
    prev_node = jnp.zeros((L, cfg.node_dim), act)
    prev_edge = jnp.zeros((L, L, cfg.edge_dim), act)
    prev_x = jnp.zeros((L, 14, 3), act)

    def prefix_embed(params, p_msa, p_msa_mask):
        node, edge = M.deep_sequence_embed(params, cfg, p_msa, p_msa_mask)
        return node.sum() + edge.sum()

    def prefix_recycle(params, p_msa, p_msa_mask, prev_node, prev_edge,
                       prev_x):
        fasta = p_msa[..., 0, :]
        node, edge = M.deep_sequence_embed(params, cfg, p_msa, p_msa_mask)
        node, edge = recycle_embedder(
            params.recycle, fasta, prev_node, prev_edge, prev_x, node, edge
        )
        return node.sum() + edge.sum()

    def prefix_geoformer(params, p_msa, p_msa_mask, prev_node, prev_edge,
                         prev_x):
        fasta = p_msa[..., 0, :]
        node, edge = M.deep_sequence_embed(params, cfg, p_msa, p_msa_mask)
        node, edge = recycle_embedder(
            params.recycle, fasta, prev_node, prev_edge, prev_x, node, edge
        )
        prev_node_full, edge, final_node = geoformer(
            params.geoformer, node, edge, p_msa_mask,
            attn_c=cfg.attn_c, geom_c=cfg.geom_c, geom_head=cfg.geom_head,
        )
        return prev_node_full.sum() + edge.sum() + final_node.sum()

    def full_cycle(params, p_msa, p_msa_mask, prev_node, prev_edge, prev_x):
        node_out, edge, conf, _plddt, _ = M.omegafold_cycle(
            params, cfg, p_msa, p_msa_mask, prev_node, prev_edge, prev_x
        )
        return node_out.sum() + edge.sum() + conf

    stages = [
        ("plm+proj+edge_embed", prefix_embed,
         (params, p_msa, p_msa_mask)),
        ("+recycle_embedder", prefix_recycle,
         (params, p_msa, p_msa_mask, prev_node, prev_edge, prev_x)),
        ("+geoformer50", prefix_geoformer,
         (params, p_msa, p_msa_mask, prev_node, prev_edge, prev_x)),
        ("full_cycle(+struct8+conf)", full_cycle,
         (params, p_msa, p_msa_mask, prev_node, prev_edge, prev_x)),
    ]
    results = {}
    for name, fn, fargs in stages:
        jf = jax.jit(fn)
        t0 = time.time()
        float(jf(*fargs))  # compile + run; host fetch = true barrier
        print(f"{name}: compile+first {time.time()-t0:.1f}s", file=sys.stderr)
        times = []
        for _ in range(args.reps):
            t0 = time.time()
            float(jf(*fargs))
            times.append(time.time() - t0)
        results[name] = float(np.median(times))
        print(f"{name}: {results[name]*1e3:.0f} ms", file=sys.stderr)

    import json

    keys = list(results)
    deltas = {keys[0]: results[keys[0]]}
    for a, b in zip(keys, keys[1:]):
        deltas[b] = results[b] - results[a]
    print(json.dumps({
        "dtype": args.dtype,
        "n_res": args.n_res,
        "prefix_ms": {k: round(v * 1e3, 1) for k, v in results.items()},
        "stage_delta_ms": {k: round(v * 1e3, 1) for k, v in deltas.items()},
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
