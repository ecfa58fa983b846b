"""Measure native OmegaFold embedding-extraction throughput on the TPU at
RELEASE dimensions (the port-acceptance target in docs/OMEGAFOLD_PORT.md:
>= 10 sequences/min at N=256, 10 recycling cycles).

Weights are random (released weights are not redistributable in this image);
throughput is weight-independent. The reference torch OmegaFold is
instantiated at the release config (config.py:43-92: 66-layer OmegaPLM at
node 1280, 50 GeoFormer blocks, 8-cycle structure module) purely to derive a
correctly-shaped parameter tree via params_from_torch.

Usage: python tools/bench_omegafold.py [--n-res 256] [--cycles 10]
"""
from __future__ import annotations

import argparse
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference/src/toolbox/OmegaFold"


def build_release_params():
    """Random-weight torch OmegaFold at release dims -> our param tree."""
    for name in ["Bio", "Bio.PDB", "Bio.Data", "Bio.Data.SCOPData"]:
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["Bio"].PDB = sys.modules["Bio.PDB"]
    sys.modules["Bio"].Data = sys.modules["Bio.Data"]
    sys.modules["Bio.Data"].SCOPData = sys.modules["Bio.Data.SCOPData"]
    sys.modules["Bio.Data.SCOPData"].protein_letters_3to1 = {}
    sys.path.insert(0, REF)
    import torch
    from omegafold import config as ref_config
    from omegafold import model as ref_model

    torch.manual_seed(0)
    cfg = ref_config.make_config()
    t0 = time.time()
    with torch.no_grad():
        ref = ref_model.OmegaFold(cfg).eval()
        for p in ref.parameters():
            p.normal_(0.0, 0.02)
    n_params = sum(p.numel() for p in ref.parameters())
    print(f"torch release model: {n_params/1e6:.0f}M params "
          f"({time.time()-t0:.0f}s)", file=sys.stderr)
    return ref


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-res", type=int, default=256)
    ap.add_argument("--cycles", type=int, default=10)
    ap.add_argument("--pseudo-msa", type=int, default=15)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--dtype", choices=["float32", "bfloat16"],
                    default="float32")
    ap.add_argument("--flash", action="store_true",
                    help="fused Pallas GeometricAttention (the extraction "
                         "CLI enables this automatically on TPU)")
    ap.add_argument("--scan", action="store_true",
                    help="lax.scan recycling loop with on-device best-cycle "
                         "selection (extraction CLI default)")
    args = ap.parse_args()

    from dynamicpdb_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import numpy as np

    import jax
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else None

    from dynamicpdb_tpu.models.omegafold import model as M
    from dynamicpdb_tpu.models.omegafold import pipeline as P

    ref = build_release_params()
    t0 = time.time()
    params, cfg = M.params_from_torch(ref)
    # force full materialization on device before timing
    leaves = jax.tree_util.tree_leaves(params)
    total_bytes = sum(x.size * x.dtype.itemsize for x in leaves)
    float(leaves[0].reshape(-1)[0])
    print(f"params on device: {total_bytes/1e9:.2f} GB "
          f"({time.time()-t0:.0f}s incl. tunnel upload)", file=sys.stderr)

    if dtype is not None:
        params = M._cast_float_leaves(params, dtype)
    rng = np.random.default_rng(0)
    seq = "".join(rng.choice(list("ACDEFGHIKLMNPQRSTVWY"), args.n_res))

    def run(seed_name):
        _, cycles = next(P.fasta2inputs(
            [f">{seed_name}\n", seq + "\n"],
            num_pseudo_msa=args.pseudo_msa, num_cycle=args.cycles,
        ))
        if args.scan:
            edge, node, conf = M.omegafold_embed_scan(
                params, cfg, cycles, dtype=dtype, flash=args.flash
            )
        else:
            edge, node, conf = M.omegafold_embed(
                params, cfg, cycles, jit=True, dtype=dtype, flash=args.flash
            )
        return np.asarray(node)  # host fetch = the only true barrier

    t0 = time.time()
    run("warmup")
    print(f"compile+first sequence: {time.time()-t0:.1f}s", file=sys.stderr)
    times = []
    for r in range(args.reps):
        t0 = time.time()
        run(f"rep{r}")
        times.append(time.time() - t0)
    med = float(np.median(times))
    print(f"per-sequence: {['%.2fs' % t for t in times]}", file=sys.stderr)
    import json

    print(json.dumps({
        "metric": "omegafold_sequences_per_min_256res_10cyc",
        "dtype": args.dtype,
        "flash": args.flash,
        "scan": args.scan,
        "value": round(60.0 / med, 2),
        "unit": "seq/min",
        "vs_target": round((60.0 / med) / 10.0, 2),
        "seconds_per_seq_median": round(med, 2),
        "n_res": args.n_res,
        "cycles": args.cycles,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
