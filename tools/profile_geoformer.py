"""Device-op profile of ONE GeoFormer trunk call at release dims.

The stage breakdown (tools/profile_omegafold_breakdown.py) shows the
50-block GeoFormer is 86% of an OmegaFold recycling cycle (821 of 956 ms on
v5e at N=256). This captures a jax.profiler trace of the jitted geoformer
and aggregates device-op time by fusion name, to target the right ops.

Usage: python tools/profile_geoformer.py [--n-res 256] [--dtype float32]
Writes the aggregated table to stdout; raw trace under /tmp/geoformer_trace.
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-res", type=int, default=256)
    ap.add_argument("--pseudo-msa", type=int, default=15)
    ap.add_argument("--dtype", choices=["float32", "bfloat16"],
                    default="float32")
    ap.add_argument("--flash", action="store_true",
                    help="fused Pallas GeometricAttention kernel")
    ap.add_argument("--trace-dir", default="/tmp/geoformer_trace")
    args = ap.parse_args()

    from dynamicpdb_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from bench_omegafold import build_release_params
    from dynamicpdb_tpu.models.omegafold import model as M
    from dynamicpdb_tpu.models.omegafold.geoformer import (
        geoformer,
        geoformer_params_from_torch,
    )

    ref = build_release_params()
    # convert ONLY the geoformer subtree: skips uploading the ~2.5 GB PLM
    # through the tunnel (minutes per run)
    gp = geoformer_params_from_torch(ref.omega_fold_cycle.geoformer)
    c = ref.cfg
    cfg = M.OmegaFoldConfig(
        node_dim=c.node_dim, edge_dim=c.edge_dim, attn_c=c.attn_c,
        geom_c=c.geom_c, geom_head=c.geom_head,
    )
    del ref
    leaves = jax.tree_util.tree_leaves(gp)
    float(leaves[0].reshape(-1)[0])
    act = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    if args.dtype == "bfloat16":
        gp = M._cast_float_leaves(gp, jnp.bfloat16)

    L, Mrows = args.n_res, args.pseudo_msa + 1
    key = jax.random.PRNGKey(0)
    node = jax.random.normal(key, (Mrows, L, cfg.node_dim), act)
    edge = jax.random.normal(key, (L, L, cfg.edge_dim), act)
    mask = jnp.ones((Mrows, L), act)

    fn = jax.jit(lambda gp, n, e, m: [
        x.sum() for x in geoformer(
            gp, n, e, m, attn_c=cfg.attn_c, geom_c=cfg.geom_c,
            geom_head=cfg.geom_head, flash=args.flash,
        )
    ])
    t0 = time.time()
    [float(x) for x in fn(gp, node, edge, mask)]
    print(f"compile+first: {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    [float(x) for x in fn(gp, node, edge, mask)]
    wall = time.time() - t0
    print(f"steady: {wall*1e3:.0f} ms", file=sys.stderr)

    with jax.profiler.trace(args.trace_dir):
        [float(x) for x in fn(gp, node, edge, mask)]

    # aggregate device ops from the trace proto (xplane) via the json export
    files = sorted(glob.glob(
        os.path.join(args.trace_dir, "**", "*.trace.json.gz"), recursive=True
    ), key=os.path.getmtime)
    if not files:
        print("no trace produced", file=sys.stderr)
        return
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    # device lanes: pid whose process name mentions TPU/device
    pid_names = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    device_pids = {
        pid for pid, name in pid_names.items()
        if "TPU" in name or "/device" in name.lower()
    }
    agg = collections.Counter()
    total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or ev.get("pid") not in device_pids:
            continue
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        name = ev.get("name", "?")
        agg[name] += dur
        total += dur
    print(f"\ndevice total: {total:.0f} ms over {len(agg)} distinct ops")
    rows = agg.most_common(30)
    out = []
    for name, ms in rows:
        pct = 100.0 * ms / max(total, 1e-9)
        print(f"{pct:5.1f}%  {ms:8.1f} ms  {name[:110]}")
        out.append({"op": name, "ms": round(ms, 1), "pct": round(pct, 1)})
    print(json.dumps({
        "dtype": args.dtype, "n_res": args.n_res, "flash": args.flash,
        "steady_ms": round(wall * 1e3, 1),
        "device_total_ms": round(total, 1), "top": out[:12],
    }))


if __name__ == "__main__":
    main()
