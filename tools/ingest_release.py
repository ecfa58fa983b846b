"""One-command dynamicPDB release ingestion: download root -> training CSV.

The reference walks users through four separate scripts per protein
(data_preprocess/: post_process.py PBC unwrap, prep_atlas_with_forces.py
packing, atom_select.py C-alpha rows, extract_embedding.py OmegaFold —
reference README.md:184-203). This tool runs the whole chain over every
protein in a release checkout and emits the training manifest:

    python tools/ingest_release.py --data-root ./dynamicPDB --out-dir packed/
        [--pids 1a62_A,1ah7_A] [--unwrap] [--max-frames N]
        [--embeddings-dir D]  # attach precomputed {pid}.npz OmegaFold reprs
        [--weights release.pt]  # or extract them natively (OmegaFold-in-JAX)

Protein directories follow the release naming `{pid}_npt100000.0_ts0.001/`
(README.md:120-140) or plain `{pid}/`; every published coordinate layout
works (combined/segmented pickles, combined/segmented DCD). Failures are
logged and skipped, mirroring the reference's skip-and-continue policy
(extract_embedding.py:64-67). Output: `{out_dir}/{pid}.npz` bundles plus
`{out_dir}/manifest.csv` that train_cli/eval_cli consume directly.
"""
from __future__ import annotations

import argparse
import csv
import logging
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

log = logging.getLogger("ingest_release")

_PID_RE = re.compile(r"^(?P<pid>.+?)(_npt[\d.]+(_ts[\d.]+)?)?$")


def discover_proteins(data_root: str) -> dict[str, str]:
    """Map pid -> protein directory for every release-layout subdir."""
    out: dict[str, str] = {}
    for name in sorted(os.listdir(data_root)):
        d = os.path.join(data_root, name)
        if not os.path.isdir(d):
            continue
        pid = _PID_RE.match(name).group("pid")
        if os.path.exists(os.path.join(d, f"{pid}.pdb")):
            out[pid] = d
    return out


def _embeddings_for(pid: str, pid_dir: str, args, n_res_hint=None):
    """Return (node_repr, edge_repr) or (None, None) -> zeros in the pack."""
    if args.embeddings_dir:
        p = os.path.join(args.embeddings_dir, f"{pid}.npz")
        if os.path.exists(p):
            from dynamicpdb_tpu.preprocess.embeddings import validate

            validate(p, n_res_hint)
            with np.load(p) as z:
                return z["node_repr"], z["edge_repr"]
        log.warning("%s: no %s in --embeddings-dir; using zeros", pid, p)
        return None, None
    if args.weights:
        from dynamicpdb_tpu.analysis.pdb_io import read_pdb
        from dynamicpdb_tpu.chem import constants as chem
        from dynamicpdb_tpu.preprocess.extract_embeddings import (
            extract_embeddings,
            load_release_weights,
        )

        _, _, aatype, _ = read_pdb(os.path.join(pid_dir, f"{pid}.pdb"))
        seq = "".join(chem.RESTYPES_WITH_X[a] for a in aatype)
        params, cfg = load_release_weights(args.weights)
        for _, reprs in extract_embeddings([f">{pid}", seq], params, cfg):
            return reprs["node_repr"], reprs["edge_repr"]
    return None, None


def ingest(args) -> list[dict]:
    from dynamicpdb_tpu.preprocess.pack import pack_from_dynamicpdb_release

    proteins = discover_proteins(args.data_root)
    if args.pids:
        wanted = args.pids.split(",")
        missing = [p for p in wanted if p not in proteins]
        if missing:
            raise SystemExit(f"pids not found under {args.data_root}: {missing}")
        proteins = {p: proteins[p] for p in wanted}
    if not proteins:
        raise SystemExit(f"no release-layout protein dirs under {args.data_root}")
    log.info("found %d proteins under %s", len(proteins), args.data_root)

    os.makedirs(args.out_dir, exist_ok=True)
    rows: list[dict] = []
    for pid, pid_dir in proteins.items():
        bundle = os.path.join(args.out_dir, f"{pid}.npz")
        try:
            unwrap = args.unwrap
            if unwrap:
                try:  # best-effort: a protein without the state XML still packs
                    from dynamicpdb_tpu.preprocess import pbc

                    pbc.box_from_release_dir(pid_dir, pid)
                except Exception as e:
                    log.warning("%s: cannot unwrap (%s); packing as-is", pid, e)
                    unwrap = False
            node, edge = _embeddings_for(pid, pid_dir, args)
            pack_from_dynamicpdb_release(
                bundle, pid_dir, pid,
                node_repr=node, edge_repr=edge,
                max_frames=args.max_frames, unwrap=unwrap,
            )
            with np.load(bundle) as z:
                n_res = int(z["aatype"].shape[0])
                n_frames = int(z["all_atom_positions"].shape[0])
            rows.append(
                {"name": pid, "atlas_npz": os.path.abspath(bundle),
                 "seq_len": n_res}
            )
            log.info("%s: packed %d frames x %d residues -> %s",
                     pid, n_frames, n_res, bundle)
        except Exception as e:  # skip-and-continue over a 12.6k-protein run
            log.error("%s: SKIPPED (%s)", pid, e)
    return rows


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(name)s: %(message)s")
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-root", required=True,
                    help="release checkout: one subdir per protein")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--pids", default=None, help="comma-separated subset")
    ap.add_argument("--unwrap", action="store_true",
                    help="PBC-unwrap coordinates using the box from the "
                         "release's {pid}_state_npt*.xml")
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--embeddings-dir", default=None,
                    help="directory of precomputed {pid}.npz OmegaFold reprs")
    ap.add_argument("--weights", default=None,
                    help="OmegaFold release .pt: extract embeddings natively")
    ap.add_argument("--csv-name", default="manifest.csv")
    args = ap.parse_args(argv)

    rows = ingest(args)
    if not rows:
        raise SystemExit("every protein failed to ingest; see log above")
    manifest = os.path.join(args.out_dir, args.csv_name)
    with open(manifest, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["name", "atlas_npz", "seq_len"])
        w.writeheader()
        w.writerows(rows)
    print(f"{manifest}: {len(rows)} proteins "
          f"(max seq_len {max(r['seq_len'] for r in rows)})")
    print("train: python -m dynamicpdb_tpu.train_cli "
          f"data.csv_path={manifest}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
