"""Structure prediction CLI: fasta -> PDB + per-residue pLDDT.

The vendored reference computes the full fold result (atom positions +
confidence) inside every recycling cycle and then DROPS it — its forward
returns only the (edge, node) reprs for the DFOLD embedding pipeline
(/root/reference/src/toolbox/OmegaFold/omegafold/model.py:150-206).
Upstream OmegaFold exposes exactly this result as its headline product.
Since the port already computes it (structure module + confidence head,
parity-tested in tests/test_omegafold_structure.py), this CLI surfaces it:

    python -m dynamicpdb_tpu.fold_cli --fasta seqs.fasta \
        --weights release.pt --out-dir folds/

Writes one PDB per sequence (B-factor column = per-residue pLDDT x 100,
the AlphaFold/OmegaFold convention) plus a JSON sidecar with the overall
confidence. Selection follows the reference semantics: the most-confident
recycling cycle wins (strictly greater, first cycle breaks ties).
"""
from __future__ import annotations

import argparse
import json
import logging
import os


def fold(fasta_lines, params, cfg, *, num_cycles: int = 10,
         num_pseudo_msa: int = 15, dtype=None, flash: bool = False,
         scan_cycles: bool = True, pad_multiple: int = 0):
    """Yield (name, dict) per sequence: atom37 [L,37,3], atom37_mask,
    aatype [L], plddt [L], confidence_overall (float).

    pad_multiple: length-bucket padding — one compiled program per bucket
    instead of a fresh XLA compile per distinct sequence length (outputs
    sliced back to the true length; same machinery as extraction)."""
    import jax.numpy as jnp
    import numpy as np

    from dynamicpdb_tpu.models.omegafold.model import (
        _cast_float_leaves,
        omegafold_embed,
        omegafold_embed_scan,
    )
    from dynamicpdb_tpu.models.omegafold.pipeline import fasta2inputs
    from dynamicpdb_tpu.ops import frames as frame_ops

    if dtype is not None:
        # cast once up front (the per-sequence astype inside the embed is
        # then a no-op) — same rationale as extract_embeddings
        params = _cast_float_leaves(params, dtype)
    for name, cycles in fasta2inputs(
        fasta_lines, num_pseudo_msa=num_pseudo_msa, num_cycle=num_cycles,
        pad_multiple=pad_multiple,
    ):
        n = cycles[0].get("num_res", cycles[0]["p_msa"].shape[-1])
        fasta = np.asarray(cycles[0]["p_msa"][0][:n])  # primary sequence
        if (fasta > 20).any():
            # tokenize() maps '-' (alignment gaps) to token 21; the atom
            # tables and PDB writer cover residue types 0..20 only, and a
            # gap has no structure to predict — fail BEFORE the expensive
            # fold rather than crash (or silently emit X) after it
            raise ValueError(
                f"{name}: sequence contains gap/unknown tokens — remove "
                "'-' characters from the FASTA before folding"
            )
        embed = omegafold_embed_scan if scan_cycles else omegafold_embed
        _, _, conf, struct = embed(
            params, cfg, cycles, dtype=dtype, flash=flash,
            pad_safe=bool(pad_multiple), return_structure=True,
        )
        atom37, mask37 = frame_ops.atom14_to_atom37(
            jnp.asarray(struct["pos14"][:n]), jnp.asarray(fasta)
        )
        yield name, {
            "atom37": np.asarray(atom37),
            "atom37_mask": np.asarray(mask37),
            "aatype": fasta,
            "plddt": np.asarray(struct["plddt"][:n]),
            "confidence_overall": float(conf),
        }


def main(argv=None):
    parser = argparse.ArgumentParser()
    from dynamicpdb_tpu.preprocess.extract_embeddings import (
        add_omegafold_cli_args,
        load_release_weights,
        resolve_dtype_flash,
    )

    add_omegafold_cli_args(parser)
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    log = logging.getLogger("fold")

    from dynamicpdb_tpu.utils.platform import honor_cpu_request

    honor_cpu_request()

    from dynamicpdb_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import numpy as np

    from dynamicpdb_tpu.analysis.pdb_io import write_pdb

    params, cfg = load_release_weights(args.weights)
    os.makedirs(args.out_dir, exist_ok=True)
    with open(args.fasta) as f:
        lines = f.readlines()
    dtype, flash = resolve_dtype_flash(args)
    for name, result in fold(
        lines, params, cfg, num_cycles=args.num_cycles,
        num_pseudo_msa=args.num_pseudo_msa, dtype=dtype, flash=flash,
        scan_cycles=not args.no_scan, pad_multiple=args.pad_multiple,
    ):
        pdb_path = os.path.join(args.out_dir, f"{name}.pdb")
        b = np.broadcast_to(
            (result["plddt"] * 100.0)[:, None], result["atom37_mask"].shape
        )
        write_pdb(
            pdb_path, result["atom37"], result["aatype"],
            atom37_mask=result["atom37_mask"], b_factors=np.asarray(b),
        )
        with open(os.path.join(args.out_dir, f"{name}.json"), "w") as f:
            json.dump(
                {"confidence_overall": result["confidence_overall"],
                 "mean_plddt": float(result["plddt"].mean())}, f,
            )
        log.info("wrote %s (confidence %.3f)", pdb_path,
                 result["confidence_overall"])


if __name__ == "__main__":
    main()
