"""Evaluation driver: reverse-sample each validation window, compute the
reference's metrics of record (Evaluator / Experiment.eval_fn equivalents,
/root/reference/eval_DFOLD_dynamics.py:59-204 +
train_DFOLD_dynamics.py:765-930)."""
from __future__ import annotations

import logging
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np

from dynamicpdb_tpu.analysis.metrics import eval_window_metrics
from dynamicpdb_tpu.data.featurize import eval_init_window, featurize_window
from dynamicpdb_tpu.sampling.reverse import reverse_sample

log = logging.getLogger(__name__)


def evaluate(
    module,
    params,
    diffuser,
    windows: Iterable[dict],
    *,
    key,
    num_t: int = 10,
    min_t: float = 0.01,
    noise_scale: float = 0.1,
    cfg_gamma: float | None = None,
    save_dir: str | None = None,
    decompose: bool = False,
):
    """Run eval over raw windows; returns per-protein metric rows + means.

    noise_scale defaults to the reference's eval setting (run_eval.sh:9).
    cfg_gamma enables classifier-free guidance (reference gates it on
    cfg_drop_rate > 0.01, train:1477-1484).
    """

    @jax.jit
    def run_one(params, key, raw):
        feats = featurize_window(raw)
        k_init, k_rev = jax.random.split(key)
        feats = eval_init_window(k_init, feats, diffuser)
        out = reverse_sample(
            k_rev, module, params, diffuser, feats,
            num_t=num_t, min_t=min_t, noise_scale=noise_scale,
            cfg_gamma=cfg_gamma,
        )
        metrics = eval_window_metrics(
            out["rigids"], out["atom37"], feats["rigids_0"],
            feats["atom37_pos"], feats["atom37_mask"],
            res_mask=feats["res_mask"],
        )
        if decompose:
            # teacher-forced all-atom error decomposition: floor = what GT
            # rigids+torsions reconstruct to (irreducible unless GT atoms
            # are in the idealized-geometry decoder's image)
            from dynamicpdb_tpu.analysis.decomposition import (
                atom_error_decomposition,
            )

            dec = atom_error_decomposition(
                feats, {"rigids": out["rigids"], "angles": out["angles"]}
            )
            for part, errs in dec.items():
                for m, v in errs.items():
                    metrics[f"{part}_{m}"] = v
        return metrics, out

    rows = []
    for i, raw in enumerate(windows):
        raw = dict(raw)  # don't mutate the caller's dict (repeat evals)
        name = raw.pop("name", f"window_{i}")
        raw_j = jax.tree_util.tree_map(jnp.asarray, raw)
        key, sub = jax.random.split(key)
        metrics, out = run_one(params, sub, raw_j)
        row = {"name": name, **{k: float(v) for k, v in metrics.items()}}
        rows.append(row)
        log.info(
            "eval %s: ave_rot=%.3f ave_trans=%.3f atom_mae=%.3f rmsd=%.3f "
            "(RefAsPred rot=%.3f trans=%.3f)",
            name, row["ave_rot"], row["ave_trans"], row["all_atom_mae"],
            row["all_atom_rmsd"], row["ref_ave_rot"], row["ref_ave_trans"],
        )
        if save_dir is not None:
            import os

            from dynamicpdb_tpu.analysis.pdb_io import write_pdb

            os.makedirs(save_dir, exist_ok=True)
            np.savez_compressed(
                os.path.join(save_dir, f"{name}_pred.npz"),
                rigids=np.asarray(out["rigids"]),
                atom37=np.asarray(out["atom37"]),
            )
            # PDB artifacts like the reference eval dirs (train:778-806):
            # predicted window (multi-model) + ground truth
            aatype = np.asarray(raw_j["aatype"])
            write_pdb(
                os.path.join(save_dir, f"{name}.pdb"),
                np.asarray(out["atom37"]), aatype,
            )
            write_pdb(
                os.path.join(save_dir, f"{name}_gt.pdb"),
                np.asarray(raw_j["atom37"]), aatype,
                np.asarray(raw_j["atom37_mask"]),
            )
            # interactive 3D overlay (plotly-format HTML, reference
            # plotting.py modality; no plotly dependency needed)
            from dynamicpdb_tpu.analysis.interactive import (
                comparison_figure, write_html,
            )

            write_html(
                comparison_figure(
                    np.asarray(out["atom37"])[-1, :, 1],
                    np.asarray(raw_j["atom37"])[-1, :, 1],
                    title=f"{name}: predicted vs GT (CA)",
                ),
                os.path.join(save_dir, f"{name}.html"),
            )

    means = {
        k: float(np.mean([r[k] for r in rows]))
        for k in rows[0]
        if k != "name"
    }
    log.info(
        "eval means: ave_rot=%.4f ave_trans=%.4f ave_atom_mae=%.4f "
        "ave_atom_rmsd=%.4f",
        means["ave_rot"], means["ave_trans"], means["all_atom_mae"],
        means["all_atom_rmsd"],
    )
    return rows, means
