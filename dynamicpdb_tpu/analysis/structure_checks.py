"""Structural-quality metrics: geometry violations, clashes, TM-score,
secondary-structure fractions, radius of gyration.

Dependency-free port of the reference's protein_metrics surface
(/root/reference/src/analysis/metrics.py:44-132): mdtraj/tmtools/AMBER are
replaced by direct computations on atom37 arrays —
  * C-alpha bond deviation / validity / steric clashes (metrics.py:120-132)
  * backbone bond-length and clash violations (the AF2
    between_residue_bond/clash checks, openfold amber_minimize ->
    loss.py equivalents, computed from chem constants)
  * TM-score with the standard Zhang-Skolnick iterative superposition
  * DSSP-lite helix/strand/coil fractions from backbone geometry
  * radius of gyration
"""
from __future__ import annotations

import numpy as np

CA_CA_IDEAL = 3.80209737096  # AF2 residue_constants.ca_ca
C_N_IDEAL = 1.329  # peptide bond length (proline 1.341)
CA_C_N_COS_IDEAL = -0.5203  # cos of ideal CA-C-N angle (~121.7 deg)


# --- C-alpha geometry (metrics.py:120-132 parity) ---------------------------
def ca_ca_distance(ca_pos: np.ndarray, tol: float = 0.1):
    d = np.linalg.norm(ca_pos[1:] - ca_pos[:-1], axis=-1)
    return float(np.mean(np.abs(d - CA_CA_IDEAL))), float(
        np.mean(d < CA_CA_IDEAL + tol)
    )


def ca_ca_clashes(ca_pos: np.ndarray, tol: float = 1.5):
    d = np.linalg.norm(ca_pos[:, None] - ca_pos[None, :], axis=-1)
    iu = np.triu_indices(len(ca_pos), k=1)
    clashes = d[iu] < tol
    return int(np.sum(clashes)), float(np.mean(clashes))


# --- backbone covalent-geometry violations ----------------------------------
# Exact AF2 semantics live in analysis/violations.py (golden-tested vs the
# reference torch implementation); protein_metrics below reports its keys.


# --- TM-score ----------------------------------------------------------------
def _fit_transform(src: np.ndarray, dst: np.ndarray):
    """Kabsch R, t minimizing |src @ R + t - dst| (reflection-corrected)."""
    A = src - src.mean(0)
    B = dst - dst.mean(0)
    u, _, vh = np.linalg.svd(A.T @ B)
    sgn = np.sign(np.linalg.det(u @ vh))
    u[:, -1] *= sgn
    R = u @ vh
    t = dst.mean(0) - src.mean(0) @ R
    return R, t


def tm_score(pred_ca: np.ndarray, gt_ca: np.ndarray, n_iter: int = 20):
    """Zhang-Skolnick TM-score, normalized by len(gt): superpose on a
    converging inlier set (d < 2*d0), score all residues with
    mean 1 / (1 + (d/d0)^2)."""
    L = len(gt_ca)
    d0 = max(1.24 * max(L - 15, 1) ** (1.0 / 3) - 1.8, 0.5)
    idx = np.arange(L)
    for _ in range(n_iter):
        R, t = _fit_transform(pred_ca[idx], gt_ca[idx])
        d = np.linalg.norm(pred_ca @ R + t - gt_ca, axis=-1)
        new_idx = np.where(d < 2 * d0)[0]
        if len(new_idx) < 4 or (
            len(new_idx) == len(idx) and np.all(new_idx == idx)
        ):
            break
        idx = new_idx
    R, t = _fit_transform(pred_ca[idx], gt_ca[idx])
    d = np.linalg.norm(pred_ca @ R + t - gt_ca, axis=-1)
    return float(np.mean(1.0 / (1.0 + (d / d0) ** 2)))


# --- shape metrics -----------------------------------------------------------
def radius_of_gyration(atom37: np.ndarray, mask37: np.ndarray) -> float:
    flat = atom37.reshape(-1, 3)[mask37.reshape(-1).astype(bool)]
    com = flat.mean(0)
    return float(np.sqrt(np.mean(np.sum((flat - com) ** 2, -1))))


def secondary_structure_fractions(atom37: np.ndarray) -> dict:
    """DSSP-lite from C-alpha virtual dihedrals/distances: helix when the
    i..i+3 CA distance ~5.3 A and chain turns consistently; strand when the
    chain is extended (i..i+2 distance > 6.4 A)."""
    ca = atom37[:, 1]
    L = len(ca)
    ss = np.full(L, "C", dtype=object)
    if L >= 4:
        d13 = np.linalg.norm(ca[3:] - ca[:-3], axis=-1)  # i to i+3
        for i in range(L - 3):
            if 4.5 < d13[i] < 6.0:
                ss[i : i + 4] = "H"
    if L >= 3:
        d02 = np.linalg.norm(ca[2:] - ca[:-2], axis=-1)
        for i in range(L - 2):
            if d02[i] > 6.4 and ss[i] == "C":
                ss[i : i + 3] = np.where(ss[i : i + 3] == "C", "E", ss[i : i + 3])
    return {
        "helix_percent": float(np.mean(ss == "H")),
        "strand_percent": float(np.mean(ss == "E")),
        "coil_percent": float(np.mean(ss == "C")),
    }


def protein_metrics(atom37: np.ndarray, mask37: np.ndarray,
                    gt_atom37: np.ndarray | None = None,
                    aatype: np.ndarray | None = None,
                    residue_index: np.ndarray | None = None) -> dict:
    """Aggregate (metrics.py:75-118 equivalent). With aatype, the exact AF2
    violation metrics (analysis/violations.py, golden-tested vs the
    reference) are included under their reference keys."""
    bb_ok = mask37[:, 1].astype(bool)
    ca = atom37[bb_ok, 1]
    dev, valid = ca_ca_distance(ca)
    n_clash, clash_pct = ca_ca_clashes(ca)
    out = {
        "ca_ca_bond_dev": dev,
        "ca_ca_valid_percent": valid,
        "num_ca_steric_clashes": n_clash,
        "ca_steric_clash_percent": clash_pct,
        "radius_of_gyration": radius_of_gyration(atom37, mask37),
        **secondary_structure_fractions(atom37[bb_ok]),
    }
    if aatype is not None:
        from dynamicpdb_tpu.analysis.violations import (
            compute_violation_metrics,
        )

        if residue_index is None:
            residue_index = np.arange(len(aatype), dtype=np.int64)
        vm = compute_violation_metrics(
            atom37, mask37, np.asarray(aatype, np.int64), residue_index
        )
        out.update({
            k: vm[k] for k in (
                "violations_extreme_ca_ca_distance",
                "violations_between_residue_bond",
                "violations_between_residue_clash",
                "violations_within_residue",
                "violations_per_residue",
                "num_residue_violations",
            )
        })
    if gt_atom37 is not None:
        out["tm_score"] = tm_score(ca, gt_atom37[bb_ok, 1])
    return out
