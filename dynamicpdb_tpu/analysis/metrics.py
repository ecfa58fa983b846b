"""Evaluation metrics (jnp; CPU/TPU agnostic).

Metrics of record from the reference eval path (SURVEY.md §6):
  * ave_rot — mean quaternion geodesic distance in degrees
    (/root/reference/src/toolbox/rot_trans_error.py:50-73)
  * ave_trans — translation MAE/MSE (rot_trans_error.py:7-27)
  * all-atom MAE/MSE (train_DFOLD_dynamics.py:892-912)
  * superimposed RMSD via Kabsch (SVDSuperimposer / openfold
    superimposition.py:45)
  * rmsd_all / rmsd_ca / rmsd_ca_aligned / drmsd_ca
    (train:100-154, openfold validation_metrics.py)
  * RefAsPred baselines — previous frame as prediction (train:1558-1559)
"""
from __future__ import annotations

import jax.numpy as jnp


def quaternion_distance_deg(q1, q2):
    """2*acos(|<q1, q2>|) in degrees; inputs normalized."""
    q1 = q1 / jnp.linalg.norm(q1, axis=-1, keepdims=True)
    q2 = q2 / jnp.linalg.norm(q2, axis=-1, keepdims=True)
    dot = jnp.clip(jnp.abs(jnp.sum(q1 * q2, axis=-1)), 0.0, 1.0)
    return jnp.degrees(2 * jnp.arccos(dot))


def average_quaternion_distances(q1, q2, mask=None):
    """[F, N, 4] x2 -> [F] mean geodesic degrees per frame.

    ``mask`` ([..., N] or [N]) restricts the mean to real residues; the
    reference never pads, so the masked mean equals its unmasked one
    (rot_trans_error.py:63-73) on unpadded inputs."""
    d = quaternion_distance_deg(q1, q2)
    if mask is None:
        return jnp.mean(d, axis=-1)
    m = jnp.broadcast_to(mask, d.shape)
    return jnp.sum(d * m, axis=-1) / (jnp.sum(m, axis=-1) + 1e-10)


def average_translation_distances(t1, t2, measurement: str = "MAE", mask=None):
    err = (t1 - t2) ** 2 if measurement == "MSE" else jnp.abs(t1 - t2)
    if mask is None:
        return jnp.mean(err, axis=(-1, -2))
    m = jnp.broadcast_to(mask[..., None], err.shape)
    return jnp.sum(err * m, axis=(-1, -2)) / (jnp.sum(m, axis=(-1, -2)) + 1e-10)


def masked_atom_error(pred_atom37, gt_atom37, atom37_mask):
    """Per-frame masked MAE and MSE over atom37 coords (train:892-912)."""
    m = atom37_mask[..., None]
    denom = jnp.sum(jnp.broadcast_to(m, pred_atom37.shape), axis=(-1, -2, -3))
    mae = jnp.sum(jnp.abs(gt_atom37 - pred_atom37) * m, axis=(-1, -2, -3)) / denom
    mse = jnp.sum((gt_atom37 - pred_atom37) ** 2 * m, axis=(-1, -2, -3)) / denom
    return mae, mse


def kabsch_align(a, b, weights=None):
    """Rotate+translate b onto a (Kabsch with reflection fix); [..., N, 3]."""
    if weights is None:
        weights = jnp.ones(a.shape[:-1], a.dtype)
    w = weights[..., None]
    wsum = jnp.sum(w, axis=-2, keepdims=True)
    a_mean = jnp.sum(a * w, axis=-2, keepdims=True) / wsum
    b_mean = jnp.sum(b * w, axis=-2, keepdims=True) / wsum
    a_c, b_c = a - a_mean, b - b_mean
    H = jnp.einsum("...ji,...jk->...ik", w * a_c, b_c)
    u, s, vh = jnp.linalg.svd(H, full_matrices=False)
    sgn = jnp.sign(jnp.linalg.det(u @ vh))
    u = u.at[..., :, -1].multiply(sgn[..., None])
    rot = u @ vh  # b_c @ rot^T lands on a_c (rmsdalign, train:74-97)
    return jnp.einsum("...nj,...ij->...ni", b_c, rot) + a_mean


def superimposed_rmsd(pred, gt, mask=None):
    """RMSD after optimal superposition of pred onto gt; [..., N, 3]."""
    aligned = kabsch_align(gt, pred, weights=mask)
    d2 = jnp.sum((aligned - gt) ** 2, axis=-1)
    if mask is not None:
        return jnp.sqrt(jnp.sum(d2 * mask, -1) / (jnp.sum(mask, -1) + 1e-8))
    return jnp.sqrt(jnp.mean(d2, axis=-1))


def superimposed_rmsd_atom37(pred_atom37, gt_atom37, atom37_mask):
    """Superimposed RMSD treating the atom37 cloud as one point set
    ([..., N, 37, 3] + [..., N, 37] mask -> [...])."""
    return superimposed_rmsd(
        pred_atom37.reshape(pred_atom37.shape[:-3] + (-1, 3)),
        gt_atom37.reshape(gt_atom37.shape[:-3] + (-1, 3)),
        jnp.broadcast_to(
            atom37_mask[..., None], atom37_mask.shape + (1,)
        ).reshape(atom37_mask.shape[:-2] + (-1,)),
    )


def rmsd(pred, gt, mask=None):
    d2 = jnp.sum((pred - gt) ** 2, axis=-1)
    if mask is not None:
        return jnp.sqrt(jnp.sum(d2 * mask, -1) / (jnp.sum(mask, -1) + 1e-4))
    return jnp.sqrt(jnp.mean(d2, -1))


def drmsd(pred_ca, gt_ca, mask=None):
    """Distance-matrix RMSD over C-alpha coords [..., N, 3]
    (openfold validation_metrics.py:17-40)."""
    def dmat(x):
        d = x[..., :, None, :] - x[..., None, :, :]
        return jnp.sqrt(jnp.sum(d * d, -1) + 1e-10)

    dp, dg = dmat(pred_ca), dmat(gt_ca)
    diff = (dp - dg) ** 2
    n = pred_ca.shape[-2]
    if mask is not None:
        pair = mask[..., :, None] * mask[..., None, :]
        total = jnp.sum(diff * pair, (-1, -2))
        cnt = jnp.sum(pair, (-1, -2)) - jnp.sum(mask, -1)
    else:
        total = jnp.sum(diff, (-1, -2))
        cnt = n * (n - 1)
    return jnp.sqrt(total / jnp.maximum(cnt, 1))


def eval_window_metrics(pred_rigids, pred_atom37, gt_rigids, gt_atom37,
                        atom37_mask, res_mask=None):
    """The reference's per-protein eval summary (train:886-925): last-frame
    rotation/translation errors, all-atom MAE/MSE, superimposed RMSD, plus
    RefAsPred baselines using frame F-2. ``res_mask`` ([N] or [F, N]) excludes
    padded residues from the rigid-frame errors (the atom37 metrics are
    already masked via atom37_mask, which is zero on padding)."""
    if res_mask is None:
        res_mask = atom37_mask[..., 1]  # CA present <=> real residue
    ave_rot = average_quaternion_distances(
        gt_rigids[..., :4], pred_rigids[..., :4], mask=res_mask
    )
    ave_trans = average_translation_distances(
        gt_rigids[..., 4:], pred_rigids[..., 4:], "MAE", mask=res_mask
    )
    if gt_rigids.shape[0] >= 2:
        ref = jnp.broadcast_to(gt_rigids[-2][None], gt_rigids.shape)
        ref_rot = average_quaternion_distances(
            gt_rigids[..., :4], ref[..., :4], mask=res_mask
        )
        ref_trans = average_translation_distances(
            gt_rigids[..., 4:], ref[..., 4:], "MAE", mask=res_mask
        )
    else:
        # F=1: there is no previous frame — jnp would CLAMP index -2 to 0
        # and report a deceptive exact-0 baseline; report NaN instead
        ref_rot = jnp.full(gt_rigids.shape[:1], jnp.nan)
        ref_trans = jnp.full(gt_rigids.shape[:1], jnp.nan)
    mae, mse = masked_atom_error(pred_atom37, gt_atom37, atom37_mask)
    ca_mask = atom37_mask[..., 1]
    rmsd_sup = superimposed_rmsd_atom37(pred_atom37, gt_atom37, atom37_mask)
    return {
        "ave_rot": ave_rot[-1],
        "ave_trans": ave_trans[-1],
        "ref_ave_rot": ref_rot[-1],
        "ref_ave_trans": ref_trans[-1],
        "all_atom_mae": mae[-1],
        "all_atom_mse": mse[-1],
        "all_atom_rmsd": rmsd_sup[-1],
        "drmsd_ca": drmsd(
            pred_atom37[..., 1, :], gt_atom37[..., 1, :], ca_mask
        )[-1],
        "rmsd_ca": rmsd(pred_atom37[..., 1, :], gt_atom37[..., 1, :], ca_mask)[-1],
    }
