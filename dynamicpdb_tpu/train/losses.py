"""Training losses for the trajectory-diffusion model.

Reproduces the reference's effective loss (train_DFOLD_dynamics.py:1182-1400
with the release hyperparameters from run_train.sh:18-22):

    loss = rot_score MSE / scaling^2      (weight 7,  last frame only)
         + trans x0 MSE                   (weight 100, last frame only)
         + torsion angle loss             (weight 1,  last frame only)

with the reference's guards: rot loss gated by t > rot_loss_t_threshold, and
rot+trans zeroed when the WEIGHTED trans loss >= 100 — i.e. unweighted
trans MSE >= 100/trans_loss_weight (= 1 A^2 at the release weight 100; the
threshold moves with the weight). Torsion survives outlier batches (the
reference's guards are sequential, see below). bb-atom and distance-matrix losses are
computed-but-excluded in the reference final sum (train:1367-1373); we expose
them as aux metrics behind flags for the same reason.

All functions take ONE window ([F, N, ...]); vmap over the batch outside.
"""
from __future__ import annotations

import jax.numpy as jnp

from dynamicpdb_tpu.config import ExperimentConfig


def torsion_angle_loss(a, a_gt, a_alt_gt, mask, eps: float = 1e-8):
    """Per-frame AF2 torsion loss (openfold/utils/loss.py:52-76 variant with
    masked normalization). a: [F, N, 7, 2]. Returns [F].

    The squared distances are computed WITHOUT the intermediate norm: the
    sqrt's gradient is NaN exactly at a == a_gt, which a converged/overfit
    model reaches (torch.norm zeroes that subgradient; jnp.linalg.norm does
    not). Same value, finite gradient everywhere."""
    norm = jnp.sqrt(jnp.sum(a**2, axis=-1) + eps**2)
    a = a / (norm[..., None] + eps)
    diff_gt = jnp.sum((a - a_gt) ** 2, axis=-1)
    diff_alt = jnp.sum((a - a_alt_gt) ** 2, axis=-1)
    min_diff = jnp.minimum(diff_gt, diff_alt)
    denom = jnp.sum(mask, axis=(-1, -2)) + 1e-2
    l_torsion = jnp.sum(min_diff * mask, axis=(-1, -2)) / denom
    # an_weight = 0.0 in the reference — angle-norm term dropped
    return l_torsion


def dfold_loss(model_out, batch, conf: ExperimentConfig):
    """Window loss + aux dict. Frame axis = dim 0; loss on the last frame."""
    bb_mask = batch["res_mask"].astype(jnp.float32)  # [F, N]
    diffuse_mask = 1 - batch["fixed_mask"].astype(jnp.float32)
    loss_mask = bb_mask * diffuse_mask
    t = batch["t"]

    # torsion ------------------------------------------------------------
    torsion_all = torsion_angle_loss(
        model_out["angles"],
        batch["torsion_angles_sin_cos"],
        batch["alt_torsion_angles_sin_cos"],
        batch["torsion_angles_mask"],
    )
    torsion_loss = torsion_all[-1] * conf.torsion_loss_weight

    # translation x0 ------------------------------------------------------
    # The reference takes an UNMASKED mean (train:1248) — but it never pads,
    # so masking by loss_mask is a strict generalization: identical when
    # every residue is real, and it keeps the effective trans weight
    # independent of pad_to (see tests/test_pad_invariance.py).
    gt_trans_x0 = batch["rigids_0"][..., 4:]
    pred_trans_x0 = model_out["rigids"][..., 4:]
    tmask = loss_mask[-1][..., None]
    trans_loss = (
        jnp.sum((gt_trans_x0[-1] - pred_trans_x0[-1]) ** 2 * tmask)
        / (3.0 * jnp.sum(loss_mask[-1]) + 1e-10)
    ) * conf.trans_loss_weight

    # rotation score ------------------------------------------------------
    gt_rot_score = batch["rot_score"]
    pred_rot_score = model_out["rot_score"] * diffuse_mask[..., None]
    rot_scaling = batch["rot_score_scaling"]  # [F] or scalar
    rot_scaling = jnp.broadcast_to(jnp.asarray(rot_scaling), t.shape)
    rot_mse = (gt_rot_score - pred_rot_score) ** 2 * loss_mask[..., None]
    rot_all = jnp.sum(rot_mse, axis=(-1, -2)) / (
        jnp.sum(loss_mask, axis=-1) + 1e-10
    ) / rot_scaling**2
    rot_all = rot_all * conf.rot_loss_weight * (t > conf.rot_loss_t_threshold)
    rot_loss = rot_all[-1]

    # outlier guard (train:1338-1340). NOTE the reference's guards are
    # SEQUENTIAL: trans_loss is reassigned (possibly to 0) before the
    # torsion guard reads it, so `torsion_loss * (trans_loss < 100)` is
    # always a no-op — torsion survives outlier batches. Found by the
    # optimization-dynamics parity harness (tools/parity_training.py);
    # mirrored exactly here.
    guard = (trans_loss < 100.0).astype(jnp.float32)
    rot_loss = rot_loss * guard
    trans_loss = trans_loss * guard

    total = rot_loss + trans_loss + torsion_loss
    aux = {
        "total_loss": total,
        "rot_loss": rot_loss,
        "trans_loss": trans_loss,
        "torsion_loss": torsion_loss,
    }
    return total, aux
