"""Teacher-forced decomposition of all-atom error.

The eval metrics of record include all-atom MAE/RMSD computed between the
model's idealized-geometry reconstruction (rigids + 7 torsions -> literature
atom positions, ops/frames.py) and raw GT atom coordinates (reference
comparison surface: train_DFOLD_dynamics.py:892-925). Whenever the GT atoms
are not themselves in the image of that decoder (real MD bond lengths/angles
fluctuate; synthetic data may scatter side chains), there is an IRREDUCIBLE
reconstruction floor that no model can beat.

This module isolates where all-atom error comes from by rebuilding atoms
from every combination of {GT, predicted} rigids x {GT, predicted} torsions:

  floor        = decode(GT rigids,   GT torsions)   vs GT atoms
  rigids_only  = decode(pred rigids, GT torsions)   vs GT atoms
  torsion_only = decode(GT rigids,   pred torsions) vs GT atoms
  model        = decode(pred rigids, pred torsions) vs GT atoms

If model ~= floor, the rigid/torsion -> atom path is not the problem — the
error is data representability. If rigids_only >> floor, the frame channel
is at fault; if torsion_only >> floor, the torsion head is.

Used by tools/train_proof.py (committed artifact) and tests/test_overfit.py.
"""
from __future__ import annotations

import jax.numpy as jnp

from dynamicpdb_tpu.analysis.metrics import (
    masked_atom_error, superimposed_rmsd_atom37,
)
from dynamicpdb_tpu.ops import frames as frame_ops
from dynamicpdb_tpu.ops.rigid import Rigid


def _decode_atom37(rigids7, angles, aatype):
    rig = Rigid.from_tensor_7(rigids7)
    all_frames = frame_ops.torsion_angles_to_frames(rig, angles, aatype)
    atom14 = frame_ops.frames_to_atom14_pos(all_frames, aatype)
    atom37, _ = frame_ops.atom14_to_atom37(atom14, aatype)
    return atom37


def _errors(pred37, gt37, mask37):
    mae, mse = masked_atom_error(pred37, gt37, mask37)
    sup = superimposed_rmsd_atom37(pred37, gt37, mask37)
    return {"mae": mae[-1], "rmsd": sup[-1]}  # jnp scalars (jit-safe)


def atom_error_decomposition(feats, model_out=None):
    """Last-frame all-atom error decomposition for one window.

    feats: featurized window (featurize_window output) with rigids_0,
    torsion_angles_sin_cos, aatype, atom37_pos, atom37_mask.
    model_out: optional score_forward output with 'rigids' and 'angles'.
    """
    aatype = feats["aatype"]
    gt37 = feats["atom37_pos"]
    mask37 = jnp.broadcast_to(
        feats["atom37_mask"], gt37.shape[:-1]
    ).astype(jnp.float32)
    gt_rigids = feats["rigids_0"]
    gt_angles = feats["torsion_angles_sin_cos"]

    out = {
        "floor": _errors(
            _decode_atom37(gt_rigids, gt_angles, aatype), gt37, mask37
        )
    }
    if model_out is not None:
        pred_rigids = model_out["rigids"]
        pred_angles = model_out["angles"]
        out["rigids_only"] = _errors(
            _decode_atom37(pred_rigids, gt_angles, aatype), gt37, mask37
        )
        out["torsion_only"] = _errors(
            _decode_atom37(gt_rigids, pred_angles, aatype), gt37, mask37
        )
        out["model"] = _errors(
            _decode_atom37(pred_rigids, pred_angles, aatype), gt37, mask37
        )
    return out
