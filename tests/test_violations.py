"""Golden parity for the AF2 violation metrics vs the reference torch
implementation (openfold loss.py find_structural_violations_np +
compute_violation_metrics_np — the exact stack behind the reference's
get_violation_metrics, amber_minimize.py:354-403)."""
import os
import sys
import types

import numpy as np
import pytest

from dynamicpdb_tpu.analysis import violations as V
from dynamicpdb_tpu.data.synthetic import make_window

ref_available = os.path.isdir("/root/reference")

if ref_available:
    for name in ["Bio", "Bio.PDB", "Bio.PDB.Chain"]:
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["Bio.PDB"].PDBParser = object
    sys.modules["Bio"].PDB = sys.modules["Bio.PDB"]
    sys.modules["Bio.PDB.Chain"].Chain = object
    sys.path.insert(0, "/root/reference")
    import torch  # noqa: F401


def _ref_metrics(atom37, mask37, aatype, residue_index):
    import ml_collections

    from openfold.data.data_transforms import (
        make_atom14_masks,
        make_atom14_positions,
    )
    from openfold.utils import loss as ref_loss

    batch = {
        "aatype": torch.tensor(aatype),
        "all_atom_positions": torch.tensor(atom37),
        "all_atom_mask": torch.tensor(mask37),
        "residue_index": torch.tensor(residue_index),
        "seq_mask": torch.ones(len(aatype)),
    }
    batch = make_atom14_positions(make_atom14_masks(batch))
    batch = {k: np.asarray(v) for k, v in batch.items()}
    violations = ref_loss.find_structural_violations_np(
        batch=batch,
        atom14_pred_positions=batch["atom14_gt_positions"],
        config=ml_collections.ConfigDict(
            {"violation_tolerance_factor": 12,
             "clash_overlap_tolerance": 1.5}
        ),
    )
    metrics = ref_loss.compute_violation_metrics_np(
        batch=batch,
        atom14_pred_positions=batch["atom14_gt_positions"],
        violations=violations,
    )
    return violations, metrics


def _cases():
    # clean helix, distorted helix (clashes), compressed coords (bond+clash
    # violations), and a proline-rich random-coil
    cases = []
    w = make_window(n_res=24, frame_time=1, seed=5)
    cases.append(("helix", w["atom37"][0], w["atom37_mask"], w["aatype"]))
    rng = np.random.default_rng(0)
    noisy = w["atom37"][0] + rng.normal(size=w["atom37"][0].shape) * 0.8
    noisy *= w["atom37_mask"][..., None]
    cases.append(("noisy", noisy.astype(np.float32), w["atom37_mask"],
                  w["aatype"]))
    squeezed = (w["atom37"][0] * 0.55).astype(np.float32)
    cases.append(("squeezed", squeezed, w["atom37_mask"], w["aatype"]))
    w2 = make_window(n_res=20, frame_time=1, seed=9)
    aatype = w2["aatype"].copy()
    aatype[::3] = 14  # prolines exercise the C-N(pro) bond stats
    from dynamicpdb_tpu.chem import constants as chem

    mask37 = np.asarray(chem.restype_atom37_mask)[aatype].astype(np.float32)
    atoms = (w2["atom37"][0] * mask37[..., None]).astype(np.float32)
    cases.append(("prolines", atoms, mask37, aatype))
    return cases


@pytest.mark.skipif(not ref_available, reason="reference not mounted")
@pytest.mark.parametrize("name,atom37,mask37,aatype", _cases())
def test_violation_metrics_match_reference(name, atom37, mask37, aatype):
    residue_index = np.arange(len(aatype), dtype=np.int64)
    ref_viol, ref_metrics = _ref_metrics(
        atom37, mask37, aatype.astype(np.int64), residue_index
    )
    got = V.compute_violation_metrics(
        atom37, mask37, aatype.astype(np.int64), residue_index
    )
    for k in (
        "violations_extreme_ca_ca_distance",
        "violations_between_residue_bond",
        "violations_between_residue_clash",
        "violations_within_residue",
        "violations_per_residue",
    ):
        np.testing.assert_allclose(
            got[k], float(ref_metrics[k]), atol=1e-5, err_msg=f"{name}:{k}"
        )
    np.testing.assert_array_equal(
        got["residue_violations"],
        np.flatnonzero(ref_viol["total_per_residue_violations_mask"]),
        err_msg=name,
    )
    gv = got["structural_violations"]["between_residues"]
    rv = ref_viol["between_residues"]
    for k in ("bonds_c_n_loss_mean", "angles_ca_c_n_loss_mean",
              "angles_c_n_ca_loss_mean", "clashes_mean_loss"):
        np.testing.assert_allclose(gv[k], rv[k], atol=1e-5,
                                   err_msg=f"{name}:{k}")
    np.testing.assert_allclose(
        gv["clashes_per_atom_loss_sum"], rv["clashes_per_atom_loss_sum"],
        atol=1e-4, err_msg=name,
    )
    np.testing.assert_allclose(
        got["structural_violations"]["within_residues"]["per_atom_loss_sum"],
        ref_viol["within_residues"]["per_atom_loss_sum"],
        atol=1e-4, err_msg=name,
    )
