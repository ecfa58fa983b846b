"""Generate golden parity fixtures for the featurization geometry.

Runs the REFERENCE openfold (torch) featurization chain on random synthetic
atom37 inputs and saves inputs+outputs to tests/goldens/frames_golden.npz.
Our jnp implementation must reproduce these numerically (tests/test_frames.py).

This script only *executes* the reference to capture numeric ground truth;
no reference code is copied into the framework.
"""
import sys
import types

import numpy as np
import torch

# stub Bio so openfold.np package imports without Biopython
for name in ["Bio", "Bio.PDB", "Bio.PDB.PDBParser"]:
    sys.modules.setdefault(name, types.ModuleType(name))
sys.modules["Bio.PDB"].PDBParser = object

sys.path.insert(0, "/root/reference")
from openfold.data import data_transforms  # noqa: E402
from openfold.np import residue_constants as rc  # noqa: E402
from openfold.utils import feats as of_feats  # noqa: E402
from openfold.utils.rigid_utils import Rigid  # noqa: E402

torch.manual_seed(0)
rng = np.random.default_rng(0)

N = 24
# all 20 restypes + UNK, shuffled
aatype = rng.permutation(np.concatenate([np.arange(21), rng.integers(0, 21, N - 21)]))
atom37_mask = rc.STANDARD_ATOM_MASK[aatype].astype(np.float64)
# drop a few atoms to exercise masking edge cases (keep backbone of res 0)
drop = rng.random(atom37_mask.shape) < 0.05
drop[:, :5] = False
atom37_mask = atom37_mask * (1 - drop)
atom37 = rng.normal(size=(N, 37, 3)) * 5.0 * atom37_mask[..., None]

prot = {
    "aatype": torch.tensor(aatype).long(),
    "all_atom_positions": torch.tensor(atom37),
    "all_atom_mask": torch.tensor(atom37_mask),
}
prot = data_transforms.atom37_to_frames(dict(prot))
prot = data_transforms.make_atom14_masks(prot)
prot = data_transforms.make_atom14_positions(prot)
prot = data_transforms.atom37_to_torsion_angles()(prot)

out = {
    "aatype": aatype,
    "atom37": atom37,
    "atom37_mask": atom37_mask,
    "rigidgroups_gt_frames": prot["rigidgroups_gt_frames"].numpy(),
    "rigidgroups_gt_exists": prot["rigidgroups_gt_exists"].numpy(),
    "rigidgroups_alt_gt_frames": prot["rigidgroups_alt_gt_frames"].numpy(),
    "rigidgroups_is_ambiguous": prot["rigidgroups_group_is_ambiguous"].numpy(),
    "torsion_angles_sin_cos": prot["torsion_angles_sin_cos"].numpy(),
    "alt_torsion_angles_sin_cos": prot["alt_torsion_angles_sin_cos"].numpy(),
    "torsion_angles_mask": prot["torsion_angles_mask"].numpy(),
    "atom14_gt_positions": prot["atom14_gt_positions"].numpy(),
    "atom14_gt_exists": prot["atom14_gt_exists"].numpy(),
    "residx_atom14_to_atom37": prot["residx_atom14_to_atom37"].numpy(),
}

# torsion_angles_to_frames + frames_to_atom14 golden with random rigids/angles
quat = rng.normal(size=(N, 4))
quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
trans = rng.normal(size=(N, 3)) * 8
rr = Rigid.from_tensor_7(
    torch.tensor(np.concatenate([quat, trans], -1)), normalize_quats=True
)
angles = rng.normal(size=(N, 7, 2))
angles /= np.linalg.norm(angles, axis=-1, keepdims=True)
default_frames = torch.tensor(rc.restype_rigid_group_default_frame)
all_frames = of_feats.torsion_angles_to_frames(
    rr, torch.tensor(angles), torch.tensor(aatype).long(), default_frames
)
atom14 = of_feats.frames_and_literature_positions_to_atom14_pos(
    all_frames,
    torch.tensor(aatype).long(),
    default_frames,
    torch.tensor(rc.restype_atom14_to_rigid_group),
    torch.tensor(rc.restype_atom14_mask),
    torch.tensor(rc.restype_atom14_rigid_group_positions),
)
out.update(
    {
        "taf_quat": quat,
        "taf_trans": trans,
        "taf_angles": angles,
        "taf_all_frames": all_frames.to_tensor_4x4().numpy(),
        "taf_atom14": atom14.numpy(),
    }
)

np.savez_compressed("tests/goldens/frames_golden.npz", **out)
print("wrote tests/goldens/frames_golden.npz")
for k, v in out.items():
    print(" ", k, v.shape)
