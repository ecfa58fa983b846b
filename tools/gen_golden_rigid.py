"""Golden fixtures for Rigid algebra + torsion loss parity vs the reference.

Runs the reference's openfold rigid_utils (torch) and torsion_angle_loss on
random inputs; our jnp implementations must match numerically
(tests/test_rigid_golden.py). Executes the reference only to capture
numbers; nothing is copied.
"""
import sys
import types

import numpy as np
import torch

for name in ["Bio", "Bio.PDB"]:
    sys.modules.setdefault(name, types.ModuleType(name))
sys.modules["Bio.PDB"].PDBParser = object

sys.path.insert(0, "/root/reference")
from openfold.utils import rigid_utils as ru  # noqa: E402
from openfold.utils.loss import torsion_angle_loss  # noqa: E402

torch.manual_seed(0)
rng = np.random.default_rng(0)
N = 32

quat = rng.normal(size=(N, 4))
quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
trans = rng.normal(size=(N, 3)) * 6
t7 = np.concatenate([quat, trans], -1)
rig = ru.Rigid.from_tensor_7(torch.tensor(t7), normalize_quats=True)

update = rng.normal(size=(N, 6)) * 0.3
composed = rig.compose_q_update_vec(torch.tensor(update))

pts = rng.normal(size=(N, 3)) * 4
applied = rig.apply(torch.tensor(pts))
inv_applied = rig.invert_apply(torch.tensor(pts))

quat2 = rng.normal(size=(N, 4))
quat2 /= np.linalg.norm(quat2, axis=-1, keepdims=True)
qmul = ru.quat_multiply(torch.tensor(quat), torch.tensor(quat2))
qinv = ru.invert_quat(torch.tensor(quat))

# torsion loss golden (incl. near-exact-match inputs where our sqrt-free
# gradient form must still agree on the VALUE)
a = rng.normal(size=(2, N, 7, 2))
a_gt = a + rng.normal(size=a.shape) * np.array([0.3, 1e-9])[rng.integers(0, 2, (2, N, 7, 1))]
a_alt = rng.normal(size=a.shape)
mask = (rng.random((2, N, 7)) > 0.2).astype(np.float64)
tl = torsion_angle_loss(
    torch.tensor(a), torch.tensor(a_gt), torch.tensor(a_alt), torch.tensor(mask)
)

np.savez_compressed(
    "tests/goldens/rigid_golden.npz",
    t7=t7, update=update, pts=pts, quat2=quat2,
    composed_t7=composed.to_tensor_7().numpy(),
    applied=applied.numpy(), inv_applied=inv_applied.numpy(),
    qmul=qmul.numpy(), qinv=qinv.numpy(),
    loss_a=a, loss_a_gt=a_gt, loss_a_alt=a_alt, loss_mask=mask,
    torsion_loss=tl.numpy(),
)
print("wrote tests/goldens/rigid_golden.npz")
