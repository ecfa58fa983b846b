"""All-atom <-> rigid-frame featurization geometry in pure jnp.

TPU-first reimplementation of the AF2/OpenFold featurization chain the
reference uses per data window (/root/reference/openfold/data/
data_transforms.py:755-1090, feats.py:165-267, src/data/all_atom.py):

    atom37 -> backbone + rigid-group frames        (atom37_to_frames)
    atom37 -> 7 torsion angles (+alt, +mask)       (atom37_to_torsion_angles)
    atom37 -> atom14 gt positions                  (atom37_to_atom14)
    rigids + torsions -> 8 frames -> atom14/atom37 (torsion_angles_to_frames,
                                                    frames_to_atom14_pos, ...)
    atom14 -> atom37                               (atom14_to_atom37)

Differences from the reference implementation (results identical, tested
against golden fixtures): python loops over residue types are replaced by
precomputed chem tables + jnp gathers; frames are carried as (rotmat, trans)
pairs internally (no lazy Rigid class juggling); everything is single-window
[N, ...] and meant to be vmap'ed over frames/batch.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from dynamicpdb_tpu.chem import constants as chem
from dynamicpdb_tpu.ops.rigid import Rigid

# ---------------------------------------------------------------------------
# static tables (numpy; jnp converts at trace time)
# ---------------------------------------------------------------------------
DEFAULT_FRAMES = np.asarray(chem.restype_rigid_group_default_frame)  # [21,8,4,4]
GROUP_IDX14 = np.asarray(chem.restype_atom14_to_rigid_group)  # [21,14]
GROUP_IDX37 = np.asarray(chem.restype_atom37_to_rigid_group)  # [21,37]
ATOM14_MASK = np.asarray(chem.restype_atom14_mask)  # [21,14]
ATOM37_MASK = np.asarray(chem.restype_atom37_mask)  # [21,37]
IDEAL_POS14 = np.asarray(chem.restype_atom14_rigid_group_positions)  # [21,14,3]
IDEAL_POS37 = np.asarray(chem.restype_atom37_rigid_group_positions)  # [21,37,3]
A14_TO_A37 = np.asarray(chem.restype_atom14_to_atom37)  # [21,14]
A37_TO_A14 = np.asarray(chem.restype_atom37_to_atom14)  # [21,37]
CHI_ATOM_IDX = np.asarray(chem.chi_atom_indices)  # [21,4,4]
CHI_MASK = np.asarray(chem.chi_angles_mask)  # [21,4]
CHI_PI_PERIODIC = np.asarray(chem.chi_pi_periodic)  # [21,4]
BASE_ATOM37_IDX = np.asarray(chem.rigidgroup_base_atom37_idx)  # [21,8,3]
GROUP_EXISTS = np.asarray(chem.rigidgroup_exists)  # [21,8]
GROUP_AMBIGUOUS = np.asarray(chem.rigidgroup_is_ambiguous)  # [21,8]


class Frames8(NamedTuple):
    """Rigid-group frames as explicit (rotation, translation) arrays."""

    rots: jnp.ndarray  # [..., N, 8, 3, 3]
    trans: jnp.ndarray  # [..., N, 8, 3]

    def to_tensor_4x4(self) -> jnp.ndarray:
        out = jnp.zeros(self.rots.shape[:-2] + (4, 4), self.rots.dtype)
        out = out.at[..., :3, :3].set(self.rots)
        out = out.at[..., :3, 3].set(self.trans)
        return out.at[..., 3, 3].set(1.0)


def _gram_schmidt(p_neg_x, origin, p_xy, eps=1e-8):
    """Rotation columns (e0, e1, e0 x e1); AF2 Algorithm 21."""
    e0 = origin - p_neg_x
    e1 = p_xy - origin
    e0 = e0 / jnp.sqrt(jnp.sum(e0 * e0, -1, keepdims=True) + eps)
    e1 = e1 - e0 * jnp.sum(e0 * e1, -1, keepdims=True)
    e1 = e1 / jnp.sqrt(jnp.sum(e1 * e1, -1, keepdims=True) + eps)
    e2 = jnp.cross(e0, e1)
    return jnp.stack([e0, e1, e2], axis=-1)


# ---------------------------------------------------------------------------
# atom37 -> frames
# ---------------------------------------------------------------------------
def atom37_to_frames(aatype, atom37, atom37_mask, eps: float = 1e-8):
    """Ground-truth rigid-group frames from atom37 coordinates.

    Parity target: data_transforms.atom37_to_frames (incl. the group-0
    (x, z) sign flip and the ambiguous-chi alternate frames).

    Returns dict with:
      gt_frames: Frames8 [..., N, 8]
      gt_exists: [..., N, 8]; group_exists: [..., N, 8]
      alt_gt_frames: Frames8; is_ambiguous: [..., N, 8]
      backbone_rigid: Rigid [..., N] (group 0, quat-native — what the
        DFOLD loader consumes as rigids_0)
    """
    base_idx = jnp.asarray(BASE_ATOM37_IDX)[aatype]  # [..., N, 8, 3]
    base_pos = jnp.take_along_axis(
        atom37[..., None, :, :],  # [..., N, 1, 37, 3]
        base_idx[..., None].astype(jnp.int32),  # [..., N, 8, 3, 1]
        axis=-2,
    )  # [..., N, 8, 3, 3] (last-2 dim: which of 3 base atoms)

    rots = _gram_schmidt(
        base_pos[..., 0, :], base_pos[..., 1, :], base_pos[..., 2, :], eps
    )
    trans = base_pos[..., 1, :]

    # group-0 fix-up: rotate 180deg about y (diag(-1, 1, -1) right-multiplied)
    flip = np.tile(np.eye(3, dtype=np.float32), (8, 1, 1))
    flip[0, 0, 0] = -1.0
    flip[0, 2, 2] = -1.0
    rots = rots @ jnp.asarray(flip)

    group_exists = jnp.asarray(GROUP_EXISTS)[aatype]
    atoms_exist = jnp.take_along_axis(
        atom37_mask[..., None, :], base_idx.astype(jnp.int32), axis=-1
    )  # [..., N, 8, 3]
    gt_exists = jnp.min(atoms_exist, axis=-1) * group_exists

    # alternate frames for 180deg-symmetric terminal chis: right-multiply
    # diag(1, -1, -1) on the ambiguous group
    ambig = jnp.asarray(GROUP_AMBIGUOUS)[aatype]  # [..., N, 8]
    swap = np.diag([1.0, -1.0, -1.0]).astype(np.float32)
    alt_rots = jnp.where(
        ambig[..., None, None] > 0, rots @ jnp.asarray(swap), rots
    )

    backbone = Rigid.from_rotmat(rots[..., 0, :, :], trans[..., 0, :])
    return {
        "gt_frames": Frames8(rots, trans),
        "gt_exists": gt_exists,
        "group_exists": group_exists,
        "alt_gt_frames": Frames8(alt_rots, trans),
        "is_ambiguous": ambig,
        "backbone_rigid": backbone,
    }


# ---------------------------------------------------------------------------
# atom37 -> torsion angles
# ---------------------------------------------------------------------------
def atom37_to_torsion_angles(aatype, atom37, atom37_mask):
    """(pre_omega, phi, psi, chi1..4) sin/cos + alt + mask.

    Parity target: data_transforms.atom37_to_torsion_angles (incl. the psi
    sign flip and pi-periodic chi mirroring). Residue axis is -2 of atom37's
    batch shape; leading dims broadcast.
    """
    aatype = jnp.clip(aatype, 0, 20)
    pad_pos = jnp.zeros_like(atom37[..., :1, :, :])
    prev_pos = jnp.concatenate([pad_pos, atom37[..., :-1, :, :]], axis=-3)
    pad_mask = jnp.zeros_like(atom37_mask[..., :1, :])
    prev_mask = jnp.concatenate([pad_mask, atom37_mask[..., :-1, :]], axis=-2)

    # backbone dihedral atom quadruples
    pre_omega_pos = jnp.concatenate(
        [prev_pos[..., 1:3, :], atom37[..., :2, :]], axis=-2
    )
    phi_pos = jnp.concatenate(
        [prev_pos[..., 2:3, :], atom37[..., :3, :]], axis=-2
    )
    psi_pos = jnp.concatenate(
        [atom37[..., :3, :], atom37[..., 4:5, :]], axis=-2
    )
    pre_omega_mask = jnp.prod(prev_mask[..., 1:3], -1) * jnp.prod(
        atom37_mask[..., :2], -1
    )
    phi_mask = prev_mask[..., 2] * jnp.prod(atom37_mask[..., :3], -1)
    psi_mask = jnp.prod(atom37_mask[..., :3], -1) * atom37_mask[..., 4]

    # chi dihedral quadruples via table gather
    chi_idx = jnp.asarray(CHI_ATOM_IDX)[aatype]  # [..., N, 4, 4]
    chi_pos = jnp.take_along_axis(
        atom37[..., None, :, :],
        chi_idx[..., None].astype(jnp.int32),
        axis=-2,
    )  # [..., N, 4, 4, 3]
    chi_mask = jnp.asarray(CHI_MASK)[aatype] * jnp.prod(
        jnp.take_along_axis(
            atom37_mask[..., None, :], chi_idx.astype(jnp.int32), axis=-1
        ),
        axis=-1,
    )

    torsion_pos = jnp.concatenate(
        [
            pre_omega_pos[..., None, :, :],
            phi_pos[..., None, :, :],
            psi_pos[..., None, :, :],
            chi_pos,
        ],
        axis=-3,
    )  # [..., N, 7, 4, 3]
    torsion_mask = jnp.concatenate(
        [
            pre_omega_mask[..., None],
            phi_mask[..., None],
            psi_mask[..., None],
            chi_mask,
        ],
        axis=-1,
    )

    # dihedral via the torsion frame trick: frame from atoms (1, 2 | 0),
    # express atom 3 in it; sin = z, cos = y
    rots = _gram_schmidt(
        torsion_pos[..., 1, :], torsion_pos[..., 2, :], torsion_pos[..., 0, :]
    )
    rel = jnp.einsum(
        "...ji,...j->...i", rots, torsion_pos[..., 3, :] - torsion_pos[..., 2, :]
    )
    sin_cos = jnp.stack([rel[..., 2], rel[..., 1]], axis=-1)
    denom = jnp.sqrt(jnp.sum(sin_cos**2, -1, keepdims=True) + 1e-8)
    sin_cos = sin_cos / denom
    # psi sign flip (AF2 convention)
    sin_cos = sin_cos * jnp.asarray(
        [1.0, 1.0, -1.0, 1.0, 1.0, 1.0, 1.0]
    )[..., :, None]

    chi_is_ambiguous = jnp.asarray(CHI_PI_PERIODIC)[aatype]
    mirror = jnp.concatenate(
        [jnp.ones(aatype.shape + (3,)), 1.0 - 2.0 * chi_is_ambiguous], axis=-1
    )
    alt_sin_cos = sin_cos * mirror[..., None]

    return {
        "torsion_angles_sin_cos": sin_cos,
        "alt_torsion_angles_sin_cos": alt_sin_cos,
        "torsion_angles_mask": torsion_mask,
    }


# ---------------------------------------------------------------------------
# rigids + torsions -> frames -> atoms
# ---------------------------------------------------------------------------
def torsion_angles_to_frames(bb: Rigid, angles: jnp.ndarray, aatype) -> Frames8:
    """Backbone rigid + 7 torsions -> all 8 rigid-group frames in global
    coordinates (feats.py:165-228 / src/data/all_atom.py:25-98)."""
    default = jnp.asarray(DEFAULT_FRAMES)[aatype]  # [..., N, 8, 4, 4]
    def_rots = default[..., :3, :3]
    def_trans = default[..., :3, 3]

    # x-axis rotation per group from (sin, cos); group 0 fixed to identity
    bb_rot = jnp.zeros_like(angles[..., :1, :]).at[..., 1].set(1.0)
    alpha = jnp.concatenate([bb_rot, angles], axis=-2)  # [..., N, 8, 2]
    sin_a, cos_a = alpha[..., 0], alpha[..., 1]
    zeros = jnp.zeros_like(sin_a)
    ones = jnp.ones_like(sin_a)
    x_rot = jnp.stack(
        [
            ones, zeros, zeros,
            zeros, cos_a, -sin_a,
            zeros, sin_a, cos_a,
        ],
        axis=-1,
    ).reshape(sin_a.shape + (3, 3))

    rots = def_rots @ x_rot  # frame-to-parent rotations
    trans = def_trans

    # chain chi2<-chi1, chi3<-chi2, chi4<-chi3 into backbone coords
    def compose(r1, t1, r2, t2):
        return r1 @ r2, jnp.einsum("...ij,...j->...i", r1, t2) + t1

    chi1_r, chi1_t = rots[..., 4, :, :], trans[..., 4, :]
    chi2_r, chi2_t = compose(chi1_r, chi1_t, rots[..., 5, :, :], trans[..., 5, :])
    chi3_r, chi3_t = compose(chi2_r, chi2_t, rots[..., 6, :, :], trans[..., 6, :])
    chi4_r, chi4_t = compose(chi3_r, chi3_t, rots[..., 7, :, :], trans[..., 7, :])

    all_r = jnp.concatenate(
        [rots[..., :5, :, :], jnp.stack([chi2_r, chi3_r, chi4_r], axis=-3)],
        axis=-3,
    )
    all_t = jnp.concatenate(
        [trans[..., :5, :], jnp.stack([chi2_t, chi3_t, chi4_t], axis=-2)],
        axis=-2,
    )

    # lift to global frame with the backbone rigid
    bb_r = bb.rotmat()[..., None, :, :]
    bb_t = bb.trans[..., None, :]
    glob_r = bb_r @ all_r
    glob_t = jnp.einsum("...ij,...j->...i", bb_r, all_t) + bb_t
    return Frames8(glob_r, glob_t)


def _frames_to_atom_pos(frames: Frames8, aatype, group_idx, ideal_pos, atom_mask):
    group = jnp.asarray(group_idx)[aatype]  # [..., N, A]
    # gather each atom's parent frame
    r = jnp.take_along_axis(
        frames.rots, group[..., None, None].astype(jnp.int32), axis=-3
    )  # [..., N, A, 3, 3]
    t = jnp.take_along_axis(
        frames.trans, group[..., None].astype(jnp.int32), axis=-2
    )  # [..., N, A, 3]
    pos = jnp.asarray(ideal_pos)[aatype]  # [..., N, A, 3]
    out = jnp.einsum("...ij,...j->...i", r, pos) + t
    return out * jnp.asarray(atom_mask)[aatype][..., None]


def frames_to_atom14_pos(frames: Frames8, aatype) -> jnp.ndarray:
    """Idealized atom14 coordinates from rigid-group frames
    (all_atom.py:114-154)."""
    return _frames_to_atom_pos(frames, aatype, GROUP_IDX14, IDEAL_POS14, ATOM14_MASK)


def frames_to_atom37_pos(frames: Frames8, aatype) -> jnp.ndarray:
    """Idealized atom37 coordinates (all_atom.py:200-230)."""
    return _frames_to_atom_pos(frames, aatype, GROUP_IDX37, IDEAL_POS37, ATOM37_MASK)


# ---------------------------------------------------------------------------
# atom14 <-> atom37
# ---------------------------------------------------------------------------
def atom14_to_atom37(atom14: jnp.ndarray, aatype):
    """[..., N, 14, ...] -> [..., N, 37, ...] + mask
    (Dfold_network_dynamic.py:574-594)."""
    idx = jnp.asarray(A37_TO_A14)[aatype]  # [..., N, 37]
    extra = atom14.ndim - idx.ndim  # trailing dims beyond the atom axis
    gather_idx = idx.reshape(idx.shape + (1,) * extra).astype(jnp.int32)
    atom37 = jnp.take_along_axis(atom14, gather_idx, axis=idx.ndim - 1)
    mask = jnp.asarray(ATOM37_MASK)[aatype]
    return atom37 * mask.reshape(mask.shape + (1,) * extra), mask


def atom37_to_atom14(atom37: jnp.ndarray, aatype, atom37_mask):
    """Ground-truth atom14 positions/mask from atom37
    (data_transforms.make_atom14_masks/positions essentials)."""
    idx = jnp.asarray(A14_TO_A37)[aatype]  # [..., N, 14]
    restype_mask = jnp.asarray(ATOM14_MASK)[aatype]
    exists = restype_mask * jnp.take_along_axis(
        atom37_mask, idx.astype(jnp.int32), axis=-1
    )
    pos = jnp.take_along_axis(atom37, idx[..., None].astype(jnp.int32), axis=-2)
    return pos * exists[..., None], exists


def compute_backbone_atom37(bb: Rigid, aatype, torsions) -> tuple:
    """Rigids + torsions -> atom37 (all_atom.compute_backbone_atom37)."""
    frames = torsion_angles_to_frames(bb, torsions, aatype)
    atom37 = frames_to_atom37_pos(frames, aatype)
    mask = jnp.any(atom37 != 0, axis=-1)
    return atom37, mask
