"""OmegaFold all-atom expansion in jnp (port step 6 of docs/OMEGAFOLD_PORT.md).

Functional equivalents of AAFrame.expand_w_torsion / expanded_to_pos
(/root/reference/src/toolbox/OmegaFold/omegafold/utils/protein_utils/
aaframe.py:716-808, 836-884) and torsion_mask_to_atom14_mask (:941-965).

OmegaFold chains its side-chain rigid groups with its OWN default-frame
tables and torsion ordering — NOT the AF2 convention in ops/frames (round-1
measurement: 11.6 A max deviation between the two on random inputs). The
constant tables (restype_aa_default_frame etc.) are loaded from
chem/omegafold_tables.npz, generated from the reference residue constants by
tools/gen_omegafold_tables.py.

Frames are (rots [..., 3, 3], trans [..., 3], mask [...]) triples in
Angstrom units throughout.
"""
from __future__ import annotations

import functools
import os

import jax.numpy as jnp
import numpy as np

_TABLES_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "chem", "omegafold_tables.npz",
)

GLY_IDX = 7  # 'G' in the OmegaFold/AF2 restype order


@functools.lru_cache(maxsize=1)
def _np_tables() -> dict:
    z = np.load(_TABLES_PATH)
    return {k: np.asarray(z[k]) for k in z.files}


def tables() -> dict:
    # Memoize NUMPY arrays only; convert per call. Caching jnp values is a
    # trap: jnp.asarray under an active jit trace returns a tracer, and a
    # memoized tracer poisons every later call with
    # jax.errors.UnexpectedTracerError when the FIRST caller was jitted.
    return {k: jnp.asarray(v) for k, v in _np_tables().items()}


def robust_normalize(x, eps: float = 4e-5):
    """x / clamp(|x|, 4e-5) (functions.robust_normalize, functions.py:47-62)."""
    return x / jnp.clip(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


def _mask_frames(rots, trans, mask):
    """The AAFrame 'safe' setters: masked rows get identity rotation and
    zero translation (aaframe.py:205-242)."""
    m = mask[..., None, None].astype(bool)
    rots = jnp.where(m, rots, jnp.eye(3, dtype=rots.dtype))
    trans = trans * mask[..., None].astype(trans.dtype)
    return rots, trans


def _compose(r1, t1, r2, t2):
    """Frame composition (aaframe.py:640-686): out = f1 ∘ f2."""
    r = jnp.einsum("...ij,...jk->...ik", r1, r2)
    t = t1 + jnp.einsum("...ij,...j->...i", r1, t2)
    return r, t


def rot_x_from_sin_cos(angles):
    """Rotation about the x-axis from (sin, cos) pairs
    (AAFrame.from_torsion, aaframe.py:482-523)."""
    sin, cos = angles[..., 0], angles[..., 1]
    zeros = jnp.zeros_like(sin)
    ones = jnp.ones_like(sin)
    return jnp.stack(
        [
            jnp.stack([ones, zeros, zeros], -1),
            jnp.stack([zeros, cos, -sin], -1),
            jnp.stack([zeros, sin, cos], -1),
        ],
        axis=-2,
    )


def expand_w_torsion(rots, trans, mask, torsion_angles, fasta):
    """Backbone frames + 7 torsions -> 8 per-group global frames.

    Mirrors AAFrame.expand_w_torsion (aaframe.py:716-808): prepend the
    backbone identity group, build x-rotations from the normalized angles,
    compose with the residue-type default frames, chain chi2..chi4 through
    chi1, then map everything into the global backbone frame.

    Args:
        rots [N, 3, 3], trans [N, 3] (Angstrom), mask [N]: backbone frames.
        torsion_angles [N, 7, 2] or [N, 5, 2] (zero-padded to 7 like the
            reference), fasta [N] int tokens.

    Returns:
        (rots8 [N, 8, 3, 3], trans8 [N, 8, 3], mask8 [N, 8])
    """
    t = tables()
    tors_mask = jnp.ones(torsion_angles.shape[:-1], bool)
    if torsion_angles.shape[-2] == 5:
        # zero-pad the two leading groups AND mask them out (aaframe.py:
        # 749-761 pads torsion_angles_mask with zeros too)
        torsion_angles = jnp.concatenate(
            [jnp.zeros_like(torsion_angles[..., 0:2, :]), torsion_angles],
            axis=-2,
        )
        tors_mask = jnp.concatenate(
            [jnp.zeros(tors_mask.shape[:-1] + (2,), bool), tors_mask], axis=-1
        )

    # prepend identity angle (0, 1) for backbone->backbone
    ident = jnp.broadcast_to(
        jnp.asarray([0.0, 1.0], torsion_angles.dtype),
        torsion_angles.shape[:-2] + (1, 2),
    )
    angles = jnp.concatenate([ident, torsion_angles], axis=-2)  # [N, 8, 2]
    mask8 = jnp.concatenate(
        [jnp.ones(angles.shape[:-2] + (1,), bool), tors_mask], axis=-1
    )

    angles = robust_normalize(angles)
    rx = rot_x_from_sin_cos(angles)  # [N, 8, 3, 3]
    rx, rx_t = _mask_frames(rx, jnp.zeros(angles.shape[:-1] + (3,)), mask8)

    # default frames in OmegaFold's own convention
    m4 = t["restype_aa_default_frame"][fasta]  # [N, 8, 4, 4]
    df_r, df_t = _mask_frames(m4[..., :3, :3], m4[..., :3, 3], mask8)

    all_r, all_t = _compose(df_r, df_t, rx, rx_t)

    # chain the side-chain groups: chiK-to-backbone = chi(K-1)-to-bb ∘ chiK
    c1r, c1t = all_r[..., 4, :, :], all_t[..., 4, :]
    c2r, c2t = _compose(c1r, c1t, all_r[..., 5, :, :], all_t[..., 5, :])
    c3r, c3t = _compose(c2r, c2t, all_r[..., 6, :, :], all_t[..., 6, :])
    c4r, c4t = _compose(c3r, c3t, all_r[..., 7, :, :], all_t[..., 7, :])
    all_r = jnp.concatenate(
        [all_r[..., :5, :, :], jnp.stack([c2r, c3r, c4r], axis=-3)], axis=-3
    )
    all_t = jnp.concatenate(
        [all_t[..., :5, :], jnp.stack([c2t, c3t, c4t], axis=-2)], axis=-2
    )
    # __setitem__ re-applies the safe setters with the (unchanged) mask
    all_r, all_t = _mask_frames(all_r, all_t, mask8)

    # into the global frame: bb ∘ group
    g_r, g_t = _compose(
        rots[..., None, :, :], trans[..., None, :], all_r, all_t
    )
    g_mask = mask[..., None].astype(bool) & mask8
    return g_r, g_t, g_mask


def expanded_to_pos(rots8, trans8, mask8, fasta):
    """8 global group frames -> atom14 positions + mask
    (AAFrame.expanded_to_pos, aaframe.py:836-884).

    Returns (pos14 [N, 14, 3], mask14 [N, 14] bool).
    """
    t = tables()
    residx2group = t["restype_atom14_to_aa"][fasta]  # [N, 14]
    group_mask = jnp.eye(8, dtype=rots8.dtype)[residx2group]  # [N, 14, 8]
    group_mask = group_mask * mask8[..., None, :].astype(rots8.dtype)

    # select each atom's group frame (one-hot weighted sum, frames zeroed
    # where masked — the reference's _tensor_multiplication semantics)
    sel_r = jnp.einsum("...gij,...ag->...aij", rots8, group_mask)
    sel_t = jnp.einsum("...gi,...ag->...ai", trans8, group_mask)
    sel_m = jnp.sum(mask8[..., None, :].astype(rots8.dtype) * group_mask, -1)

    lit = t["restype_atom14_aa_positions"][fasta]  # [N, 14, 3]
    pos14 = jnp.einsum("...aij,...aj->...ai", sel_r, lit) + sel_t
    pos14 = pos14 * sel_m[..., None]

    # torsion_mask_to_atom14_mask (aaframe.py:941-965)
    exist = jnp.sum(group_mask[..., 1:], axis=-1)
    exist = exist.at[..., 4].set((fasta != GLY_IDX).astype(exist.dtype))
    exist = jnp.concatenate(
        [
            jnp.broadcast_to(
                mask8[..., 0:1].astype(exist.dtype), exist[..., 0:3].shape
            ),
            exist[..., 3:],
        ],
        axis=-1,
    )
    return pos14, exist.astype(bool)


def frames_and_torsions_to_atom14(rots, trans, mask, torsion_angles, fasta):
    """Convenience: backbone frames + torsions -> (pos14, mask14), the tail
    of StructureModule.forward (decode.py:385-395)."""
    r8, t8, m8 = expand_w_torsion(rots, trans, mask, torsion_angles, fasta)
    return expanded_to_pos(r8, t8, m8, fasta)
