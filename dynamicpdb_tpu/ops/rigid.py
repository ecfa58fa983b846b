"""Quaternion-native SE(3) rigid transforms as a JAX pytree.

TPU-first redesign of the reference's openfold ``Rigid``/``Rotation`` pair
(/root/reference/openfold/utils/rigid_utils.py:289-1448): instead of a class
that lazily swaps between rotation-matrix and quaternion storage on CPU, we
keep a single canonical representation — unit quaternion [..., 4] (scalar
first) plus translation [..., 3] — registered as a pytree so it moves through
jit/vmap/scan/shard_map like any array. Rotation matrices are materialized
on demand (cheap, fuses into downstream matmuls under XLA).

Tensor-7 layout (quat ++ trans) matches the reference's
``Rigid.to_tensor_7``/``from_tensor_7`` (rigid_utils.py:1200-1230) so feature
dicts are interchangeable at the array level.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from dynamicpdb_tpu.ops import so3


@jax.tree_util.register_pytree_node_class
class Rigid:
    """Batch of rigid transforms; shape = broadcast batch dims of quat/trans."""

    def __init__(self, quat: jnp.ndarray, trans: jnp.ndarray):
        self.quat = quat  # [..., 4]
        self.trans = trans  # [..., 3]

    # -- pytree plumbing ----------------------------------------------------
    def tree_flatten(self):
        return (self.quat, self.trans), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- constructors ---------------------------------------------------------
    @classmethod
    def identity(cls, batch_shape, dtype=jnp.float32) -> "Rigid":
        quat = jnp.zeros(tuple(batch_shape) + (4,), dtype).at[..., 0].set(1.0)
        trans = jnp.zeros(tuple(batch_shape) + (3,), dtype)
        return cls(quat, trans)

    @classmethod
    def from_tensor_7(cls, t: jnp.ndarray, normalize: bool = True) -> "Rigid":
        quat = t[..., :4]
        if normalize:
            quat = so3.quat_normalize(quat)
        return cls(quat, t[..., 4:])

    def to_tensor_7(self) -> jnp.ndarray:
        return jnp.concatenate([self.quat, self.trans], axis=-1)

    @classmethod
    def from_tensor_4x4(cls, t: jnp.ndarray) -> "Rigid":
        return cls(so3.rotmat_to_quat(t[..., :3, :3]), t[..., :3, 3])

    def to_tensor_4x4(self) -> jnp.ndarray:
        rot = self.rotmat()
        bottom = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 0.0, 1.0], rot.dtype),
            rot.shape[:-2] + (1, 4),
        )
        top = jnp.concatenate([rot, self.trans[..., None]], axis=-1)
        return jnp.concatenate([top, bottom], axis=-2)

    @classmethod
    def from_rotmat(cls, m: jnp.ndarray, trans: jnp.ndarray) -> "Rigid":
        return cls(so3.rotmat_to_quat(m), trans)

    @classmethod
    def from_3_points(
        cls,
        p_neg_x_axis: jnp.ndarray,
        origin: jnp.ndarray,
        p_xy_plane: jnp.ndarray,
        eps: float = 1e-8,
    ) -> "Rigid":
        """Gram-Schmidt frame construction (AF2 Algorithm 21).

        Same convention as the reference (rigid_utils.py:1233-1275):
        e0 = normalize(origin - p_neg_x_axis), e1 ⟂ e0 toward p_xy_plane,
        rotation columns are (e0, e1, e0 x e1), translation = origin.
        Delegates to ops.frames._gram_schmidt — ONE implementation of the
        construction (an eps/degeneracy fix must not silently diverge
        between the frame featurizer and Rigid consumers).
        """
        from dynamicpdb_tpu.ops.frames import _gram_schmidt

        rot = _gram_schmidt(p_neg_x_axis, origin, p_xy_plane, eps=eps)
        return cls(so3.rotmat_to_quat(rot), origin)

    # -- core ops -------------------------------------------------------------
    @property
    def shape(self):
        return jnp.broadcast_shapes(self.quat.shape[:-1], self.trans.shape[:-1])

    @property
    def dtype(self):
        return self.quat.dtype

    def rotmat(self) -> jnp.ndarray:
        return so3.quat_to_rotmat(self.quat)

    def apply(self, pts: jnp.ndarray) -> jnp.ndarray:
        """Rotate + translate points [..., 3]."""
        r = self.rotmat()
        return (
            jnp.einsum("...ij,...j->...i", r, pts) + self.trans
        )

    def invert_apply(self, pts: jnp.ndarray) -> jnp.ndarray:
        r = self.rotmat()
        return jnp.einsum("...ji,...j->...i", r, pts - self.trans)

    def compose(self, other: "Rigid") -> "Rigid":
        """self ∘ other (apply other first in other's frame)."""
        quat = so3.quat_normalize(so3.quat_multiply(self.quat, other.quat))
        trans = self.apply(other.trans)
        return Rigid(quat, trans)

    def invert(self) -> "Rigid":
        inv_q = so3.quat_conjugate(self.quat)
        inv_t = -jnp.einsum(
            "...ji,...j->...i", self.rotmat(), self.trans
        )
        return Rigid(inv_q, inv_t)

    def compose_q_update_vec(
        self, update: jnp.ndarray, mask: jnp.ndarray | None = None
    ) -> "Rigid":
        """AF2 backbone update (Algorithm 23 / rigid_utils.py:1039-1070).

        ``update`` [..., 6]: first 3 are the (b, c, d) imaginary parts of a
        quaternion with fixed real part 1; last 3 are a translation update in
        the local frame (rotated by the current rotation before adding).
        ``mask`` [..., 1]: residues to update (1) vs freeze (0).
        """
        if mask is not None:
            update = update * mask
        vec_quat = jnp.concatenate(
            [jnp.ones_like(update[..., :1]), update[..., :3]], axis=-1
        )
        new_quat = so3.quat_normalize(so3.quat_multiply(self.quat, vec_quat))
        trans_update = jnp.einsum(
            "...ij,...j->...i", self.rotmat(), update[..., 3:]
        )
        return Rigid(new_quat, self.trans + trans_update)

    # -- misc -----------------------------------------------------------------
    def scale_translation(self, factor) -> "Rigid":
        return Rigid(self.quat, self.trans * factor)

    def apply_trans_fn(self, fn: Callable) -> "Rigid":
        return Rigid(self.quat, fn(self.trans))

    def __getitem__(self, idx) -> "Rigid":
        if not isinstance(idx, tuple):
            idx = (idx,)
        return Rigid(self.quat[idx + (slice(None),)], self.trans[idx + (slice(None),)])

    def reshape(self, batch_shape) -> "Rigid":
        return Rigid(
            self.quat.reshape(tuple(batch_shape) + (4,)),
            self.trans.reshape(tuple(batch_shape) + (3,)),
        )

    @classmethod
    def cat(cls, rigids, axis: int = 0) -> "Rigid":
        ax = axis if axis >= 0 else axis - 1
        return cls(
            jnp.concatenate([r.quat for r in rigids], axis=ax),
            jnp.concatenate([r.trans for r in rigids], axis=ax),
        )

    def unsqueeze(self, axis: int) -> "Rigid":
        ax = axis if axis >= 0 else axis - 1
        return Rigid(
            jnp.expand_dims(self.quat, ax), jnp.expand_dims(self.trans, ax)
        )
