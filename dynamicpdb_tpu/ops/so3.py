"""SO(3) primitives in pure jnp: quaternion / rotation-matrix / rotation-vector
conversions and Lie-group maps.

Everything is shape-polymorphic over leading batch dims, jit/vmap/grad-safe
(no data-dependent control flow), and numerically guarded at the angle->0 and
angle->pi limits.

Quaternion convention: [w, x, y, z] scalar-first (matches the reference's
openfold rigid_utils tensor-7 layout: quat[4] ++ trans[3];
/root/reference/openfold/utils/rigid_utils.py:185-265).
"""
from __future__ import annotations

import jax.numpy as jnp


def quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return q / jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True) + eps)


def quat_multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q1 ⊗ q2, scalar-first."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_invert(q: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a (possibly non-unit) quaternion: conj(q)/|q|^2.

    Mirrors openfold's invert_quat (rigid_utils.py:287-291); for unit
    quaternions this is just the conjugate.
    """
    return quat_conjugate(q) / jnp.sum(q * q, axis=-1, keepdims=True)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> rotation matrix [..., 3, 3]."""
    w, x, y, z = jnp.moveaxis(quat_normalize(q), -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def rotmat_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> unit quaternion (w >= 0 not enforced).

    Branch-free Shepperd method: compute all four candidate quaternions and
    select the best-conditioned one with jnp.where.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22
    # Four candidates, each scaled by 4*q_i^2 (guaranteed positive for its case)
    qw = jnp.stack([1 + tr, m21 - m12, m02 - m20, m10 - m01], -1)
    qx = jnp.stack([m21 - m12, 1 + m00 - m11 - m22, m01 + m10, m02 + m20], -1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1 - m00 + m11 - m22, m12 + m21], -1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1 - m00 - m11 + m22], -1)

    diag = jnp.stack([tr, m00, m11, m22], -1)
    case = jnp.argmax(diag, axis=-1)

    q = jnp.where(
        (case == 0)[..., None], qw,
        jnp.where(
            (case == 1)[..., None], qx,
            jnp.where((case == 2)[..., None], qy, qz),
        ),
    )
    return quat_normalize(q)


def rotvec_to_quat(v: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle vector -> unit quaternion. Stable at |v| -> 0 via sinc."""
    angle = jnp.linalg.norm(v, axis=-1, keepdims=True)
    half = 0.5 * angle
    # sin(half)/angle = 0.5 * sinc(half/pi)
    k = 0.5 * jnp.sinc(half / jnp.pi)
    return jnp.concatenate([jnp.cos(half), k * v], axis=-1)


def quat_to_rotvec(q: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Unit quaternion -> axis-angle vector.

    Exact behavioral mirror of the reference's du.quat_to_rotvec
    (/root/reference/src/data/utils.py:589-606): sign-flip so w >= 0
    (angle in [0, pi]), angle = 2*atan2(|xyz|, w), with the same small-angle
    Taylor branch — this function defines the rotation-score targets so the
    branch point (1e-3) is kept identical.
    """
    flip = (q[..., :1] < 0).astype(q.dtype)
    q = (1 - 2 * flip) * q
    im_norm = jnp.linalg.norm(q[..., 1:], axis=-1)
    angle = 2 * jnp.arctan2(im_norm, q[..., 0])
    angle2 = angle * angle
    small_scale = 2 + angle2 / 12 + 7 * angle2 * angle2 / 2880
    large_scale = angle / jnp.sin(angle / 2 + eps)
    scale = jnp.where(angle <= 1e-3, small_scale, large_scale)
    return scale[..., None] * q[..., 1:]


def rotvec_to_rotmat(v: jnp.ndarray) -> jnp.ndarray:
    return quat_to_rotmat(rotvec_to_quat(v))


def rotmat_to_rotvec(m: jnp.ndarray) -> jnp.ndarray:
    return quat_to_rotvec(rotmat_to_quat(m))


def compose_rotvec(r1: jnp.ndarray, r2: jnp.ndarray) -> jnp.ndarray:
    """rotvec of R(r1) @ R(r2) (right-multiplied composition).

    Mirrors du.compose_rotvec (/root/reference/src/data/utils.py:184-189).
    """
    return quat_to_rotvec(quat_multiply(rotvec_to_quat(r1), rotvec_to_quat(r2)))


def hat(v: jnp.ndarray) -> jnp.ndarray:
    """rotvec -> skew-symmetric matrix."""
    x, y, z = jnp.moveaxis(v, -1, 0)
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def rotation_geodesic_distance(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Geodesic angle (radians) between two unit quaternions."""
    dot = jnp.abs(jnp.sum(quat_normalize(q1) * quat_normalize(q2), axis=-1))
    return 2 * jnp.arccos(jnp.clip(dot, 0.0, 1.0))
