import numpy as np
from scipy.spatial.transform import Rotation

import jax.numpy as jnp

from dynamicpdb_tpu.ops import so3

RNG = np.random.default_rng(0)


def random_rotvecs(n=64, max_angle=np.pi * 0.999):
    axes = RNG.normal(size=(n, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    angles = RNG.uniform(0, max_angle, size=(n, 1))
    return axes * angles


def test_quat_roundtrip_vs_scipy():
    rv = random_rotvecs()
    q = np.asarray(so3.rotvec_to_quat(jnp.asarray(rv)))
    # scipy uses xyzw order
    q_sp = Rotation.from_rotvec(rv).as_quat()
    q_sp = np.concatenate([q_sp[:, 3:], q_sp[:, :3]], -1)
    sign = np.sign(np.sum(q * q_sp, -1, keepdims=True))
    np.testing.assert_allclose(q, q_sp * sign, atol=1e-6)


def test_rotmat_roundtrip():
    rv = random_rotvecs()
    m = np.asarray(so3.rotvec_to_rotmat(jnp.asarray(rv)))
    m_sp = Rotation.from_rotvec(rv).as_matrix()
    np.testing.assert_allclose(m, m_sp, atol=1e-6)
    rv_back = np.asarray(so3.rotmat_to_rotvec(jnp.asarray(m)))
    np.testing.assert_allclose(rv_back, rv, atol=1e-5)


def test_rotmat_to_quat_all_branches():
    # rotations near pi around each axis hit the non-trace branches
    for axis in np.eye(3):
        rv = axis * (np.pi - 1e-4)
        m = Rotation.from_rotvec(rv).as_matrix()
        back = np.asarray(so3.rotmat_to_rotvec(jnp.asarray(m[None])))[0]
        np.testing.assert_allclose(back, rv, atol=1e-4)


def test_compose_rotvec_matches_matrix_compose():
    r1, r2 = random_rotvecs(32), random_rotvecs(32)
    ours = np.asarray(so3.compose_rotvec(jnp.asarray(r1), jnp.asarray(r2)))
    expect = Rotation.from_matrix(
        Rotation.from_rotvec(r1).as_matrix() @ Rotation.from_rotvec(r2).as_matrix()
    ).as_rotvec()
    np.testing.assert_allclose(ours, expect, atol=1e-5)


def test_quat_to_rotvec_small_angle_branch():
    # tiny rotation: result should be ~2 * imaginary part
    v = np.array([[1e-5, -2e-5, 3e-6]])
    q = np.asarray(so3.rotvec_to_quat(jnp.asarray(v)))
    back = np.asarray(so3.quat_to_rotvec(jnp.asarray(q)))
    np.testing.assert_allclose(back, v, rtol=1e-4)


def test_quat_multiply_vs_scipy():
    rv1, rv2 = random_rotvecs(16), random_rotvecs(16)
    q1 = np.asarray(so3.rotvec_to_quat(jnp.asarray(rv1)))
    q2 = np.asarray(so3.rotvec_to_quat(jnp.asarray(rv2)))
    q12 = np.asarray(so3.quat_multiply(jnp.asarray(q1), jnp.asarray(q2)))
    m12 = np.asarray(so3.quat_to_rotmat(jnp.asarray(q12)))
    expect = Rotation.from_rotvec(rv1).as_matrix() @ Rotation.from_rotvec(rv2).as_matrix()
    np.testing.assert_allclose(m12, expect, atol=1e-6)


def test_hat_skew():
    v = random_rotvecs(8)
    m = np.asarray(so3.hat(jnp.asarray(v)))
    np.testing.assert_allclose(m, -np.swapaxes(m, -1, -2), atol=0)
    x = RNG.normal(size=(8, 3))
    np.testing.assert_allclose(
        np.einsum("...ij,...j->...i", m, x), np.cross(v, x), atol=1e-6
    )
