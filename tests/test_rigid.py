import numpy as np
import jax
import jax.numpy as jnp

from dynamicpdb_tpu.ops import so3
from dynamicpdb_tpu.ops.rigid import Rigid

RNG = np.random.default_rng(1)


def random_rigid(shape=(16,)):
    q = RNG.normal(size=shape + (4,))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    t = RNG.normal(size=shape + (3,)) * 5
    return Rigid(jnp.asarray(q), jnp.asarray(t))


def test_identity_and_tensor7_roundtrip():
    r = random_rigid()
    t7 = r.to_tensor_7()
    r2 = Rigid.from_tensor_7(t7)
    np.testing.assert_allclose(r2.quat, r.quat, atol=1e-6)
    np.testing.assert_allclose(r2.trans, r.trans, atol=1e-6)


def test_compose_invert_identity():
    r = random_rigid()
    ri = r.invert()
    comp = r.compose(ri)
    np.testing.assert_allclose(
        np.abs(np.asarray(comp.quat[..., 0])), 1.0, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(comp.trans), 0.0, atol=1e-5)


def test_apply_invert_apply():
    r = random_rigid()
    pts = jnp.asarray(RNG.normal(size=(16, 3)))
    back = r.invert_apply(r.apply(pts))
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-5)


def test_compose_matches_matrix_algebra():
    a, b = random_rigid((8,)), random_rigid((8,))
    c = a.compose(b)
    Ra, Rb = np.asarray(a.rotmat()), np.asarray(b.rotmat())
    np.testing.assert_allclose(np.asarray(c.rotmat()), Ra @ Rb, atol=1e-5)
    expect_t = np.einsum("...ij,...j->...i", Ra, np.asarray(b.trans)) + np.asarray(a.trans)
    np.testing.assert_allclose(np.asarray(c.trans), expect_t, atol=1e-5)


def test_tensor_4x4_roundtrip():
    r = random_rigid()
    m = r.to_tensor_4x4()
    r2 = Rigid.from_tensor_4x4(m)
    # quats equal up to sign
    dot = np.abs(np.sum(np.asarray(r.quat) * np.asarray(r2.quat), -1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(r2.trans), np.asarray(r.trans), atol=1e-5)


def test_from_3_points_convention():
    # Gram-Schmidt: x axis points origin -> away from p_neg_x_axis
    p_neg = jnp.asarray([[0.0, 0.0, 0.0]])
    origin = jnp.asarray([[1.0, 0.0, 0.0]])
    p_xy = jnp.asarray([[1.0, 1.0, 0.0]])
    r = Rigid.from_3_points(p_neg, origin, p_xy)
    np.testing.assert_allclose(np.asarray(r.rotmat()[0]), np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.asarray(r.trans[0]), [1, 0, 0], atol=1e-6)


def test_from_3_points_orthonormal_random():
    pts = RNG.normal(size=(32, 3, 3)) * 3
    r = Rigid.from_3_points(
        jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]), jnp.asarray(pts[:, 2])
    )
    m = np.asarray(r.rotmat())
    np.testing.assert_allclose(
        m @ np.swapaxes(m, -1, -2), np.broadcast_to(np.eye(3), m.shape), atol=1e-4
    )
    np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-4)


def test_compose_q_update_vec():
    r = random_rigid((4,))
    upd = jnp.asarray(RNG.normal(size=(4, 6)) * 0.1)
    out = r.compose_q_update_vec(upd)
    # reference semantics: new_q = normalize(q ⊗ (1, b, c, d)); t' = t + R u
    vq = jnp.concatenate([jnp.ones((4, 1)), upd[..., :3]], -1)
    expect_q = so3.quat_normalize(so3.quat_multiply(r.quat, vq))
    np.testing.assert_allclose(np.asarray(out.quat), np.asarray(expect_q), atol=1e-6)
    expect_t = np.asarray(r.trans) + np.einsum(
        "...ij,...j->...i", np.asarray(r.rotmat()), np.asarray(upd[..., 3:])
    )
    np.testing.assert_allclose(np.asarray(out.trans), expect_t, atol=1e-5)
    # masked update is identity
    out_masked = r.compose_q_update_vec(upd, mask=jnp.zeros((4, 1)))
    np.testing.assert_allclose(np.asarray(out_masked.quat), np.asarray(r.quat), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_masked.trans), np.asarray(r.trans), atol=1e-6)


def test_rigid_is_pytree():
    r = random_rigid((4,))
    leaves = jax.tree_util.tree_leaves(r)
    assert len(leaves) == 2

    @jax.jit
    def f(rig: Rigid):
        return rig.compose(rig).to_tensor_7()

    out = f(r)
    assert out.shape == (4, 7)


def test_vmap_over_rigid():
    r = random_rigid((6, 5))
    pts = jnp.asarray(RNG.normal(size=(6, 5, 3)))
    out = jax.vmap(lambda rr, p: rr.apply(p))(r, pts)
    np.testing.assert_allclose(np.asarray(out), np.asarray(r.apply(pts)), atol=1e-5)
