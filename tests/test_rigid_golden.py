"""Behavioral parity of Rigid algebra + torsion loss vs reference goldens."""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from dynamicpdb_tpu.ops import so3
from dynamicpdb_tpu.ops.rigid import Rigid
from dynamicpdb_tpu.train.losses import torsion_angle_loss

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "rigid_golden.npz")


@pytest.fixture(scope="module")
def g():
    with np.load(GOLDEN) as z:
        return {k: z[k] for k in z.files}


def test_compose_q_update_vec_parity(g):
    r = Rigid.from_tensor_7(jnp.asarray(g["t7"], jnp.float32))
    out = r.compose_q_update_vec(jnp.asarray(g["update"], jnp.float32))
    got = np.asarray(out.to_tensor_7())
    ref = g["composed_t7"]
    # quats equal up to sign
    sign = np.sign(np.sum(got[:, :4] * ref[:, :4], -1, keepdims=True))
    np.testing.assert_allclose(got[:, :4] * sign, ref[:, :4], atol=2e-5)
    np.testing.assert_allclose(got[:, 4:], ref[:, 4:], atol=2e-4)


def test_apply_parity(g):
    r = Rigid.from_tensor_7(jnp.asarray(g["t7"], jnp.float32))
    np.testing.assert_allclose(
        np.asarray(r.apply(jnp.asarray(g["pts"], jnp.float32))),
        g["applied"], atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(r.invert_apply(jnp.asarray(g["pts"], jnp.float32))),
        g["inv_applied"], atol=2e-4,
    )


def test_quat_ops_parity(g):
    got = np.asarray(
        so3.quat_multiply(
            jnp.asarray(g["t7"][:, :4], jnp.float32),
            jnp.asarray(g["quat2"], jnp.float32),
        )
    )
    np.testing.assert_allclose(got, g["qmul"], atol=2e-5)
    got_inv = np.asarray(so3.quat_invert(jnp.asarray(g["t7"][:, :4], jnp.float32)))
    np.testing.assert_allclose(got_inv, g["qinv"], atol=2e-5)


def test_torsion_loss_parity(g):
    got = np.asarray(
        torsion_angle_loss(
            jnp.asarray(g["loss_a"], jnp.float32),
            jnp.asarray(g["loss_a_gt"], jnp.float32),
            jnp.asarray(g["loss_a_alt"], jnp.float32),
            jnp.asarray(g["loss_mask"], jnp.float32),
        )
    )
    np.testing.assert_allclose(got, g["torsion_loss"], rtol=2e-4, atol=1e-5)
