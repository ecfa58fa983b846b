import numpy as np
from scipy.spatial.transform import Rotation

import jax.numpy as jnp

from dynamicpdb_tpu.analysis import metrics as M

RNG = np.random.default_rng(0)


def test_quaternion_distance_matches_rotation_angle():
    rv = RNG.normal(size=(16, 3))
    rv /= np.linalg.norm(rv, axis=-1, keepdims=True)
    angles = RNG.uniform(0, np.pi * 0.9, (16, 1))
    q2 = Rotation.from_rotvec(rv * angles).as_quat()  # xyzw
    q2 = np.concatenate([q2[:, 3:], q2[:, :3]], -1)
    q1 = np.tile([1.0, 0, 0, 0], (16, 1))
    d = np.asarray(M.quaternion_distance_deg(jnp.asarray(q1), jnp.asarray(q2)))
    np.testing.assert_allclose(d, np.degrees(angles[:, 0]), rtol=1e-4)


def test_translation_distances():
    a = RNG.normal(size=(2, 8, 3))
    b = a + 1.0
    mae = np.asarray(M.average_translation_distances(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(mae, 1.0, atol=1e-6)
    mse = np.asarray(
        M.average_translation_distances(jnp.asarray(a), jnp.asarray(b), "MSE")
    )
    np.testing.assert_allclose(mse, 1.0, atol=1e-6)


def test_kabsch_superimposed_rmsd_zero_for_rigid_motion():
    x = RNG.normal(size=(32, 3)) * 4
    rot = Rotation.random(random_state=1).as_matrix()
    y = x @ rot.T + np.array([5.0, -2.0, 1.0])
    r = float(M.superimposed_rmsd(jnp.asarray(y), jnp.asarray(x)))
    assert r < 1e-4
    # and detects real deformation
    y2 = y + RNG.normal(size=y.shape) * 0.5
    assert float(M.superimposed_rmsd(jnp.asarray(y2), jnp.asarray(x))) > 0.3


def test_drmsd_invariant_to_rigid_motion():
    x = RNG.normal(size=(20, 3)) * 3
    rot = Rotation.random(random_state=2).as_matrix()
    y = x @ rot.T + 7.0
    d = float(M.drmsd(jnp.asarray(y), jnp.asarray(x)))
    assert d < 1e-3


def test_eval_window_metrics_refaspred_identity():
    """If pred == frame F-2 broadcast, pred errors equal RefAsPred errors."""
    F, N = 3, 12
    q = RNG.normal(size=(F, N, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    rigids = np.concatenate([q, RNG.normal(size=(F, N, 3))], -1).astype(np.float32)
    atom37 = RNG.normal(size=(F, N, 37, 3)).astype(np.float32)
    mask = np.ones((F, N, 37), np.float32)
    pred_rigids = np.broadcast_to(rigids[-2], rigids.shape)
    pred_atom37 = np.broadcast_to(atom37[-2], atom37.shape)
    m = M.eval_window_metrics(
        jnp.asarray(pred_rigids), jnp.asarray(pred_atom37),
        jnp.asarray(rigids), jnp.asarray(atom37), jnp.asarray(mask),
    )
    np.testing.assert_allclose(float(m["ave_rot"]), float(m["ref_ave_rot"]), rtol=1e-5)
    np.testing.assert_allclose(
        float(m["ave_trans"]), float(m["ref_ave_trans"]), rtol=1e-5
    )


def test_eval_window_metrics_single_frame_ref_is_nan():
    """F=1 windows have no previous frame: RefAsPred must be NaN, not the
    deceptive exact-0 that jnp's clamped -2 index used to produce."""
    N = 6
    q = RNG.normal(size=(1, N, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    rigids = np.concatenate([q, RNG.normal(size=(1, N, 3))], -1).astype(np.float32)
    atom37 = RNG.normal(size=(1, N, 37, 3)).astype(np.float32)
    mask = np.ones((1, N, 37), np.float32)
    m = M.eval_window_metrics(
        jnp.asarray(rigids), jnp.asarray(atom37),
        jnp.asarray(rigids), jnp.asarray(atom37), jnp.asarray(mask),
    )
    assert np.isnan(float(m["ref_ave_rot"]))
    assert np.isnan(float(m["ref_ave_trans"]))
    assert float(m["ave_rot"]) < 1e-4  # real metrics still computed
