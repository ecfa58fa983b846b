import os
import sys
import types

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax
import jax.numpy as jnp

from dynamicpdb_tpu.diffusion import igso3
from dynamicpdb_tpu.diffusion.r3_diffuser import R3Config, R3Diffuser
from dynamicpdb_tpu.diffusion.se3_diffuser import SE3Config, SE3Diffuser
from dynamicpdb_tpu.diffusion.so3_diffuser import SO3Config, SO3Diffuser
from dynamicpdb_tpu.ops import so3
from dynamicpdb_tpu.ops.rigid import Rigid

# Small grids keep table construction fast in CI; numerics identical in form.
SMALL_SO3 = SO3Config(num_omega=200, num_sigma=100, cache_dir=None, series_L=500)


@pytest.fixture(scope="module")
def so3d():
    return SO3Diffuser(SMALL_SO3)


@pytest.fixture(scope="module")
def r3d():
    return R3Diffuser(R3Config(coordinate_scaling=1.0))


# --- IGSO3 tables ----------------------------------------------------------

def test_igso3_pdf_normalizes(so3d):
    # cdf formula: cumsum(pdf) * pi / num_omega — final value should be ~1
    cdf_end = np.asarray(so3d.tables.cdf[:, -1])
    np.testing.assert_allclose(cdf_end, 1.0, atol=0.02)


def test_igso3_score_matches_numeric_gradient(so3d):
    # score_norms should equal d/domega log f(omega) on the grid
    omega = np.asarray(so3d.tables.discrete_omega, np.float64)
    sigma = np.asarray(so3d.tables.discrete_sigma, np.float64)
    si = 50  # a mid-range sigma
    f = igso3.igso3_expansion(omega, np.full_like(omega, sigma[si]), L=500)
    grad = np.gradient(np.log(f), omega)
    stored = np.asarray(so3d.tables.score_norms[si], np.float64)
    mid = slice(10, -10)
    np.testing.assert_allclose(stored[mid], grad[mid], rtol=0.05, atol=0.5)


def test_igso3_small_sigma_angle_stats(so3d):
    # At sigma ~ min_sigma=0.1, the rotation angle |w| ~ |N(0, sigma^2 I_3)|,
    # so E|w| = sigma * sqrt(8/pi).
    key = jax.random.PRNGKey(0)
    samples = so3d.sample(key, 0.0, (20000,))
    angles = np.linalg.norm(np.asarray(samples), axis=-1)
    expected = 0.1 * np.sqrt(8 / np.pi)
    np.testing.assert_allclose(angles.mean(), expected, rtol=0.05)


def test_sigma_schedule_endpoints(so3d):
    np.testing.assert_allclose(float(so3d.sigma(0.0)), 0.1, rtol=1e-5)
    np.testing.assert_allclose(float(so3d.sigma(1.0)), 1.5, rtol=1e-5)


def test_score_direction_and_tangent(so3d):
    vec = jnp.asarray(np.random.default_rng(3).normal(size=(8, 3)))
    s = so3d.score(vec, 0.5)
    # score is parallel (or anti-parallel) to vec
    cross = np.cross(np.asarray(s), np.asarray(vec))
    np.testing.assert_allclose(cross, 0.0, atol=1e-4)


def test_cached_vs_series_score(so3d):
    cached = SO3Diffuser(
        SO3Config(num_omega=200, num_sigma=100, cache_dir=None,
                  use_cached_score=True, series_L=500)
    )
    vec = jnp.asarray(np.random.default_rng(4).normal(size=(16, 3)) * 0.5)
    t = jnp.full((16,), 0.7)
    s1 = np.asarray(so3d.score(vec, t))
    s2 = np.asarray(cached.score(vec, t))
    # table is a coarse 200-bin quantization of the series
    np.testing.assert_allclose(s1, s2, rtol=0.1, atol=0.1)


# --- R3 VP-SDE --------------------------------------------------------------

def test_r3_forward_marginal_moments(r3d):
    key = jax.random.PRNGKey(1)
    x0 = jnp.ones((5000, 3)) * 2.0
    t = 0.5
    x_t, score = r3d.forward_marginal(key, x0, t)
    bt = float(r3d.marginal_b_t(t))
    np.testing.assert_allclose(
        np.asarray(x_t).mean(0), np.exp(-0.5 * bt) * 2.0, atol=0.05
    )
    np.testing.assert_allclose(
        np.asarray(x_t).std(0), np.sqrt(1 - np.exp(-bt)), atol=0.05
    )
    # score identity: score == -(x_t - e^{-b/2} x0) / (1 - e^{-b})
    expect = -(np.asarray(x_t) - np.exp(-0.5 * bt) * 2.0) / (1 - np.exp(-bt))
    np.testing.assert_allclose(np.asarray(score), expect, atol=1e-4)


def test_r3_score_scaling(r3d):
    t = 0.3
    bt = float(r3d.marginal_b_t(t))
    np.testing.assert_allclose(
        float(r3d.score_scaling(t)), 1 / np.sqrt(1 - np.exp(-bt)), rtol=1e-6
    )


def test_r3_calc_trans_0_inverts_score(r3d):
    key = jax.random.PRNGKey(2)
    x0 = jnp.asarray(np.random.default_rng(0).normal(size=(10, 3)) * 3)
    t = 0.8
    x_t, score = r3d.forward_marginal(key, x0, t)
    x0_rec = r3d.calc_trans_0(score, x_t, t)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-4)


def test_r3_reverse_centers_com(r3d):
    key = jax.random.PRNGKey(3)
    x_t = jnp.asarray(np.random.default_rng(1).normal(size=(4, 32, 3)))
    score = jnp.zeros_like(x_t)
    out = r3d.reverse(key, x_t, score, t=0.5, dt=0.1, center=True)
    np.testing.assert_allclose(np.asarray(out).mean(-2), 0.0, atol=1e-5)


def test_r3_coordinate_scaling_roundtrip():
    d = R3Diffuser(R3Config(coordinate_scaling=0.1))
    key = jax.random.PRNGKey(4)
    x0 = jnp.ones((2000, 3)) * 10.0
    x_t, _ = d.forward_marginal(key, x0, 0.01)
    # at tiny t, x_t ~ x0 (unscaled back to Angstroms)
    np.testing.assert_allclose(np.asarray(x_t).mean(0), 10.0, atol=0.5)


# --- SE3 composition ---------------------------------------------------------

@pytest.fixture(scope="module")
def se3d():
    return SE3Diffuser(SE3Config(so3=SMALL_SO3, r3=R3Config(coordinate_scaling=1.0)))


def _random_rigid(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    t = rng.normal(size=(n, 3)) * 4
    return Rigid(jnp.asarray(q), jnp.asarray(t))


def test_se3_forward_marginal_score_consistency(se3d):
    """The model-side score conversion evaluated at the TRUE clean frames must
    reproduce the data-side score targets — the core training invariant
    linking se3_diffuser.forward_marginal and calc_rot/trans_score."""
    rigids_0 = _random_rigid(64)
    key = jax.random.PRNGKey(5)
    t = 0.6
    out = se3d.forward_marginal(key, rigids_0, t)
    rigids_t = Rigid.from_tensor_7(out["rigids_t"])

    rot_score_model = se3d.calc_rot_score(
        rigids_t.quat, rigids_0.quat, jnp.asarray([t])
    )
    np.testing.assert_allclose(
        np.asarray(rot_score_model), np.asarray(out["rot_score"]), atol=2e-2,
        rtol=1e-2,
    )

    trans_score_model = se3d.calc_trans_score(
        rigids_t.trans, rigids_0.trans, t
    )
    np.testing.assert_allclose(
        np.asarray(trans_score_model), np.asarray(out["trans_score"]), atol=1e-3
    )


def test_se3_reverse_jit_scan(se3d):
    """Full reverse chain runs inside jit + lax.scan (the TPU sampler shape)."""
    rigids_0 = _random_rigid(16, seed=7)
    key = jax.random.PRNGKey(8)
    t7_init = se3d.sample_ref(key, (16,))

    num_t = 5
    ts = jnp.linspace(0.1, 1.0, num_t)[::-1]
    dt = 1.0 / num_t

    @jax.jit
    def rollout(t7, key):
        def body(carry, t):
            t7, key = carry
            key, sub = jax.random.split(key)
            rig = Rigid.from_tensor_7(t7)
            rot_score = se3d.calc_rot_score(
                rig.quat, rigids_0.quat, jnp.full((1,), t)
            )
            trans_score = se3d.calc_trans_score(rig.trans, rigids_0.trans, t)
            nxt = se3d.reverse(sub, rig, rot_score, trans_score, t, dt)
            return (nxt.to_tensor_7(), key), None

        (t7, _), _ = jax.lax.scan(body, (t7, key), ts)
        return t7

    out = rollout(t7_init, key)
    assert out.shape == (16, 7)
    assert bool(jnp.all(jnp.isfinite(out)))
    # denoising toward rigids_0 should reduce translation error vs init
    err_init = np.linalg.norm(np.asarray(t7_init[..., 4:] - rigids_0.trans), axis=-1).mean()
    err_end = np.linalg.norm(np.asarray(out[..., 4:] - rigids_0.trans), axis=-1).mean()
    assert err_end < err_init


def test_se3_sample_ref_stats(se3d):
    key = jax.random.PRNGKey(9)
    t7 = se3d.sample_ref(key, (2, 500))
    trans = np.asarray(t7[..., 4:])
    np.testing.assert_allclose(trans.std(), 1.0, atol=0.05)
    quat_norm = np.linalg.norm(np.asarray(t7[..., :4]), axis=-1)
    np.testing.assert_allclose(quat_norm, 1.0, atol=1e-5)


# --- golden parity vs reference implementation ------------------------------

REF = "/root/reference"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_igso3_tables_match_reference():
    """Load the reference's so3_diffuser.py (with its missing deps stubbed)
    and compare table construction numerically."""
    # stub src.data.utils (imports Biopython which isn't installed)
    fake_utils = types.ModuleType("src.data.utils")

    def compose_rotvec(r1, r2):
        R1 = Rotation.from_rotvec(r1).as_matrix()
        R2 = Rotation.from_rotvec(r2).as_matrix()
        return Rotation.from_matrix(np.einsum("...ij,...jk->...ik", R1, R2)).as_rotvec()

    fake_utils.compose_rotvec = compose_rotvec
    fake_utils.move_to_np = lambda x: np.asarray(x)
    src_pkg = types.ModuleType("src")
    data_pkg = types.ModuleType("src.data")
    sys.modules.setdefault("src", src_pkg)
    sys.modules.setdefault("src.data", data_pkg)
    sys.modules["src.data.utils"] = fake_utils

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_so3", os.path.join(REF, "src/data/so3_diffuser.py")
    )
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    omega = np.linspace(0, np.pi, 201)[1:]
    sigmas = np.array([0.1, 0.5, 1.0, 1.5])
    ref_exp = np.asarray([ref.igso3_expansion(omega, s) for s in sigmas])
    ours_exp = igso3.igso3_expansion(omega[None, :], sigmas[:, None])
    np.testing.assert_allclose(ours_exp, ref_exp, rtol=1e-8)

    ref_score = np.asarray(
        [ref.score(ref_exp[i], omega, s) for i, s in enumerate(sigmas)]
    )
    ours_score = igso3.igso3_score_scale(ours_exp, omega[None, :], sigmas[:, None])
    np.testing.assert_allclose(ours_score, ref_score, rtol=1e-6)

    ref_pdf = np.asarray([ref.density(e, omega, marginal=True) for e in ref_exp])
    ours_pdf = ours_exp * (1 - np.cos(omega)) / np.pi
    np.testing.assert_allclose(ours_pdf, ref_pdf, rtol=1e-8)
