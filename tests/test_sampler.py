import numpy as np
import pytest
# compile/oracle-heavy on a 1-core host (measured, Makefile header):
# run via `make heavy`; excluded from the default `make test` tier
pytestmark = pytest.mark.heavy

import jax
import jax.numpy as jnp

from dynamicpdb_tpu.data.featurize import eval_init_window, featurize_window
from dynamicpdb_tpu.data.synthetic import make_window
from dynamicpdb_tpu.diffusion.se3_diffuser import SE3Diffuser
from dynamicpdb_tpu.models.score_network import DFoldScoreNetwork
from dynamicpdb_tpu.sampling.evaluate import evaluate
from dynamicpdb_tpu.sampling.reverse import make_sampler, reverse_sample, rollout
from tests.test_model import TINY_MODEL, TINY_SE3


@pytest.fixture(scope="module")
def setup():
    w = make_window(n_res=10, frame_time=2, seed=1)
    diffuser = SE3Diffuser(TINY_SE3)
    model = DFoldScoreNetwork(TINY_MODEL)
    feats = jax.jit(featurize_window)(jax.tree_util.tree_map(jnp.asarray, w))
    feats = jax.jit(lambda k, f: eval_init_window(k, f, diffuser))(
        jax.random.PRNGKey(0), feats)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), feats)
    return w, diffuser, model, feats, params


def test_reverse_sample_shapes_and_finiteness(setup):
    _, diffuser, model, feats, params = setup
    out = jax.jit(lambda k, p, f: reverse_sample(
        k, model, p, diffuser, f, num_t=4, noise_scale=0.1, aux_traj=True,
    ))(jax.random.PRNGKey(1), params, feats)
    F, N = feats["res_mask"].shape
    assert out["rigids"].shape == (F, N, 7)
    assert out["prot_traj"].shape == (4, F, N, 37, 3)
    assert out["rigid_traj"].shape == (4, F, N, 7)
    for v in jax.tree_util.tree_leaves(out):
        assert bool(jnp.all(jnp.isfinite(v)))


def test_zero_init_model_sampler_returns_refaspred(setup):
    """With a zero-init network the sampler's final prediction must be the
    RefAsPred baseline (frame F-2 of the clean references), regardless of the
    noise trajectory — validates the final-step x0 rule."""
    _, diffuser, model, feats, params = setup
    out = jax.jit(lambda k, p, f: reverse_sample(
        k, model, p, diffuser, f, num_t=3,
    ))(jax.random.PRNGKey(2), params, feats)
    np.testing.assert_allclose(
        np.asarray(out["rigids"][-1]),
        np.asarray(feats["rigids_0"][-2]),
        atol=1e-5,
    )


def test_sampler_jit_compiles_once(setup):
    _, diffuser, model, feats, params = setup
    fn = make_sampler(model, diffuser, num_t=3, noise_scale=0.1)
    o1 = fn(params, jax.random.PRNGKey(1), feats)
    o2 = fn(params, jax.random.PRNGKey(2), feats)
    # different keys -> different reverse noise, same final x0 (zero-init net)
    np.testing.assert_allclose(
        np.asarray(o1["rigids"]), np.asarray(o2["rigids"]), atol=1e-5
    )


def test_rollout_extension(setup):
    _, diffuser, model, feats, params = setup
    atom_traj, rigid_traj = jax.jit(
        lambda p, k: rollout(
            k, model, p, diffuser, feats, n_steps=5, num_t=2,
            noise_scale=0.1,
        )
    )(params, jax.random.PRNGKey(3))
    F, N = feats["res_mask"].shape
    assert atom_traj.shape == (5, N, 37, 3)
    assert rigid_traj.shape == (5, N, 7)
    assert bool(jnp.all(jnp.isfinite(atom_traj)))
    # zero-init net: every rolled-out frame keeps the F-2 reference rigid
    np.testing.assert_allclose(
        np.asarray(rigid_traj[0]), np.asarray(feats["rigids_0"][-2]), atol=1e-5
    )


def test_refresh_window_conditioning_semantics():
    """vel = backward difference of the predicted Ca over dt, backfilled,
    then slid like the rigids; angles slide with the predictions."""
    from dynamicpdb_tpu.sampling.reverse import refresh_window_conditioning

    rng = np.random.default_rng(0)
    F, N, dt = 2, 4, 2.0
    pred = jnp.asarray(rng.normal(size=(F, N, 7)), jnp.float32)
    angles = jnp.asarray(rng.normal(size=(F, N, 7, 2)), jnp.float32)
    vel, next_angles = refresh_window_conditioning(pred, angles, dt)
    want_v = (np.asarray(pred[1, :, 4:]) - np.asarray(pred[0, :, 4:])) / dt
    # F=2: both next-window frames carry the cross-window difference
    np.testing.assert_allclose(np.asarray(vel[0]), want_v, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(vel[1]), want_v, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(next_angles), np.asarray(angles)[[1, 1]], rtol=1e-6
    )


def test_rollout_refresh_conditioning(setup):
    """The opt-in refresh path compiles, stays finite, and actually feeds
    different conditioning than the frozen default (the zero-init net is
    insensitive to inputs, so compare the vel that WOULD be fed via the
    helper instead of trajectories)."""
    _, diffuser, model, feats, params = setup
    atom_traj, rigid_traj = jax.jit(
        lambda p, k: rollout(
            k, model, p, diffuser, feats, n_steps=3, num_t=2,
            noise_scale=0.1, refresh_conditioning=True, dt_ps=1.0,
        )
    )(params, jax.random.PRNGKey(3))
    F, N = feats["res_mask"].shape
    assert atom_traj.shape == (3, N, 37, 3)
    assert bool(jnp.all(jnp.isfinite(atom_traj)))
    # zero-init net -> every prediction = RefAsPred; refresh must not
    # disturb the rigid semantics
    np.testing.assert_allclose(
        np.asarray(rigid_traj[0]), np.asarray(feats["rigids_0"][-2]),
        atol=1e-5,
    )


def test_evaluate_driver(setup):
    w, diffuser, model, feats, params = setup
    rows, means = evaluate(
        model, params, diffuser, [dict(w, name="synth")],
        key=jax.random.PRNGKey(4), num_t=3, noise_scale=0.1,
    )
    assert rows[0]["name"] == "synth"
    for k in ("ave_rot", "ave_trans", "all_atom_mae", "all_atom_rmsd",
              "ref_ave_rot", "ref_ave_trans"):
        assert np.isfinite(rows[0][k])
    # zero-init network == RefAsPred -> rigid errors match the baseline
    np.testing.assert_allclose(
        rows[0]["ave_rot"], rows[0]["ref_ave_rot"], atol=1e-3
    )
    np.testing.assert_allclose(
        rows[0]["ave_trans"], rows[0]["ref_ave_trans"], atol=1e-3
    )


def test_evaluate_save_dir_artifacts(setup, tmp_path):
    """save_dir writes the reference-eval-dir artifact set per protein:
    prediction npz, predicted + GT PDBs, and the interactive HTML overlay."""
    w, diffuser, model, feats, params = setup
    evaluate(
        model, params, diffuser, [dict(w, name="synth")],
        key=jax.random.PRNGKey(4), num_t=3, noise_scale=0.1,
        save_dir=str(tmp_path), decompose=True,
    )
    for suffix in ("_pred.npz", ".pdb", "_gt.pdb", ".html"):
        assert (tmp_path / f"synth{suffix}").exists(), suffix
    html = (tmp_path / "synth.html").read_text()
    assert "scatter3d" in html and "ground truth" in html


def test_batched_rollout_matches_per_trajectory(setup):
    """batched_rollout == looping rollout per window with the same
    per-trajectory keys (vmap semantics; independent PRNG streams)."""
    from dynamicpdb_tpu.sampling.reverse import batched_rollout

    _, diffuser, model, feats, params = setup
    B = 3
    fb = jax.tree_util.tree_map(
        lambda x: jnp.stack([x] * B), feats
    )
    key = jax.random.PRNGKey(9)
    atoms_b, rigids_b = jax.jit(
        lambda k, p, f: batched_rollout(
            k, model, p, diffuser, f, n_steps=2, num_t=3, noise_scale=0.1,
        )
    )(key, params, fb)
    assert atoms_b.shape[:2] == (B, 2) and rigids_b.shape[:2] == (B, 2)

    keys = jax.random.split(key, B)
    for i in range(B):
        a_i, r_i = jax.jit(
            lambda k, p, f: rollout(
                k, model, p, diffuser, f, n_steps=2, num_t=3,
                noise_scale=0.1,
            )
        )(keys[i], params, feats)
        np.testing.assert_allclose(
            np.asarray(atoms_b[i]), np.asarray(a_i), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(rigids_b[i]), np.asarray(r_i), atol=2e-5
        )
    # NOTE: no cross-trajectory difference assert — the architecture is an
    # x0-predictor whose FINAL prediction is independent of the noise
    # trajectory (rigids_t enters only the score conversion; the last
    # reverse step takes the model x0 directly), so stochastic replicas of
    # a deterministic model legitimately coincide (see COVERAGE.md).


def test_fast_x0_rollout_identical(setup):
    """fast_x0=True (one forward per frame) must produce bit-close
    trajectories to the full num_t-step sampler: the x0-predictor's
    returned frames do not depend on the reverse trajectory."""
    _, diffuser, model, feats, params = setup
    full = jax.jit(lambda k, p, f: rollout(
        k, model, p, diffuser, f, n_steps=3, num_t=5, noise_scale=0.3,
    ))(jax.random.PRNGKey(11), params, feats)
    fast = jax.jit(lambda k, p, f: rollout(
        k, model, p, diffuser, f, n_steps=3, num_t=5, noise_scale=0.3,
        fast_x0=True,
    ))(jax.random.PRNGKey(22), params, feats)  # different key: must not matter
    np.testing.assert_allclose(
        np.asarray(fast[0]), np.asarray(full[0]), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(fast[1]), np.asarray(full[1]), atol=1e-4
    )


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_rollout_under_sequence_parallelism_matches_single_device(setup):
    """Long-protein SERVING under sequence parallelism: the same rollout,
    traced under sp.activated with mesh-placed args, partitions the model's
    residue axis over 'seq' and must reproduce the single-device rollout
    (same key => same noise draws; geometry f32)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dynamicpdb_tpu.parallel import mesh as mesh_lib, sp

    _, diffuser, model, feats, params = setup
    run = lambda p, k, f: rollout(  # noqa: E731
        k, model, p, diffuser, f, n_steps=3, num_t=3, noise_scale=0.1,
    )
    a1, r1 = jax.jit(run)(params, jax.random.PRNGKey(5), feats)

    mesh = mesh_lib.make_mesh((1, 8), ("data", "seq"))
    rep = NamedSharding(mesh, P())
    p8 = jax.device_put(params, rep)
    f8 = jax.device_put(feats, rep)
    with sp.activated(mesh):
        a8, r8 = jax.jit(run)(p8, jax.random.PRNGKey(5), f8)

    np.testing.assert_allclose(np.asarray(a1), np.asarray(a8), atol=1e-4)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r8), atol=1e-4)
