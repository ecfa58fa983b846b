"""Optimizer-state dtype (train/optim.py): f32 path must be bit-compatible
with optax.amsgrad (the reference's Adam(amsgrad=True)); bf16 state must
still optimize and actually be stored in bf16."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
# compile/oracle-heavy on a 1-core host (measured, Makefile header):
# run via `make heavy`; excluded from the default `make test` tier
pytestmark = pytest.mark.heavy

from dynamicpdb_tpu.train import optim


def _toy_problem(seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        "w": jax.random.normal(k1, (8, 4)),
        "b": jax.random.normal(k2, (4,)),
    }
    x = jax.random.normal(k3, (16, 8))
    y = jnp.sin(x[:, :4])

    def loss(p):
        pred = x @ p["w"] + p["b"]
        return jnp.mean((pred - y) ** 2)

    return params, loss


def _run(opt, params, loss, steps=25):
    state = opt.init(params)
    losses = []

    @jax.jit
    def step(params, state):
        l, g = jax.value_and_grad(loss)(params)
        updates, state = opt.update(g, state, params)
        return optax.apply_updates(params, updates), state, l

    for _ in range(steps):
        params, state, l = step(params, state)
        losses.append(float(l))
    return params, state, losses


def test_f32_state_matches_optax_amsgrad():
    params, loss = _toy_problem()
    p_ref, _, l_ref = _run(optax.amsgrad(1e-2), params, loss)
    p_ours, _, l_ours = _run(optim.amsgrad(1e-2), params, loss)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_ours)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(l_ref, l_ours, rtol=1e-6)


def test_bf16_state_dtype_and_convergence():
    params, loss = _toy_problem()
    opt = optim.amsgrad(1e-2, state_dtype=jnp.bfloat16)
    p, state, losses = _run(opt, params, loss, steps=60)
    # accumulators actually stored in bf16
    inner = state[0] if isinstance(state, tuple) else state
    for acc in (inner.mu, inner.nu, inner.nu_max):
        for leaf in jax.tree_util.tree_leaves(acc):
            assert leaf.dtype == jnp.bfloat16
    # optimizes: large loss reduction, close to the f32 trajectory
    _, _, losses32 = _run(optim.amsgrad(1e-2), params, loss, steps=60)
    assert losses[-1] < 0.5 * losses[0]
    assert abs(losses[-1] - losses32[-1]) < 0.05 * (losses32[0] - losses32[-1])


def test_make_optimizer_respects_config():
    class Cfg:
        learning_rate = 1e-3
        grad_clip_norm = None
        opt_state_dtype = "bfloat16"

    params, loss = _toy_problem()
    opt = optim.make_optimizer(Cfg())
    state = opt.init(params)
    leaves = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda x: x, state)
    )
    dtypes = {leaf.dtype for leaf in leaves if leaf.ndim > 0}
    assert dtypes == {jnp.dtype(jnp.bfloat16)}

    Cfg.opt_state_dtype = "float32"
    _, _, l_cfg = _run(optim.make_optimizer(Cfg()), params, loss, steps=10)
    _, _, l_ref = _run(optax.amsgrad(1e-3), params, loss, steps=10)
    np.testing.assert_allclose(l_cfg, l_ref, rtol=1e-6)


def test_trainer_uses_opt_state_dtype():
    """End-to-end: a Trainer built with opt_state_dtype=bfloat16 trains and
    its optimizer state is bf16."""
    import dataclasses

    from dynamicpdb_tpu.data.synthetic import make_window
    from dynamicpdb_tpu.train.experiment import Trainer
    from tests.test_train import TINY_CFG

    cfg = dataclasses.replace(
        TINY_CFG,
        experiment=dataclasses.replace(
            TINY_CFG.experiment, opt_state_dtype="bfloat16"
        ),
    )
    trainer = Trainer(cfg)
    window = make_window(n_res=8, frame_time=2, seed=0)
    params, opt_state = trainer.init_params(jax.random.PRNGKey(1), window)
    moment_leaves = [
        leaf
        for leaf in jax.tree_util.tree_leaves(opt_state)
        if leaf.ndim > 0
    ]
    assert moment_leaves and all(
        leaf.dtype == jnp.bfloat16 for leaf in moment_leaves
    )
    batch = jax.tree_util.tree_map(lambda x: x[None], window)
    step = jax.jit(trainer.train_step)
    p1, s1, aux1 = step(params, opt_state, jax.random.PRNGKey(2), batch)
    p2, s2, aux2 = step(p1, s1, jax.random.PRNGKey(3), batch)
    assert np.isfinite(float(aux2["total_loss"]))
    # params actually moved
    d = sum(
        float(jnp.abs(a - b).sum())
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(p2))
    )
    assert d > 0


def test_torch_formulation_matches_torch_adam_amsgrad():
    """formulation="torch" reproduces torch.optim.Adam(amsgrad=True)
    step-for-step on a nonconvex toy problem (f32, 60 steps)."""
    torch = pytest.importorskip("torch")
    lr = 1e-2
    w0 = np.linspace(-1.0, 1.5, 12).astype(np.float32).reshape(3, 4)

    # torch side
    tw = torch.nn.Parameter(torch.tensor(w0))
    topt = torch.optim.Adam([tw], lr=lr, amsgrad=True)
    tloss_hist = []
    for _ in range(60):
        topt.zero_grad()
        loss = (torch.sin(tw * 3.0) * tw**2).sum()
        loss.backward()
        topt.step()
        tloss_hist.append(float(loss))

    # jax side
    jw = jnp.asarray(w0)
    opt = optim.amsgrad(lr, formulation="torch")
    state = opt.init(jw)

    def f(w):
        return jnp.sum(jnp.sin(w * 3.0) * w**2)

    jloss_hist = []
    for _ in range(60):
        loss, g = jax.value_and_grad(f)(jw)
        upd, state = opt.update(g, state, jw)
        jw = optax.apply_updates(jw, upd)
        jloss_hist.append(float(loss))

    np.testing.assert_allclose(jloss_hist, tloss_hist, rtol=2e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(jw), tw.detach().numpy(), rtol=2e-6, atol=2e-6
    )


def test_torch_formulation_differs_from_optax_when_max_is_stale():
    """Sanity: the two formulations are NOT identical (they differ once the
    max was attained at an earlier step) — guards against the torch branch
    silently aliasing the optax one."""
    g_big = jnp.full((4,), 5.0)
    g_small = jnp.full((4,), 0.1)
    outs = []
    for form in ("optax", "torch"):
        w = jnp.zeros((4,))
        opt = optim.amsgrad(1e-2, formulation=form)
        s = opt.init(w)
        for g in [g_big, g_small, g_small, g_small]:
            upd, s = opt.update(g, s, w)
            w = optax.apply_updates(w, upd)
        outs.append(np.asarray(w))
    assert np.abs(outs[0] - outs[1]).max() > 1e-7


# ---- parameter EMA (beyond-reference, experiment.ema_decay) ----------------


class _EmaCfg:
    learning_rate = 1e-2
    grad_clip_norm = None
    opt_state_dtype = None
    ema_decay = 0.5


def test_ema_matches_manual_recursion():
    params, loss = _toy_problem()
    opt = optim.make_optimizer(_EmaCfg())
    state = opt.init(params)
    # EMA starts at the initial parameters
    for e, p in zip(jax.tree_util.tree_leaves(optim.ema_params(state)),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(e), np.asarray(p))

    manual = jax.tree_util.tree_map(np.asarray, params)
    d = _EmaCfg.ema_decay
    for i in range(5):
        g = jax.grad(loss)(params)
        updates, state = opt.update(g, state, params)
        params = optax.apply_updates(params, updates)
        manual = jax.tree_util.tree_map(
            lambda e, p: d * e + (1 - d) * np.asarray(p), manual, params
        )
        for e, m in zip(jax.tree_util.tree_leaves(optim.ema_params(state)),
                        jax.tree_util.tree_leaves(manual)):
            np.testing.assert_allclose(np.asarray(e), m, rtol=1e-6,
                                       atol=1e-7)


def test_ema_decay_zero_is_current_params():
    class Cfg(_EmaCfg):
        ema_decay = 0.0

    params, loss = _toy_problem()
    p_out, state, _ = _run(optim.make_optimizer(Cfg()), params, loss, steps=3)
    for e, p in zip(jax.tree_util.tree_leaves(optim.ema_params(state)),
                    jax.tree_util.tree_leaves(p_out)):
        np.testing.assert_allclose(np.asarray(e), np.asarray(p), rtol=1e-6)


def test_ema_does_not_change_training_trajectory():
    """track_ema is a pure observer: updates with it are bit-identical."""
    params, loss = _toy_problem()

    class Plain(_EmaCfg):
        ema_decay = None

    p_plain, state_plain, l_plain = _run(
        optim.make_optimizer(Plain()), params, loss, steps=8
    )
    p_ema, state_ema, l_ema = _run(
        optim.make_optimizer(_EmaCfg()), params, loss, steps=8
    )
    np.testing.assert_array_equal(l_plain, l_ema)
    for a, b in zip(jax.tree_util.tree_leaves(p_plain),
                    jax.tree_util.tree_leaves(p_ema)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # default optimizer carries no EMA tree; opt-in one does
    with pytest.raises(ValueError, match="no EMA"):
        optim.ema_params(state_plain)
    assert optim.ema_params(state_ema) is not None


def test_ema_invalid_decay_rejected():
    with pytest.raises(ValueError, match="ema_decay"):
        optim.track_ema(1.0)


def test_trainer_ema_checkpoint_roundtrip(tmp_path):
    """Experiment-level: EMA rides opt_state through train + save/restore;
    eval-side extraction returns the averaged weights."""
    import dataclasses

    from dynamicpdb_tpu.data.synthetic import make_window
    from dynamicpdb_tpu.train import checkpoint as ckpt_lib
    from dynamicpdb_tpu.train.experiment import Trainer
    from tests.test_train import TINY_CFG

    cfg = dataclasses.replace(
        TINY_CFG,
        experiment=dataclasses.replace(TINY_CFG.experiment, ema_decay=0.9),
    )
    trainer = Trainer(cfg)
    window = make_window(n_res=8, frame_time=2, seed=0)
    params, opt_state = trainer.init_params(jax.random.PRNGKey(1), window)
    batch = jax.tree_util.tree_map(lambda x: x[None], window)
    step = jax.jit(trainer.train_step)
    p, s = params, opt_state
    for i in range(2):
        p, s, aux = step(p, s, jax.random.PRNGKey(2 + i), batch)
    ema = optim.ema_params(s)
    # averaged weights lag the live ones but have moved off the init
    dist_live = sum(
        float(jnp.abs(a - b).sum())
        for a, b in zip(jax.tree_util.tree_leaves(ema),
                        jax.tree_util.tree_leaves(p))
    )
    dist_init = sum(
        float(jnp.abs(a - b).sum())
        for a, b in zip(jax.tree_util.tree_leaves(ema),
                        jax.tree_util.tree_leaves(params))
    )
    assert dist_live > 0 and dist_init > 0

    path = str(tmp_path / "ema.ckpt")
    ckpt_lib.save(path, p, s, step=2, epoch=0)
    restored = ckpt_lib.restore(path, params, opt_state)
    for a, b in zip(
        jax.tree_util.tree_leaves(optim.ema_params(restored["opt_state"])),
        jax.tree_util.tree_leaves(ema),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
