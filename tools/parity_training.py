"""Optimization-dynamics parity vs the torch reference.

The last north-star axis (BASELINE.md "loss curve parity"): function parity
(weight transfer, sampler loop) was proven in rounds 1-2; this harness proves
that *training* agrees. Both frameworks start from IDENTICAL weights (the
reference's random torch init imported into flax via
train/import_torch.flax_from_reference_state_dict), consume IDENTICAL
pre-noised batches (generated once in numpy with the reference SE3Diffuser —
no per-side RNG anywhere in the loop), and run N Adam(amsgrad) steps:

  torch side: the GENUINE reference loss (Experiment.loss_fn,
      train_DFOLD_dynamics.py:1182-1400, bound to a config shim) +
      torch.optim.Adam(amsgrad=True, lr=1e-4) (train:412)
  jax side:   score_forward + train/losses.dfold_loss +
      train/optim.amsgrad(formulation="torch") in one jit step

and compares the per-step loss trajectories and the final weights
(final flax params mapped back into reference state_dict layout).

Everything is float32 on CPU on both sides, so residual differences are
floating-point association order only; the artifact records their growth.

Run: python tools/parity_training.py [--steps 120]   (CPU, ~2 min)
Writes docs/artifacts/train_dynamics_parity.json; exits 0 on PASS.
"""
import argparse
import json
import os
import sys
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import ref_stubs  # noqa: F401,E402  (installs stubs + reference sys.path)

import torch  # noqa: E402

import train_DFOLD_dynamics as ref_train  # noqa: E402
from openfold.utils import rigid_utils as ref_ru  # noqa: E402
from src.data.se3_diffuser import SE3Diffuser as RefSE3  # noqa: E402
from src.model.Dfold_network_dynamic import FullScoreNetwork  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from dynamicpdb_tpu.config import (  # noqa: E402
    EmbedConfig, ExperimentConfig, IPAConfig, ModelConfig,
)
from dynamicpdb_tpu.diffusion.r3_diffuser import R3Config  # noqa: E402
from dynamicpdb_tpu.diffusion.se3_diffuser import (  # noqa: E402
    SE3Config, SE3Diffuser,
)
from dynamicpdb_tpu.diffusion.so3_diffuser import SO3Config  # noqa: E402
from dynamicpdb_tpu.models.score_network import (  # noqa: E402
    DFoldScoreNetwork, score_forward,
)
from dynamicpdb_tpu.train import optim  # noqa: E402
from dynamicpdb_tpu.train.import_torch import (  # noqa: E402
    flax_from_reference_state_dict,
)
from dynamicpdb_tpu.train.losses import dfold_loss  # noqa: E402

F, N = 2, 12
C_S, C_Z, C_H, H, PQ, PV, BLOCKS = 32, 16, 16, 2, 2, 3, 2
SO3_GRID = dict(num_omega=100, num_sigma=50, min_sigma=0.1, max_sigma=1.5)
LR = 1e-4
NUM_BATCHES = 8

MY_CFG = ModelConfig(
    node_embed_size=C_S, edge_embed_size=C_Z, embed=EmbedConfig(),
    ipa=IPAConfig(c_s=C_S, c_z=C_Z, c_hidden=C_H, no_heads=H,
                  no_qk_points=PQ, no_v_points=PV, num_blocks=BLOCKS,
                  coordinate_scaling=1.0),
)


def _ns(**kw):
    return types.SimpleNamespace(**kw)


def build_reference():
    model_conf = _ns(
        node_embed_size=C_S, edge_embed_size=C_Z, frame_time=F, dynamics=True,
        cfg_drop_rate=0.0, cfg_drop_in_train=False, cfg_gamma=2.0,
        embed=_ns(DFOLDv2_embedder=True, index_embed_size=32,
                  aatype_embed_size=32, embed_self_conditioning=False,
                  num_bins=22, min_bin=1e-5, max_bin=20.0, skip_feature=True),
        ipa=_ns(c_s=C_S, c_z=C_Z, c_hidden=C_H, no_heads=H, no_qk_points=PQ,
                no_v_points=PV, num_blocks=BLOCKS, coordinate_scaling=1.0,
                temporal=False),
    )
    diff_conf = _ns(
        diffuse_rot=True, diffuse_trans=True, dynamics=True, frame_time=F,
        so3=_ns(schedule="logarithmic", cache_dir="/tmp/ref_igso3_cache",
                use_cached_score=False, **SO3_GRID),
        r3=_ns(min_b=0.1, max_b=20.0, coordinate_scaling=1.0),
    )
    torch.manual_seed(7)
    # the reference's AF2-style trunc_normal init draws from the GLOBAL
    # numpy RNG (openfold lecun/trunc_normal via scipy) — seed it too or
    # the shared init differs run-to-run
    np.random.seed(7)
    diffuser = RefSE3(diff_conf)
    model = FullScoreNetwork(model_conf, diffuser)
    # zero-init bb updates never move frames; give them real weights so the
    # trunk (and its gradients) are exercised
    with torch.no_grad():
        for b in range(BLOCKS):
            lin = model.score_model.trunk[f"bb_update_{b}"].linear
            lin.weight.copy_(torch.randn_like(lin.weight) * 0.02)
    return model, diffuser, model_conf, diff_conf


# release hyperparameters, run_train.sh:18-22
EXP_SHIM = _ns(
    trans_loss_weight=100.0, rot_loss_weight=7.0, torsion_loss_weight=1.0,
    rot_loss_t_threshold=0.0, separate_rot_loss=False,
    bb_atom_loss_weight=1.0, bb_atom_loss_t_filter=0.25,
    dist_mat_loss_weight=1.0, dist_mat_loss_t_filter=0.25,
    aux_loss_weight=0.25,
)
MY_EXP = ExperimentConfig(
    learning_rate=LR, trans_loss_weight=100.0, rot_loss_weight=7.0,
    torsion_loss_weight=1.0, rot_loss_t_threshold=0.0, grad_clip_norm=0.0,
)


def make_batches(ref_diffuser, rng):
    """NUM_BATCHES pre-noised training batches, generated ONCE with the
    reference (numpy/scipy) diffuser so both sides read identical tensors
    and consume no RNG inside the training loop."""
    # the reference diffuser's forward_marginal samples via the GLOBAL
    # numpy RNG (so3_diffuser.py:311-327) — seed it for run-to-run
    # reproducibility of the generated batches
    np.random.seed(42)
    batches = []
    for _ in range(NUM_BATCHES):
        # consecutive MD frames are sub-A apart; iid frames would push the
        # trans-x0 loss into the reference's >=100 outlier guard and zero
        # the rot/trans terms on both sides (untrainable regime)
        quat0 = rng.normal(size=(1, N, 4))
        quat = np.repeat(quat0, F, axis=0) + rng.normal(size=(F, N, 4)) * 0.02
        quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
        trans0 = rng.normal(size=(1, N, 3)) * 5
        trans = np.repeat(trans0, F, axis=0) + rng.normal(size=(F, N, 3)) * 0.1
        rigids_0 = np.concatenate([quat, trans], -1).astype(np.float32)
        t = float(rng.uniform(0.15, 0.9))
        fm = ref_diffuser.forward_marginal(
            ref_ru.Rigid.from_tensor_7(torch.tensor(rigids_0)), t
        )
        tors = rng.normal(size=(F, N, 7, 2)).astype(np.float32)
        tors /= np.linalg.norm(tors, axis=-1, keepdims=True)
        alt = tors.copy()
        flip = rng.random((F, N, 7, 1)) < 0.3
        alt = np.where(flip, -alt, alt).astype(np.float32)
        batches.append({
            "res_mask": np.ones((F, N), np.float32),
            "fixed_mask": np.zeros((F, N), np.float32),
            "seq_idx": np.tile(np.arange(1, N + 1, dtype=np.int64)[None],
                               (F, 1)),
            "t": np.full((F,), t, np.float32),
            "rigids_t": np.asarray(fm["rigids_t"], np.float32),
            "rigids_0": rigids_0,
            "rot_score": fm["rot_score"].astype(np.float32),
            "trans_score": fm["trans_score"].astype(np.float32),
            "rot_score_scaling": np.full((F,), fm["rot_score_scaling"],
                                         np.float32),
            "trans_score_scaling": np.full((F,), fm["trans_score_scaling"],
                                           np.float32),
            "node_repr": rng.normal(size=(N, 256)).astype(np.float32),
            "edge_repr": rng.normal(size=(N, N, 128)).astype(np.float32),
            "torsion_angles_sin_cos": tors,
            "alt_torsion_angles_sin_cos": alt,
            "torsion_angles_mask": np.ones((F, N, 7), np.float32),
            "force": rng.normal(size=(F, N, 3)).astype(np.float32),
            "vel": rng.normal(size=(F, N, 3)).astype(np.float32),
            "aatype": rng.integers(0, 20, (F, N)),
            "sc_ca_t": np.zeros((F, N, 3), np.float32),
        })
    return batches


def run_torch(ref_model, model_conf, diff_conf, batches, steps,
              snapshot_at=()):
    """Free torch training run; optionally snapshot (weights, Adam state)
    BEFORE the step at each index in snapshot_at, for segment replays."""
    shim = _ns(_model_conf=model_conf, _exp_conf=EXP_SHIM,
               _diff_conf=diff_conf, model=ref_model)
    opt = torch.optim.Adam(ref_model.parameters(), lr=LR, amsgrad=True)
    tbatches = [
        {k: torch.tensor(v) for k, v in b.items()} for b in batches
    ]
    losses, snaps = [], {}
    for step in range(steps):
        if step in snapshot_at:
            snaps[step] = snapshot_torch_state(ref_model, opt)
        batch = dict(tbatches[step % NUM_BATCHES])
        opt.zero_grad()
        loss, _aux = ref_train.Experiment.loss_fn(shim, batch)
        loss.backward()
        opt.step()
        losses.append(float(loss))
    return losses, snaps


def snapshot_torch_state(ref_model, opt):
    sd = {k: v.detach().clone() for k, v in ref_model.state_dict().items()}
    mu, nu, nu_max, count = {}, {}, {}, 0
    for name, p in ref_model.named_parameters():
        st = opt.state.get(p)
        if not st:
            continue
        count = int(st["step"])
        mu[name] = st["exp_avg"].detach().clone()
        nu[name] = st["exp_avg_sq"].detach().clone()
        nu_max[name] = st["max_exp_avg_sq"].detach().clone()
    return {"sd": sd, "mu": mu, "nu": nu, "nu_max": nu_max, "count": count}


def opt_state_from_snapshot(opt, params, snap):
    """Torch Adam state -> our AmsgradState through the same torch->flax
    weight mapping (moments have identical shapes/layouts as their params)."""
    template = opt.init(params)
    if snap["count"] == 0:
        return template
    amsgrad_state = template[0]
    # moment trees must mirror the FULL params pytree ({"params": ...})
    new = amsgrad_state._replace(
        count=jnp.asarray(snap["count"], jnp.int32),
        mu=flax_from_reference_state_dict(snap["mu"], MY_CFG),
        nu=flax_from_reference_state_dict(snap["nu"], MY_CFG),
        nu_max=flax_from_reference_state_dict(snap["nu_max"], MY_CFG),
    )
    return (new,) + tuple(template[1:])


class JaxTrainer:
    def __init__(self):
        self.model = DFoldScoreNetwork(MY_CFG)
        self.diffuser = SE3Diffuser(
            SE3Config(so3=SO3Config(cache_dir=None, series_L=1000,
                                    **SO3_GRID),
                      r3=R3Config(coordinate_scaling=1.0))
        )
        self.opt = optim.amsgrad(LR, formulation="torch")

        def loss_fn(p, feats):
            out = score_forward(self.model, p, self.diffuser, feats)
            total, _aux = dfold_loss(out, feats, MY_EXP)
            return total

        @jax.jit
        def step_fn(p, s, feats):
            loss, grads = jax.value_and_grad(loss_fn)(p, feats)
            updates, s = self.opt.update(grads, s, p)
            return optax.apply_updates(p, updates), s, loss

        self.step_fn = step_fn

    def run(self, params, opt_state, jbatches, start_step, n_steps):
        losses = []
        for step in range(start_step, start_step + n_steps):
            params, opt_state, loss = self.step_fn(
                params, opt_state, jbatches[step % NUM_BATCHES]
            )
            losses.append(float(loss))
        return losses, params, opt_state


def check_grad_parity(params, ref_model, model_conf, diff_conf, batch):
    """Step-0 gradient agreement, leaf by leaf (torch grads mapped into
    flax layout through the same weight mapping). Any systematic loss or
    backprop deviation shows here at f32-noise level."""
    import flax

    shim = _ns(_model_conf=model_conf, _exp_conf=EXP_SHIM,
               _diff_conf=diff_conf, model=ref_model)
    ref_model.zero_grad()
    tb = {k: torch.tensor(v) for k, v in batch.items()}
    loss, _ = ref_train.Experiment.loss_fn(shim, tb)
    loss.backward()
    gsd = {k: p.grad.detach().clone() for k, p in ref_model.named_parameters()
           if p.grad is not None}
    ref_model.zero_grad()

    model = DFoldScoreNetwork(MY_CFG)
    diffuser = SE3Diffuser(
        SE3Config(so3=SO3Config(cache_dir=None, series_L=1000, **SO3_GRID),
                  r3=R3Config(coordinate_scaling=1.0))
    )
    feats = {k: jnp.asarray(v) for k, v in batch.items()}

    def lf(p):
        out = score_forward(model, p, diffuser, feats)
        return dfold_loss(out, feats, MY_EXP)[0]

    jgrads = jax.grad(lf)(params)
    gflax = flax_from_reference_state_dict(gsd, MY_CFG)
    a = flax.traverse_util.flatten_dict(jgrads["params"])
    b = flax.traverse_util.flatten_dict(gflax["params"])
    worst = 0.0
    for k in a:
        x, y = np.asarray(a[k]), np.asarray(b[k])
        # scale-relative: absolute diff over leaf gradient magnitude + 1
        worst = max(worst,
                    float(np.abs(x - y).max()) /
                    (1.0 + float(np.abs(y).max())))
    return worst


def compare_final_weights(params, init_sd, ref_model):
    """Trained-weight agreement measured against how far training MOVED the
    weights (abs diff alone conflates f32 chaos with real deviations; a
    near-zero-gradient leaf's 'relative' diff is meaningless)."""
    import flax

    ref_as_flax = flax_from_reference_state_dict(
        ref_model.state_dict(), MY_CFG
    )
    init_as_flax = flax_from_reference_state_dict(init_sd, MY_CFG)
    a = flax.traverse_util.flatten_dict(params["params"])
    b = flax.traverse_util.flatten_dict(ref_as_flax["params"])
    w0 = flax.traverse_util.flatten_dict(init_as_flax["params"])
    assert set(a) == set(b), "param tree mismatch"
    diff_sq, move_sq, worst_abs = 0.0, 0.0, 0.0
    for k in a:
        x, y, z = np.asarray(a[k]), np.asarray(b[k]), np.asarray(w0[k])
        diff_sq += float(((x - y) ** 2).sum())
        move_sq += float(((y - z) ** 2).sum())
        worst_abs = max(worst_abs, float(np.abs(x - y).max()))
    return worst_abs, (diff_sq / (move_sq + 1e-30)) ** 0.5


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))),
            "docs", "artifacts", "train_dynamics_parity.json"),
    )
    args = ap.parse_args(argv)

    torch.set_num_threads(2)
    ref_model, ref_diffuser, model_conf, diff_conf = build_reference()
    init_sd = {k: v.detach().clone()
               for k, v in ref_model.state_dict().items()}
    params = flax_from_reference_state_dict(ref_model.state_dict(), MY_CFG)
    batches = make_batches(ref_diffuser, np.random.default_rng(11))

    grad_dev = check_grad_parity(params, ref_model, model_conf, diff_conf,
                                 batches[0])

    trainer = JaxTrainer()
    jbatches = [{k: jnp.asarray(v) for k, v in b.items()} for b in batches]

    # free jax run from the shared init
    opt_state0 = trainer.opt.init(params)
    jax_losses, final_params, _ = trainer.run(
        params, opt_state0, jbatches, 0, args.steps
    )

    # free torch run, snapshotting (weights + Adam moments) for replays
    seg_len = 10
    seg_starts = [s for s in range(0, args.steps, 30)]
    torch_losses, snaps = run_torch(
        ref_model, model_conf, diff_conf, batches, args.steps,
        snapshot_at=set(seg_starts),
    )

    # SEGMENT REPLAYS: restart jax from each torch snapshot (weights AND
    # optimizer moments) and track the next seg_len steps. Chaos cannot
    # compound across segments, so a tight gate holds at every training
    # regime (early, mid, converged) — this is the stepwise proof. The free
    # run above documents (but does not tightly gate) whole-run agreement.
    seg_max_rel = {}
    for s in seg_starts:
        snap = snaps[s]
        p_s = flax_from_reference_state_dict(snap["sd"], MY_CFG)
        os_s = opt_state_from_snapshot(trainer.opt, p_s, snap)
        n = min(seg_len, args.steps - s)
        seg_losses, _, _ = trainer.run(p_s, os_s, jbatches, s, n)
        ref_seg = torch_losses[s:s + n]
        seg_max_rel[s] = max(
            abs(a - b) / max(abs(b), 1e-12)
            for a, b in zip(seg_losses, ref_seg)
        )

    rel = [abs(a - b) / max(abs(b), 1e-12)
           for a, b in zip(jax_losses, torch_losses)]
    w_abs, w_move_rel = compare_final_weights(final_params, init_sd,
                                              ref_model)

    # Gate structure:
    #  - value + gradient parity at step 0 at f32-noise level: any
    #    systematic loss/masking/optimizer deviation shows HERE
    #  - every replayed segment (fresh sync of weights+moments from torch)
    #    agrees tightly for its 10 steps — stepwise-identical dynamics in
    #    every regime of the run
    #  - the FREE runs (never re-synced) diverge only by f32 association-
    #    order noise amplified through Adam; gated loosely and documented
    #    (both sides are f32; neither order is 'correct')
    gates = {
        "loss0_rel_lt_1e-5": rel[0] < 1e-5,
        "grad0_dev_lt_1e-5": grad_dev < 1e-5,
        "every_segment_replay_rel_lt_1e-3":
            max(seg_max_rel.values()) < 1e-3,
        "free_run_final_loss_rel_lt_0.15": rel[-1] < 0.15,
        "both_converged": torch_losses[-1] < 0.5 * torch_losses[0]
        and jax_losses[-1] < 0.5 * jax_losses[0],
        "free_run_weight_dev_lt_30pct_of_movement": w_move_rel < 0.3,
    }
    ok = all(gates.values())

    artifact = {
        "steps": args.steps,
        "lr": LR,
        "optimizer": "Adam(amsgrad=True) / amsgrad(formulation='torch')",
        "loss_first": {"torch": torch_losses[0], "jax": jax_losses[0]},
        "loss_last": {"torch": torch_losses[-1], "jax": jax_losses[-1]},
        "step0_grad_max_scaled_dev": grad_dev,
        "segment_replay_max_rel_loss_diff":
            {str(k): v for k, v in seg_max_rel.items()},
        "free_run_max_rel_loss_diff_steps_0_9": max(rel[:10]),
        "free_run_max_rel_loss_diff_all": max(rel),
        "free_run_rel_diff_curve_every_10": rel[::10],
        "final_weight_max_abs_diff": w_abs,
        "final_weight_dev_over_movement": w_move_rel,
        "torch_losses_every_10": torch_losses[::10],
        "jax_losses_every_10": jax_losses[::10],
        "gates": gates,
        "pass": bool(ok),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=2)

    print(f"loss[0]   torch={torch_losses[0]:.6f} jax={jax_losses[0]:.6f}")
    print(f"loss[-1]  torch={torch_losses[-1]:.6f} jax={jax_losses[-1]:.6f}")
    print(f"step-0 grad max scaled dev: {grad_dev:.2e}")
    print("segment replays (start: max rel loss diff over 10 steps):")
    for s, v in seg_max_rel.items():
        print(f"  step {s:4d}: {v:.2e}")
    print(f"free-run max rel diff steps 0-9: {max(rel[:10]):.2e}")
    print(f"free-run max rel diff all: {max(rel):.2e}")
    print(f"final weights: max abs {w_abs:.2e}  "
          f"dev/movement {w_move_rel:.3f}")
    for k, v in gates.items():
        print(f"  gate {k}: {'ok' if v else 'FAIL'}")
    print("TRAIN-DYNAMICS PARITY:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
