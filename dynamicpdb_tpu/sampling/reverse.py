"""Reverse-diffusion sampling and autoregressive rollout, fully on device.

TPU-first rebuild of the reference's inference path
(/root/reference/train_DFOLD_dynamics.py:1425-1547 inference_fn and
:931-1000 eval_extension). The reference runs a Python loop with a
device->numpy->scipy->device round-trip per step (se3_diffuser.py:186-215);
here the whole chain is one jit: `lax.scan` over reverse steps, and the
long-horizon rollout is an outer `lax.scan` carrying the sliding window — so
a 1000-frame extension is a single XLA computation.

Step semantics preserved:
  * reverse_steps = linspace(min_t, 1, num_t)[::-1], dt = 1/num_t;
  * for t > min_t: model forward -> scores -> SE(3) reverse SDE step (with
    CoM centering and noise_scale);
  * at the final step (t == min_t): rigids_t <- the model's x0 prediction
    directly (train:1501-1503) — the reverse SDE is never evaluated at
    t = min_t, where the score magnitude ~1/Var(t) diverges;
  * optional classifier-free guidance mixes ref/unref trans scores
    (train:1477-1484);
  * window slide for rollout: rigids_0 <- cat(pred[1:], pred[-1:])
    (train:996).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from dynamicpdb_tpu.models.score_network import score_forward
from dynamicpdb_tpu.ops.rigid import Rigid


def set_t_feats(diffuser, feats: dict[str, Any], t) -> dict[str, Any]:
    """Set t + score scalings on a featurized window (_set_t_feats,
    train:1408-1413). Shared by the sequential and Picard samplers so the
    time featurization cannot silently diverge between them."""
    F = feats["res_mask"].shape[0]
    rot_s, trans_s = diffuser.score_scaling(t)
    out = dict(feats)
    out["t"] = jnp.full((F,), t)
    out["rot_score_scaling"] = jnp.full((F,), rot_s)
    out["trans_score_scaling"] = jnp.full((F,), trans_s)
    return out


def diffuse_mask_of(feats: dict[str, Any]):
    return (
        1 - feats["fixed_mask"].astype(jnp.float32)
    ) * feats["res_mask"].astype(jnp.float32)


def reverse_sample(
    key,
    module,
    params,
    diffuser,
    init_feats: dict[str, Any],
    *,
    num_t: int = 10,
    min_t: float = 0.01,
    noise_scale: float = 1.0,
    center: bool = True,
    cfg_gamma: float | None = None,
    aux_traj: bool = False,
):
    """Run the reverse diffusion for one window.

    init_feats: featurized window with rigids_t already set to reference
    noise (see data/featurize.eval_init_window). Returns dict with the final
    prediction and (optionally) per-step trajectories ordered time-forward
    (index 0 = final denoised state, matching the reference's flip).
    """
    reverse_steps = jnp.linspace(min_t, 1.0, num_t)[::-1]
    dt = 1.0 / num_t

    def set_t(feats, t):
        return set_t_feats(diffuser, feats, t)

    def model_fwd(feats, drop_ref=False):
        return score_forward(module, params, diffuser, feats, drop_ref=drop_ref)

    def step(carry, t):
        rigids_t7, key = carry
        key, sub = jax.random.split(key)
        feats = set_t(dict(init_feats, rigids_t=rigids_t7), t)
        out = model_fwd(feats)
        rot_score, trans_score = out["rot_score"], out["trans_score"]
        if cfg_gamma is not None:
            out_unref = model_fwd(feats, drop_ref=True)
            trans_score = out_unref["trans_score"] + cfg_gamma * (
                trans_score - out_unref["trans_score"]
            )
        diffuse_mask = diffuse_mask_of(init_feats)
        next_rigids = diffuser.reverse(
            sub,
            Rigid.from_tensor_7(rigids_t7),
            rot_score,
            trans_score,
            t,
            dt,
            diffuse_mask=diffuse_mask,
            center=center,
            noise_scale=noise_scale,
        )
        ys = (out["atom37"], out["rigids"]) if aux_traj else None
        return (next_rigids.to_tensor_7(), key), ys

    carry, ys = jax.lax.scan(
        step, (init_feats["rigids_t"], key), reverse_steps[:-1]
    )
    rigids_t7, key = carry

    # final step at t = min_t: take the model x0 directly
    feats = set_t(dict(init_feats, rigids_t=rigids_t7), min_t)
    out = model_fwd(feats)

    result = {
        "rigids": out["rigids"],
        "atom37": out["atom37"],
        "atom14": out["atom14"],
        "angles": out["angles"],
    }
    if aux_traj:
        atom37_traj, rigid_traj = ys
        # time-forward order: final prediction first (reference flip)
        result["prot_traj"] = jnp.concatenate(
            [out["atom37"][None], atom37_traj[::-1]], axis=0
        )
        result["rigid_traj"] = jnp.concatenate(
            [out["rigids"][None], rigid_traj[::-1]], axis=0
        )
    return result


def make_sampler(module, diffuser, *, num_t=10, min_t=0.01, noise_scale=1.0,
                 center=True, cfg_gamma=None, aux_traj=False):
    """jit-compiled single-window sampler."""

    @jax.jit
    def fn(params, key, init_feats):
        return reverse_sample(
            key, module, params, diffuser, init_feats,
            num_t=num_t, min_t=min_t, noise_scale=noise_scale, center=center,
            cfg_gamma=cfg_gamma, aux_traj=aux_traj,
        )

    return fn


def refresh_window_conditioning(pred_rigids_t7, pred_angles, dt_ps):
    """Re-derive the slidable conditioning channels from a window of
    PREDICTED frames, for autoregressive rollouts past the data horizon.

    vel[f] = (ca[f] - ca[f-1]) / dt_ps — the backward finite difference the
    dynamicPDB release defines velocities by (1 ps frame spacing;
    data/realistic.py uses the identical convention), with the first frame
    backfilled. ca is the rigid translation: the AF2 backbone frame origin
    IS the C-alpha. Because the score trunk zeroes updates on reference
    frames, pred[0..F-2] equal the clean conditioning frames, so at F=2
    the derived vel is exactly the cross-window difference
    (pred_target - conditioning)/dt. The window then slides like the
    rigids: cat(x[1:], x[-1:]) (train:996 slide semantics).

    Returns (vel [F, N, 3], angles [F, N, 7, 2]) for the NEXT window.
    Forces are NOT re-derivable at inference (no force field); callers
    keep that channel frozen.
    """
    ca = pred_rigids_t7[..., 4:]
    vel = (ca[1:] - ca[:-1]) / dt_ps
    vel = jnp.concatenate([vel[:1], vel], axis=0)  # backfill frame 0
    next_vel = jnp.concatenate([vel[1:], vel[-1:]], axis=0)
    next_angles = jnp.concatenate(
        [pred_angles[1:], pred_angles[-1:]], axis=0
    )
    return next_vel, next_angles


def rollout(
    key,
    module,
    params,
    diffuser,
    init_feats: dict[str, Any],
    *,
    n_steps: int,
    num_t: int = 10,
    min_t: float = 0.01,
    noise_scale: float = 1.0,
    center: bool = True,
    fast_x0: bool = False,
    refresh_conditioning: bool = False,
    dt_ps: float = 1.0,
):
    """Autoregressive long-horizon extension (eval_extension, train:931-1000)
    as ONE jitted double-scan: each outer step denoises a fresh window, then
    slides it with rigids_0 <- cat(pred[1:], pred[-1:]).

    Faithful-to-reference default: only the rigid window slides. The
    force/velocity/torsion-angle conditioning channels in ``init_feats``
    stay frozen at the INITIAL window for the whole rollout (the reference
    never re-derives them either, train:982-996), so for long horizons
    those channels go progressively stale relative to the predicted frames.
    ``refresh_conditioning=True`` (beyond-reference, opt-in) re-derives the
    velocity channel from the predicted rigid translations (backward
    finite difference over ``dt_ps``) and slides the torsion-angle window
    with the model's own predicted angles — see
    refresh_window_conditioning. Forces stay frozen either way (not
    re-derivable without a force field).

    MEASURED NEGATIVE on realistic synthetic dynamics
    (docs/artifacts/rollout_refresh.json; tools/rollout_refresh_experiment
    .py): 32-frame horizon median Ca RMSD — oracle GT conditioning 3.74 A
    < frozen 4.12 < refresh 7.13. Root cause: the training windows carry
    the TARGET frame's true velocity (the reference's data layout,
    Dfold_data_loader_dynamic.py:192-198), so the net learns to read
    where the target moved; a self-derived velocity cannot supply that
    signal and additionally feeds back prediction error, while frozen
    channels stay in-distribution. Hence frozen is the default; the flag
    remains for A/Bs on real MD data.

    fast_x0=True exploits an exact algebraic property of THIS architecture:
    the network is an x0-predictor conditioned on the clean reference
    frames — rigids_t/t enter only the analytic score conversion, never the
    predicted rigids/atoms — and the sampler's final step takes the model
    x0 directly. The reverse trajectory therefore cannot influence the
    returned frames, and ONE forward per frame produces bit-identical
    rollouts to the full num_t-step sampler (regression-tested:
    tests/test_sampler.py::test_fast_x0_rollout_identical). Measured on
    v5e this is NOT faster (262.9 vs 274.9 fps): the in-scan forward is
    loop-invariant and XLA's code motion already hoists it, so the full
    sampler executes ~1 real forward per frame anyway (docs/DESIGN.md).
    The flag is semantic clarity + insurance against non-hoisting
    compilers, not a measured win.

    Returns (atom37_traj [n_steps, N, 37, 3], rigid_traj [n_steps, N, 7]).
    """
    F, N = init_feats["res_mask"].shape

    def outer(carry, _):
        # the carry holds vel/angles only on the refresh path; the frozen
        # default carries exactly what it did before the flag existed (no
        # dead loop state, no new feature-key requirements)
        if refresh_conditioning:
            rigids_0, vel, angles_sc, key = carry
        else:
            rigids_0, key = carry
        key, k_ref, k_rev = jax.random.split(key, 3)
        feats = dict(init_feats)
        feats["rigids_0"] = rigids_0
        if refresh_conditioning:
            feats["vel"] = vel
            feats["torsion_angles_sin_cos"] = angles_sc
        if fast_x0:
            # rigids_t only feeds the score conversion; identity is fine
            feats["rigids_t"] = jnp.broadcast_to(
                jnp.zeros((7,)).at[0].set(1.0), (F, N, 7)
            )
            feats = set_t_feats(diffuser, feats, min_t)
            out = score_forward(module, params, diffuser, feats)
        else:
            feats["rigids_t"] = diffuser.sample_ref(k_ref, (F, N))
            out = reverse_sample(
                k_rev, module, params, diffuser, feats,
                num_t=num_t, min_t=min_t, noise_scale=noise_scale,
                center=center,
            )
        pred = out["rigids"]
        next_rigids_0 = jnp.concatenate([pred[1:], pred[-1:]], axis=0)
        if refresh_conditioning:
            next_vel, next_angles = refresh_window_conditioning(
                pred, out["angles"], dt_ps
            )
            next_carry = (next_rigids_0, next_vel, next_angles, key)
        else:
            next_carry = (next_rigids_0, key)
        return next_carry, (out["atom37"][-1], pred[-1])

    if refresh_conditioning:
        carry0 = (
            init_feats["rigids_0"],
            init_feats["vel"],
            init_feats["torsion_angles_sin_cos"],
            key,
        )
    else:
        carry0 = (init_feats["rigids_0"], key)
    _, (atom_traj, rigid_traj) = jax.lax.scan(
        outer, carry0, None, length=n_steps
    )
    return atom_traj, rigid_traj


def batched_rollout(
    key,
    module,
    params,
    diffuser,
    init_feats_batch: dict[str, Any],
    *,
    n_steps: int,
    num_t: int = 10,
    min_t: float = 0.01,
    noise_scale: float = 1.0,
    center: bool = True,
    fast_x0: bool = False,
):
    """Throughput-oriented rollout: vmap the full autoregressive extension
    over a leading batch axis of DIFFERENT windows (multiple proteins, or
    different starting windows of one trajectory). A serving capability
    beyond the reference (its eval_extension is strictly one trajectory per
    Python loop, train:931-1000); on TPU the batched trajectories share one
    XLA computation and the MXU work batches across them.

    NOTE on stochastic replicas: identical windows under different PRNG
    streams produce IDENTICAL trajectories — the architecture is an
    x0-predictor whose returned frames do not depend on the noise
    trajectory (see rollout's fast_x0 note) — so replicate inputs only to
    vary the conditioning, not the seed.

    init_feats_batch: featurized windows stacked on axis 0 ([B, F, N, ...]).
    Returns (atom37_traj [B, n_steps, N, 37, 3],
    rigid_traj [B, n_steps, N, 7]).
    """
    batch = jax.tree_util.tree_leaves(init_feats_batch)[0].shape[0]
    keys = jax.random.split(key, batch)

    def one(k, feats):
        return rollout(
            k, module, params, diffuser, feats,
            n_steps=n_steps, num_t=num_t, min_t=min_t,
            noise_scale=noise_scale, center=center, fast_x0=fast_x0,
        )

    return jax.vmap(one)(keys, init_feats_batch)
