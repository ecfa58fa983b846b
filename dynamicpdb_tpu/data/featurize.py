"""On-device window featurization.

TPU-first redesign of the reference's per-item CPU featurization
(/root/reference/src/data/Dfold_data_loader_dynamic.py:192-364): instead of
running openfold transforms + numpy diffusers in DataLoader worker processes,
the whole chain — atom37 -> frames -> torsions -> forward diffusion — is pure
jnp and lives INSIDE the jitted train step. The host pipeline only mmaps and
stacks raw windows; featurization rides the accelerator and fuses with the
model forward.

Raw window contract (numpy, one training example):
    atom37      [F, N, 37, 3]  float  (already masked, Angstroms)
    atom37_mask [N, 37]        float
    aatype      [N]            int
    residue_index [N]          int
    force       [F, N, 3]      float  (C-alpha forces)
    vel         [F, N, 3]      float  (C-alpha velocities)
    node_repr   [N, Dn]        float  (OmegaFold node embedding)
    edge_repr   [N, N, De]     float  (OmegaFold edge embedding)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from dynamicpdb_tpu.ops import frames as frame_ops


def featurize_window(raw: dict) -> dict:
    """Geometry featurization (no diffusion): frames + torsions + masks.

    Matches the loader's transform chain (Dfold_data_loader_dynamic.py:
    237-258, parse_dynamics_chain_feats_no_norm at :82-88 — no centering).
    """
    atom37 = raw["atom37"].astype(jnp.float32)
    mask37 = raw["atom37_mask"].astype(jnp.float32)
    aatype = raw["aatype"].astype(jnp.int32)
    F = atom37.shape[0]

    atom37 = atom37 * mask37[None, ..., None]
    res_mask = mask37[:, 1]  # C-alpha presence

    per_frame = jax.vmap(
        lambda a: frame_ops.atom37_to_frames(aatype, a, mask37)["backbone_rigid"]
    )
    rigids_0 = per_frame(atom37)

    torsions = jax.vmap(
        lambda a: frame_ops.atom37_to_torsion_angles(aatype, a, mask37)
    )(atom37)

    tile = lambda x: jnp.broadcast_to(x[None], (F,) + x.shape)
    return {
        "aatype": tile(aatype),
        "seq_idx": tile(raw["residue_index"].astype(jnp.int32)),
        "res_mask": tile(res_mask),
        "fixed_mask": jnp.zeros((F,) + res_mask.shape, jnp.float32),
        "rigids_0": rigids_0.to_tensor_7(),
        "torsion_angles_sin_cos": torsions["torsion_angles_sin_cos"],
        "alt_torsion_angles_sin_cos": torsions["alt_torsion_angles_sin_cos"],
        "torsion_angles_mask": torsions["torsion_angles_mask"],
        "atom37_pos": atom37,
        "atom37_mask": tile(mask37),
        "force": raw["force"].astype(jnp.float32),
        "vel": raw["vel"].astype(jnp.float32),
        "node_repr": raw["node_repr"].astype(jnp.float32),
        "edge_repr": raw["edge_repr"].astype(jnp.float32),
    }


def perturb_conditioning_rigids(
    key, rigids_0: jnp.ndarray, trans_std: float, rot_std_rad: float
) -> jnp.ndarray:
    """Exposure-bias robustifier (beyond-reference, opt-in): compose a small
    random SE(3) error onto the CONDITIONING frames (all but the last) of a
    training window's rigids_0 [F, N, 7], leaving the target frame — the
    label — clean.

    Rationale: the autoregressive rollout slides the rigid window with the
    model's own predictions (sampling/reverse.py rollout), so at serving
    time the conditioning frames carry prediction error the one-step
    training regime never exposes — measured to compound near-ballistically
    over 1000 frames (docs/artifacts/rollout_quality_1000.json). This
    simulates that regime at training time: per-residue Gaussian rotation
    (rotvec, std rot_std_rad) composed in the local frame and Gaussian
    translation (std trans_std, Angstrom), both scaled by a per-window
    u ~ U(0,1) so the model sees the clean-to-noisy spectrum.
    """
    from dynamicpdb_tpu.ops import so3

    k_u, k_r, k_t = jax.random.split(key, 3)
    shape = rigids_0.shape[:-1]  # [F, N]
    u = jax.random.uniform(k_u, ())
    rotvec = rot_std_rad * u * jax.random.normal(k_r, shape + (3,))
    dtrans = trans_std * u * jax.random.normal(k_t, shape + (3,))
    # no re-normalization: the product of two ~unit quats stays ~unit and
    # downstream Rigid.from_tensor_7 normalizes anyway — and multiplying by
    # the exact identity quat makes the zero-std path bit-identical input
    q = so3.quat_multiply(rigids_0[..., :4], so3.rotvec_to_quat(rotvec))
    pert = jnp.concatenate([q, rigids_0[..., 4:] + dtrans], axis=-1)
    return jnp.concatenate([pert[:-1], rigids_0[-1:]], axis=0)


def diffuse_training_window(key, feats: dict, diffuser, min_t: float) -> dict:
    """Sample t ~ U(min_t, 1) and noise ALL F frames (loader :333-340)."""
    from dynamicpdb_tpu.ops.rigid import Rigid

    k_t, k_diff = jax.random.split(key)
    t = jax.random.uniform(k_t, (), minval=min_t, maxval=1.0)
    rigids_0 = Rigid.from_tensor_7(feats["rigids_0"])
    diff = diffuser.forward_marginal(k_diff, rigids_0, t)
    F = feats["rigids_0"].shape[0]
    out = dict(feats)
    out.update(
        {
            "rigids_t": diff["rigids_t"],
            "rot_score": diff["rot_score"],
            "trans_score": diff["trans_score"],
            "rot_score_scaling": jnp.full((F,), diff["rot_score_scaling"]),
            "trans_score_scaling": jnp.full((F,), diff["trans_score_scaling"]),
            "t": jnp.full((F,), t),
        }
    )
    return out


def eval_init_window(key, feats: dict, diffuser) -> dict:
    """t=1 reference-noise init for sampling (loader :341-356)."""
    F, N = feats["res_mask"].shape
    rigids_t = diffuser.sample_ref(key, (F, N))
    rot_scaling, trans_scaling = diffuser.score_scaling(1.0)
    out = dict(feats)
    out.update(
        {
            "rigids_t": rigids_t,
            "t": jnp.ones((F,)),
            "rot_score_scaling": jnp.full((F,), rot_scaling),
            "trans_score_scaling": jnp.full((F,), trans_scaling),
        }
    )
    return out
