"""DFOLD score network (flax) — the trajectory-diffusion denoiser.

TPU-native rebuild of the reference FullScoreNetwork + DFOLDIpaScore
(/root/reference/src/model/Dfold_network_dynamic.py:429-546,
 /root/reference/src/model/ipa_pytorch_dynamic.py:726-908).

The network operates on ONE window of F frames x N residues (the reference
flattens [B, F] -> [B*F] and treats dim-0 as frames; here the window is the
native unit and data-parallel batching is vmap/shard_map on the outside).

Conditioning semantics preserved exactly:
  * frames 0..F-2 are clean references; the prediction slot F-1 is
    initialized with a COPY of frame F-2 ("ref-cat", ipa_pytorch_dynamic.py:
    819-845) for rigids, forces, velocities and torsion angles;
  * only the last frame's rigid is updated per block (update zeroed on
    references, :869);
  * node features = index embedding + expanded OmegaFold node_repr
    (the DFOLDv2_Embeder LayerNorm outputs are computed-then-overwritten in
    the reference, :829-834 — that dead path is dropped here);
  * edge features = expanded OmegaFold edge_repr, one [N, N, c_z] tensor
    shared by all frames;
  * x0-prediction converted to rot/trans scores against the noisy rigids_t
    analytically via the diffuser (:883-897) — done OUTSIDE the nn module in
    ``score_forward`` so the module stays diffuser-agnostic;
  * internal/output coordinate scale: final rigids are unscale()d by
    ipa.coordinate_scaling exactly like the reference (:890), which is
    identity at the release config's coordinate_scaling=1.0.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from dynamicpdb_tpu.config import ModelConfig
from dynamicpdb_tpu.models.ipa import InvariantPointAttention
from dynamicpdb_tpu.models.layers import (
    AngleResnet,
    BackboneUpdate,
    ConvNet,
    GlobalStatNorm,
    Linear,
    MLPEmbedder,
)
from dynamicpdb_tpu.ops import frames as frame_ops
from dynamicpdb_tpu.ops.rigid import Rigid
from dynamicpdb_tpu.parallel import sp


def _ref_cat(x):
    """[F, ...] -> references + copy of F-2 in the last slot."""
    return jnp.concatenate([x[:-1], x[-2:-1]], axis=0)


class DFoldScoreNetwork(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, feats: dict[str, Any], drop_ref: bool = False):
        """Returns the raw x0 prediction for the window.

        feats (single window):
          rigids_t [F,N,7], rigids_0 [F,N,7], res_mask [F,N], fixed_mask [F,N]
          seq_idx [F,N] int, node_repr [N,Dn], edge_repr [N,N,De],
          torsion_angles_sin_cos [F,N,7,2], torsion_angles_mask [F,N,7],
          force [F,N,3], vel [F,N,3], aatype [F,N] int
        Outputs dict: rigids (tensor-7, unscaled), angles, unorm_angles,
          rigid_update, atom14, atom37.
        """
        cfg = self.cfg
        ipa_cfg = cfg.ipa
        D = cfg.node_embed_size
        # mixed precision: heavy feature stacks (embedders, ConvNet, angle
        # head) run in compute_dtype; geometry (rigids, scores, atoms) and
        # IPA logits stay float32
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None

        node_mask = feats["res_mask"].astype(jnp.float32)  # [F, N]
        diffuse_mask = (1 - feats["fixed_mask"].astype(jnp.float32)) * node_mask
        F, N = node_mask.shape

        # OmegaFold representation expansion (Dfold_network_dynamic.py:444-445)
        expand_node = Linear(D, "torch", name="expand_node")(feats["node_repr"])
        # sequence parallelism (parallel/sp.py): the O(N^2) edge tensors are
        # sharded over 'seq' on their query axis; identities when inactive.
        # The RAW input is constrained too so the expansion matmul (and its
        # backward) never materializes an unsharded [N, N, c] buffer.
        expand_edge = Linear(cfg.edge_embed_size, "torch", name="expand_edge")(
            sp.shard(feats["edge_repr"], "seq")
        )  # [N, N, c_z], frame-shared
        expand_edge = sp.shard(expand_edge, "seq")

        # conditioning inputs with the prediction slot seeded from frame F-2.
        # drop_ref implements WORKING classifier-free guidance: the reference
        # accepts-but-ignores drop_ref (ipa_pytorch_dynamic.py:798, SURVEY §4
        # known defect) so its CFG mixes two identical passes; here drop=1
        # replaces the reference-frame conditioning (rigids/forces/vels/
        # angles) with the unconditional identity. Accepts python bools or
        # traced 0/1 floats (for per-step random drops under jit).
        keep = 1.0 - jnp.asarray(drop_ref, jnp.float32)
        curr_rigids = _ref_cat(feats["rigids_0"].astype(jnp.float32))
        identity7 = jnp.zeros_like(curr_rigids).at[..., 0].set(1.0)
        curr_rigids = keep * curr_rigids + (1 - keep) * identity7
        force = _ref_cat(feats["force"].astype(jnp.float32)) * keep
        vel = _ref_cat(feats["vel"].astype(jnp.float32)) * keep
        angle = feats["torsion_angles_sin_cos"].astype(jnp.float32)
        angle = angle * feats["torsion_angles_mask"][..., None].astype(jnp.float32)
        angle = _ref_cat(angle).reshape(F, N, -1) * keep  # [F, N, 14]

        # mask= keeps every GlobalStatNorm statistic over REAL residues
        # only: pad rows carry bias-derived constants that would otherwise
        # make real-residue outputs depend on pad_to (see layers.py)
        force_embed = MLPEmbedder(D, dtype=dtype, name="force_embeder")(
            force, mask=node_mask)
        vel_embed = MLPEmbedder(D, dtype=dtype, name="vel_embeder")(
            vel, mask=node_mask)
        angle_embed = MLPEmbedder(D, dtype=dtype, name="angle_embeder")(
            angle, mask=node_mask)

        # node features: index embedding (frame-shared) + OmegaFold node repr
        seq_idx = feats["seq_idx"][0:1, :, None].astype(jnp.float32)  # [1, N, 1]
        node_embed = MLPEmbedder(D, dtype=dtype, name="index_embeder")(
            seq_idx, mask=node_mask[0:1])
        node_embed = jnp.broadcast_to(node_embed, (F, N, D))
        node_embed = node_embed + expand_node[None]
        if cfg.embed.use_aatype_embedding:
            aatype_embed = nn.Embed(
                21, D, name="aatype_embed",
            )(feats["aatype"][0])  # [N, D], frame-shared
            node_embed = node_embed + aatype_embed[None]
        node_embed = node_embed * node_mask[..., None]
        node_embed = sp.shard(node_embed, None, "seq")
        edge_embed = expand_edge

        rigid_embeder = MLPEmbedder(D, dtype=dtype, name="rigid_embeder")
        conv = ConvNet(ipa_cfg.c_s * 5, dtype=dtype, name="conv_0")

        init_node_feat = None
        rigid_update = None
        for b in range(ipa_cfg.num_blocks):
            rigids_embed = rigid_embeder(curr_rigids, mask=node_mask)
            # dtype: bf16 projections, f32 logits/softmax/geometry/output
            # (see InvariantPointAttention docstring)
            ipa_block = InvariantPointAttention(
                ipa_cfg, dtype=dtype, name=f"ipa_{b}"
            )
            if cfg.remat:
                # recompute the O(N^2) attention activations on the backward
                # pass: memory O(1) in num_blocks for long sequences
                ipa_apply = nn.remat(type(ipa_block).__call__)
                ipa_out = ipa_apply(
                    ipa_block, node_embed, edge_embed,
                    Rigid.from_tensor_7(curr_rigids), node_mask,
                )
            else:
                ipa_out = ipa_block(
                    node_embed, edge_embed,
                    Rigid.from_tensor_7(curr_rigids), node_mask,
                )
            ipa_out = GlobalStatNorm()(ipa_out, mask=node_mask)
            ipa_out = sp.shard(ipa_out, None, "seq")
            node_feat = jnp.concatenate(
                [rigids_embed, ipa_out, force_embed, vel_embed, angle_embed],
                axis=-1,
            )  # [F, N, 5*c_s]
            # ConvNet masks pad rows between EVERY conv stage (layers.py):
            # boundary real residues then read zeros whatever pad_to is
            node_feat = conv(
                node_feat.astype(dtype) if dtype else node_feat,
                mask=node_mask,
            ).astype(jnp.float32)  # frame-time mixing
            node_feat = sp.shard(node_feat, None, "seq")

            rigid_update = BackboneUpdate(name=f"bb_update_{b}")(node_feat)
            # never move the reference frames (ipa_pytorch_dynamic.py:869)
            last_only = jnp.zeros((F, 1, 1)).at[-1].set(1.0)
            rigid_update = rigid_update * last_only

            curr = Rigid.from_tensor_7(curr_rigids)
            curr = curr.compose_q_update_vec(rigid_update, diffuse_mask[..., None])
            curr_rigids = curr.to_tensor_7()

            if b == 0:
                init_node_feat = node_feat

        unorm_angles, angles = AngleResnet(
            ipa_cfg.c_s * 5, no_blocks=2, no_angles=7, eps=1e-12, dtype=dtype,
            name="angle_resnet",
        )(node_feat, init_node_feat)

        # unscale exactly like the reference exit path (identity at scaling=1)
        final = Rigid.from_tensor_7(curr_rigids).scale_translation(
            1.0 / ipa_cfg.coordinate_scaling
        )

        # fixed-mask passthrough for angles (Dfold_network_dynamic.py:517-519)
        fixed = feats["fixed_mask"].astype(jnp.float32)[..., None, None]
        gt_angles = feats["torsion_angles_sin_cos"].astype(jnp.float32)
        angles = (1 - fixed) * angles + fixed * gt_angles
        unorm_angles = (1 - fixed) * unorm_angles + fixed * gt_angles

        # all-atom reconstruction from predicted rigids + torsions
        aatype = feats["aatype"]
        all_frames = frame_ops.torsion_angles_to_frames(final, angles, aatype)
        atom14 = frame_ops.frames_to_atom14_pos(all_frames, aatype)
        atom37, _ = frame_ops.atom14_to_atom37(atom14, aatype)

        return {
            "rigids": final.to_tensor_7(),
            "angles": angles,
            "unorm_angles": unorm_angles,
            "rigid_update": rigid_update,
            "atom14": atom14,
            "atom37": atom37,
        }


def score_forward(module, params, diffuser, feats, drop_ref: bool = False):
    """Model forward + analytic score conversion (the reference's full
    FullScoreNetwork.forward contract: x0 prediction -> rot/trans scores
    against the noisy rigids_t, ipa_pytorch_dynamic.py:883-897)."""
    out = module.apply(params, feats, drop_ref)
    node_mask = feats["res_mask"].astype(jnp.float32)
    t = feats["t"]
    init = Rigid.from_tensor_7(feats["rigids_t"].astype(jnp.float32))
    pred = Rigid.from_tensor_7(out["rigids"])

    rot_score = diffuser.calc_rot_score(init.quat, pred.quat, t)
    rot_score = rot_score * node_mask[..., None]

    trans_score = diffuser.calc_trans_score(
        init.trans, pred.trans, t[:, None, None], scale=True
    )
    trans_score = trans_score * node_mask[..., None]

    out["rot_score"] = rot_score
    out["trans_score"] = trans_score
    return out
