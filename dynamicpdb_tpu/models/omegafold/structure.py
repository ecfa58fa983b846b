"""OmegaFold structure module + confidence head in jnp (port step 4).

Functional equivalents of the reference decoder
(/root/reference/src/toolbox/OmegaFold/omegafold/decode.py:44-404,
confidence.py:96-146, utils/protein_utils/aaframe.py): the AF2-style IPA over
black-hole-initialized frames, per-cycle 6-vector frame updates (3-component
quaternion + nano translation), a torsion-angle head, and the pLDDT
confidence head. Frames are explicit (rotmat, trans) arrays; units follow
the reference (cycles run in nanometers, outputs in Angstroms).

For the embedding extractor these outputs drive only (a) recycling
(final atom positions -> pseudo-beta distogram) and (b) best-cycle selection
by overall confidence (model.py:155-207).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dynamicpdb_tpu.models.omegafold.core import layer_norm_f32 as _normalize


def quaternion_to_matrix(q):
    """pytorch3d convention; accepts (..., 4) or (..., 3) (real part = 1)."""
    if q.shape[-1] == 3:
        q = jnp.concatenate([jnp.ones_like(q[..., :1]), q], axis=-1)
    r, i, j, k = jnp.moveaxis(q, -1, 0)
    two_s = 2.0 / jnp.sum(q * q, axis=-1)
    o = jnp.stack(
        [
            1 - two_s * (j * j + k * k), two_s * (i * j - k * r), two_s * (i * k + j * r),
            two_s * (i * j + k * r), 1 - two_s * (i * i + k * k), two_s * (j * k - i * r),
            two_s * (i * k - j * r), two_s * (j * k + i * r), 1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return o.reshape(q.shape[:-1] + (3, 3))


def _ln(x, w, b, eps=1e-5):
    return _normalize(x, eps=eps) * w + b


class LinearParams(NamedTuple):
    w: jnp.ndarray
    b: jnp.ndarray

    def __call__(self, x):
        return jnp.einsum("...d,de->...e", x, self.w) + self.b


def linear_from_torch(mod) -> LinearParams:
    return LinearParams(
        jnp.asarray(mod.weight.detach().numpy()).T,
        jnp.asarray(mod.bias.detach().numpy()),
    )


# ---------------------------------------------------------------------------
# decoder IPA (decode.py:44-200)
# ---------------------------------------------------------------------------
class DecodeIPAParams(NamedTuple):
    q_scalar: LinearParams
    k_scalar: LinearParams
    v_scalar: LinearParams
    q_point: LinearParams
    k_point: LinearParams
    v_point: LinearParams
    point_weights: jnp.ndarray  # [H]
    bias_2d: LinearParams
    out: LinearParams


def decode_ipa(p: DecodeIPAParams, node, edge, rots, trans, mask, *,
               num_head: int, num_scalar_qk: int, num_point_qk: int):
    """node [L, d]; edge [L, L, de]; frames (rots [L,3,3], trans [L,3]);
    mask [L]. Returns the node update."""
    import math

    L = node.shape[0]
    scalar_w = math.sqrt(1 / (3 * max(num_scalar_qk, 1)))
    point_w = math.sqrt(1 / (3 * max(num_point_qk, 1) * 9.0 / 2))
    edge_w = math.sqrt(1 / 3)

    def heads(lin, x):
        y = lin(x)
        return y.reshape(L, num_head, -1)

    def points(lin, x):
        y = lin(x).reshape(L, num_head, -1, 3)
        return jnp.einsum("lij,lhpj->lhpi", rots, y) + trans[:, None, None]

    q_s, k_s, v_s = heads(p.q_scalar, node), heads(p.k_scalar, node), heads(p.v_scalar, node)
    logits = jnp.einsum("qhc,khc->qkh", q_s, k_s) * scalar_w
    logits += p.bias_2d(edge) * edge_w

    q_p, k_p, v_p = points(p.q_point, node), points(p.k_point, node), points(p.v_point, node)
    dist = jnp.sum((q_p[:, None] - k_p[None]) ** 2, axis=(-1, -2))  # [q,k,h]
    logits -= dist * point_w * jax.nn.softplus(p.point_weights) / 2
    logits += (mask.astype(jnp.float32)[None, :, None] - 1.0) * 1e9
    attn = jax.nn.softmax(logits, axis=-2)  # over k (dim -2, ref convention)

    ret_edge = jnp.einsum("qkh,qkc->qhc", attn, edge)
    ret_scalar = jnp.einsum("qkh,khc->qhc", attn, v_s)
    ret_point = jnp.einsum("qkh,khpc->qhpc", attn, v_p)
    # back into the local frames
    ret_point = jnp.einsum(
        "lji,lhpj->lhpi", rots, ret_point - trans[:, None, None]
    )
    feat = jnp.concatenate(
        [
            ret_scalar.reshape(L, -1),
            ret_point.reshape(L, -1),
            jnp.linalg.norm(ret_point, axis=-1).reshape(L, -1),
            ret_edge.reshape(L, -1),
        ],
        axis=-1,
    )
    return p.out(feat)


def decode_ipa_from_torch(mod) -> DecodeIPAParams:
    return DecodeIPAParams(
        q_scalar=linear_from_torch(mod.q_scalar),
        k_scalar=linear_from_torch(mod.k_scalar),
        v_scalar=linear_from_torch(mod.v_scalar),
        q_point=linear_from_torch(mod.q_point),
        k_point=linear_from_torch(mod.k_point),
        v_point=linear_from_torch(mod.v_point),
        point_weights=jnp.asarray(mod.trainable_point_weights.detach().numpy()),
        bias_2d=linear_from_torch(mod.bias_2d),
        out=linear_from_torch(mod.output_projection),
    )


# ---------------------------------------------------------------------------
# structure cycle + module (decode.py:260-404)
# ---------------------------------------------------------------------------
class CycleParams(NamedTuple):
    ipa: DecodeIPAParams
    input_norm: tuple  # (w, b)
    transition: tuple  # tuple of LinearParams
    update_norm: tuple
    affine_update: LinearParams


class TorsionHeadParams(NamedTuple):
    input_projection: tuple  # 2 x LinearParams
    resblock1: tuple
    resblock2: tuple
    unnormalized: LinearParams


class StructureParams(NamedTuple):
    node_norm: tuple
    edge_norm: tuple
    init_proj: LinearParams
    cycles: tuple  # tuple of CycleParams
    torsion: TorsionHeadParams


def torsion_head(p: TorsionHeadParams, reprs):
    act = 0.0
    for x, lin in zip(reprs, p.input_projection):
        act = lin(jax.nn.relu(x)) + act
    for l1, l2 in zip(p.resblock1, p.resblock2):
        act = act + l2(jax.nn.relu(l1(jax.nn.relu(act))))
    raw = p.unnormalized(jax.nn.relu(act))
    raw = raw.reshape(raw.shape[:-1] + (7, 2))
    return raw / jnp.clip(
        jnp.linalg.norm(raw, axis=-1, keepdims=True), 4e-5
    )


def structure_cycle(p: CycleParams, node, edge, rots, trans, mask, *,
                    ipa_dims):
    node = node + decode_ipa(p.ipa, node, edge, rots, trans, mask, **ipa_dims)
    node = _ln(node, *p.input_norm)
    inp = node
    for i, lin in enumerate(p.transition):
        node = lin(node)
        if i != len(p.transition) - 1:
            node = jax.nn.relu(node)
    node = _ln(node + inp, *p.update_norm)
    upd = p.affine_update(node)  # [L, 6]: quat3 + translation (nano)
    rot_u = quaternion_to_matrix(upd[..., :3])
    # compose: frame <- frame ∘ update
    new_rots = jnp.einsum("lij,ljk->lik", rots, rot_u)
    new_trans = jnp.einsum("lij,lj->li", rots, upd[..., 3:]) + trans
    return node, new_rots, new_trans


def structure_module(p: StructureParams, node, edge, mask, *, ipa_dims):
    """node [L, d], edge [L, L, de], mask [L].

    Returns (node_repr_struct, frames (rots, trans in Angstrom), torsions).
    """
    node = _ln(node, *p.node_norm)
    edge = _ln(edge, *p.edge_norm)
    init_node = node
    node = p.init_proj(node)

    L = node.shape[0]
    rots = jnp.broadcast_to(jnp.eye(3), (L, 3, 3))
    trans = jnp.zeros((L, 3))
    for cp in p.cycles:
        node, rots, trans = structure_cycle(
            cp, node, edge, rots, trans, mask, ipa_dims=ipa_dims
        )
    torsions = torsion_head(p.torsion, [node, init_node])
    return node, (rots, trans * 10.0), torsions  # nano -> Angstrom


def structure_params_from_torch(mod) -> StructureParams:
    t = lambda x: jnp.asarray(x.detach().numpy())

    def ln(m):
        return (t(m.weight), t(m.bias))

    cycles = tuple(
        CycleParams(
            ipa=decode_ipa_from_torch(c.ipa),
            input_norm=ln(c.input_norm),
            transition=tuple(linear_from_torch(l) for l in c.transition),
            update_norm=ln(c.update_norm),
            affine_update=linear_from_torch(c.affine_update),
        )
        for c in mod.cycles
    )
    th = mod.torsion_angle_pred
    torsion = TorsionHeadParams(
        input_projection=tuple(linear_from_torch(l) for l in th.input_projection),
        resblock1=tuple(linear_from_torch(l) for l in th.resblock1),
        resblock2=tuple(linear_from_torch(l) for l in th.resblock2),
        unnormalized=linear_from_torch(th.unnormalized_angles),
    )
    return StructureParams(
        node_norm=ln(mod.node_norm),
        edge_norm=ln(mod.edge_norm),
        init_proj=linear_from_torch(mod.init_proj),
        cycles=cycles,
        torsion=torsion,
    )


# ---------------------------------------------------------------------------
# confidence head (confidence.py:96-146)
# ---------------------------------------------------------------------------
class ConfidenceParams(NamedTuple):
    layers: tuple  # 3 x LinearParams


def confidence_head(p: ConfidenceParams, node):
    x = _normalize(node)
    x = jax.nn.relu(p.layers[0](x))
    x = jax.nn.relu(p.layers[1](x))
    logits = p.layers[2](x)
    num_bins = logits.shape[-1]
    centers = (jnp.arange(num_bins) + 0.5) / num_bins
    return jax.nn.softmax(logits, axis=-1) @ centers


def confidence_params_from_torch(mod) -> ConfidenceParams:
    return ConfidenceParams(
        layers=tuple(
            linear_from_torch(mod.network[i]) for i in (0, 2, 4)
        )
    )
