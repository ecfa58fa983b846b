"""Full OmegaFold orchestration in JAX (port step 8 of docs/OMEGAFOLD_PORT.md).

Equivalent of OmegaFold / OmegaFoldCycle
(/root/reference/src/toolbox/OmegaFold/omegafold/model.py:50-277): per
recycling cycle — OmegaPLM over the pseudo-MSA, PLM-repr projections + edge
embedder, recycle embedder (previous node/edge/coords), GeoFormer trunk,
structure module + atom14 expansion, confidence head — keeping the cycle
whose overall lDDT confidence is highest. The extractor's outputs are that
cycle's (edge_repr [L, L, 128], node_repr [L, 256]), the npz contract
consumed by the DFOLD data pipeline.

One cycle is a single jitted function; the python loop over cycles reuses the
compiled program (all cycles share shapes). Weights come either from the
reference torch module (params_from_torch, tests) or from a released
checkpoint state_dict (params_from_state_dict — no torch module
instantiation needed, just the tensor dict).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dynamicpdb_tpu.models.omegafold import atoms
from dynamicpdb_tpu.parallel import sp
from dynamicpdb_tpu.models.omegafold.embedders import (
    EdgeEmbedderParams,
    RecycleEmbedderParams,
    edge_embedder,
    edge_embedder_from_torch,
    recycle_embedder,
    recycle_embedder_from_torch,
)
from dynamicpdb_tpu.models.omegafold.geoformer import (
    GeoFormerParams,
    geoformer,
    geoformer_params_from_torch,
)
from dynamicpdb_tpu.models.omegafold.plm import (
    PLMConfig,
    PLMParams,
    omega_plm,
)
from dynamicpdb_tpu.models.omegafold.plm import (
    params_from_torch as plm_params_from_torch,
)
from dynamicpdb_tpu.models.omegafold.structure import (
    ConfidenceParams,
    LinearParams,
    StructureParams,
    confidence_head,
    confidence_params_from_torch,
    linear_from_torch,
    structure_module,
    structure_params_from_torch,
)


class OmegaFoldConfig(NamedTuple):
    plm: PLMConfig = PLMConfig()
    node_dim: int = 256
    edge_dim: int = 128
    attn_c: int = 32
    geom_c: int = 32
    geom_head: int = 4
    struct_num_head: int = 12
    struct_num_scalar_qk: int = 16
    struct_num_point_qk: int = 4

    @property
    def struct_ipa_dims(self) -> dict:
        return dict(
            num_head=self.struct_num_head,
            num_scalar_qk=self.struct_num_scalar_qk,
            num_point_qk=self.struct_num_point_qk,
        )


class OmegaFoldParams(NamedTuple):
    plm: PLMParams
    plm_node_embedder: LinearParams
    plm_edge_embedder: LinearParams
    input_embedder: EdgeEmbedderParams
    recycle: RecycleEmbedderParams
    geoformer: GeoFormerParams
    structure: StructureParams
    confidence: ConfidenceParams


def _normalize_unbiased(x, eps=1e-5):
    """utils.normalize(in_place=True) uses torch.var's UNBIASED estimator
    (torch_utils.py:74-80) — mirrored exactly via the shared f32-stats
    layer norm."""
    from dynamicpdb_tpu.models.omegafold.core import layer_norm_f32

    return layer_norm_f32(x, eps=eps, unbiased=True)


def get_all_confidence(plddt, ca_pos, mask, cutoff: float = 15.0):
    """Overall lDDT confidence (confidence.py:39-90)."""
    d = jnp.sqrt(
        jnp.sum((ca_pos[:, None] - ca_pos[None, :]) ** 2, -1) + 1e-10
    )
    scored = (
        (d < cutoff)
        * mask[:, None]
        * mask[None, :]
        * (1.0 - jnp.eye(d.shape[0]))
    )
    return jnp.sum(plddt * (jnp.sum(scored, -1) + 1e-10)) / (
        1e-10 + jnp.sum(scored)
    )


def deep_sequence_embed(params: OmegaFoldParams, cfg: OmegaFoldConfig,
                        p_msa, p_msa_mask):
    """PLM forward + projections + input edge embedder (model.py:212-246)."""
    node, edges = omega_plm(params.plm, cfg.plm, p_msa, p_msa_mask)
    node = params.plm_node_embedder(_normalize_unbiased(node))
    edge = jnp.transpose(edges, (1, 2, 0))  # [L, L, num_layers]
    # sequence parallelism: keep the [L, L, 66] stack and its projection
    # sharded over the query axis between the PLM and the GeoFormer
    # (identity when no 'seq' mesh is active; parallel/sp.py)
    edge = sp.shard(edge, "seq")
    edge = params.plm_edge_embedder(_normalize_unbiased(edge))
    edge = edge_embedder(params.input_embedder, p_msa[..., 0, :], out=edge)
    return node, edge


def omegafold_cycle(params: OmegaFoldParams, cfg: OmegaFoldConfig,
                    p_msa, p_msa_mask, prev_node, prev_edge, prev_x,
                    flash: bool = False, pad_safe: bool = False):
    """One recycling iteration (OmegaFoldCycle.forward + the wrapping loop
    body, model.py:59-110, 166-196). Returns
    (node_out [L, node_dim], edge_out [L, L, edge_dim], confidence_overall,
     new (prev_node, prev_edge, prev_x))."""
    fasta = p_msa[..., 0, :]
    mask = p_msa_mask[..., 0, :]

    node, edge = deep_sequence_embed(params, cfg, p_msa, p_msa_mask)
    node, edge = recycle_embedder(
        params.recycle, fasta, prev_node, prev_edge, prev_x, node, edge
    )
    prev_node_full, edge, final_node = geoformer(
        params.geoformer, node, edge, p_msa_mask,
        attn_c=cfg.attn_c, geom_c=cfg.geom_c, geom_head=cfg.geom_head,
        flash=flash, pad_safe=pad_safe,
    )
    node_struct, (rots, trans), torsions = structure_module(
        params.structure, final_node[..., 0, :, :], edge, mask,
        ipa_dims=cfg.struct_ipa_dims,
    )
    pos14, _ = atoms.frames_and_torsions_to_atom14(
        rots, trans, mask.astype(bool), torsions, fasta
    )
    plddt = confidence_head(params.confidence, node_struct)
    conf = get_all_confidence(plddt, pos14[..., 1, :], mask)

    node_out = prev_node_full[..., 0, :, :]
    return node_out, edge, conf, plddt, (node_out, edge, pos14)


def _cast_float_leaves(tree, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
        tree,
    )


def omegafold_embed(params: OmegaFoldParams, cfg: OmegaFoldConfig,
                    cycle_inputs, *, predict_with_confidence: bool = True,
                    jit: bool = True, dtype=None, flash: bool = False,
                    pad_safe: bool = False, return_structure: bool = False):
    """Run all recycling cycles; return (edge_repr, node_repr) of the most
    confident cycle (model.py:146-210: `if confidence_overall >
    max_confidence` — strictly greater, first cycle wins ties).

    return_structure=True appends a 4th element: {"pos14": [L, 14, 3],
    "plddt": [L]} of the selected cycle — the fold output the vendored
    reference computes but DROPS (its forward returns only the reprs,
    model.py:150-206; upstream OmegaFold returns this for PDB writing).
    Consumed by fold_cli.

    dtype: None (default) runs the reference-parity f32 path. jnp.bfloat16
    casts params and activations for TPU inference; this halves on-device
    param bytes (3.2 GB -> 1.6 GB at release dims) but measured throughput
    at N=256/10 cycles is within noise of f32 (6.21 vs 6.15 seq/min on
    v5e — the hot path is not MXU-f32-bound; see tools/bench_omegafold.py).
    Norm statistics stay f32; returned reprs are cast back to f32.

    flash: fused Pallas attention for the GeoFormer's GeometricAttention
    (ops/pallas/geom_attention.py) — the measured hot spot of a cycle.
    TPU-only, forward-only.

    pad_safe: use with inputs padded by pipeline pad_to/pad_multiple —
    masks the reference's two unmasked leaks in GeometricAttention so
    padding cannot perturb real positions (bitwise identical to False for
    unpadded inputs). Outputs then carry the padded length; callers slice
    to the true num_res (see preprocess/extract_embeddings.py).
    """
    num_res = cycle_inputs[0]["p_msa"].shape[-1]
    act = dtype or jnp.float32
    if dtype is not None:
        params = _cast_float_leaves(params, dtype)
    prev_node = jnp.zeros((num_res, cfg.node_dim), act)
    prev_edge = jnp.zeros((num_res, num_res, cfg.edge_dim), act)
    prev_x = jnp.zeros((num_res, 14, 3), act)

    if jit:
        fn = _jitted_cycle(cfg, flash, pad_safe)
    else:
        fn = lambda p, a, b, pn, pe, px: omegafold_cycle(
            p, cfg, a, b, pn, pe, px, flash=flash, pad_safe=pad_safe
        )

    max_conf = 0.0
    final = None
    final_struct = None
    for cyc in cycle_inputs:
        p_msa_mask = jnp.asarray(cyc["p_msa_mask"]).astype(act)
        node_out, edge_out, conf, plddt, (prev_node, prev_edge, prev_x) = fn(
            params, jnp.asarray(cyc["p_msa"]), p_msa_mask,
            prev_node, prev_edge, prev_x,
        )
        conf = float(conf)
        if not predict_with_confidence or conf > max_conf or final is None:
            max_conf = max(max_conf, conf)
            final = (edge_out, node_out)
            final_struct = (prev_x, plddt)  # prev_x IS this cycle's pos14
    out = (
        final[0].astype(jnp.float32),
        final[1].astype(jnp.float32),
        max_conf,
    )
    if return_structure:
        out = out + ({
            "pos14": final_struct[0].astype(jnp.float32),
            "plddt": final_struct[1].astype(jnp.float32),
        },)
    return out


@functools.lru_cache(maxsize=8)
def _jitted_cycle(cfg: OmegaFoldConfig, flash: bool = False,
                  pad_safe: bool = False):
    return jax.jit(
        lambda params, p_msa, p_msa_mask, pn, pe, px: omegafold_cycle(
            params, cfg, p_msa, p_msa_mask, pn, pe, px, flash=flash,
            pad_safe=pad_safe,
        )
    )


def omegafold_embed_scan(params: OmegaFoldParams, cfg: OmegaFoldConfig,
                         cycle_inputs, *,
                         predict_with_confidence: bool = True,
                         dtype=None, flash: bool = False,
                         pad_safe: bool = False,
                         return_structure: bool = False):
    """omegafold_embed with the recycling loop as ONE device computation.

    The python-loop variant fetches each cycle's confidence scalar to host
    (`conf > max_conf`), serializing 10 dispatch+fetch round-trips per
    sequence — ~80 ms each through a tunneled TPU. Here cycles run under
    ``lax.scan`` and the best-confidence cycle is selected ON DEVICE
    (strictly-greater comparison: first cycle wins ties, matching the
    reference model.py:146-210), so a sequence costs one dispatch. Outputs
    are identical to omegafold_embed (tests/test_omegafold_model.py::
    test_scan_embed_matches_loop).
    """
    act = dtype or jnp.float32
    if dtype is not None:
        params = _cast_float_leaves(params, dtype)
    p_msa = jnp.stack([jnp.asarray(c["p_msa"]) for c in cycle_inputs])
    p_mask = jnp.stack(
        [jnp.asarray(c["p_msa_mask"]) for c in cycle_inputs]
    ).astype(act)
    fn = _jitted_scan_embed(cfg, flash, pad_safe, predict_with_confidence,
                            act if dtype is not None else None,
                            return_structure)
    best_edge, best_node, best_conf, *extra = fn(params, p_msa, p_mask)
    out = (
        best_edge.astype(jnp.float32),
        best_node.astype(jnp.float32),
        float(best_conf),
    )
    if return_structure:
        out = out + ({
            "pos14": extra[0].astype(jnp.float32),
            "plddt": extra[1].astype(jnp.float32),
        },)
    return out


@functools.lru_cache(maxsize=8)
def _jitted_scan_embed(cfg: OmegaFoldConfig, flash: bool, pad_safe: bool,
                       predict_with_confidence: bool, act_dtype,
                       return_structure: bool = False):
    def run(params, p_msa, p_mask):
        act = act_dtype or jnp.float32
        num_res = p_msa.shape[-1]
        prev_node = jnp.zeros((num_res, cfg.node_dim), act)
        prev_edge = jnp.zeros((num_res, num_res, cfg.edge_dim), act)
        prev_x = jnp.zeros((num_res, 14, 3), act)
        best_node = jnp.zeros((num_res, cfg.node_dim), act)
        best_edge = prev_edge
        best_x = prev_x
        best_plddt = jnp.zeros((num_res,), act)

        def body(carry, xs):
            (prev_node, prev_edge, prev_x, best_conf, best_node, best_edge,
             best_x, best_plddt) = carry
            i, pm, pk = xs
            node_out, edge, conf, plddt, (pn, pe, px) = omegafold_cycle(
                params, cfg, pm, pk, prev_node, prev_edge, prev_x,
                flash=flash, pad_safe=pad_safe,
            )
            # the cycle promotes activations to f32 (norm stats and
            # _finetuning_scale are f32 even under bf16 params); cast back
            # so the scan carry keeps its declared dtype — without this the
            # dtype=bfloat16 path is a lax.scan carry-type error at trace
            # time (bf16 init vs f32 output)
            node_out, edge = node_out.astype(act), edge.astype(act)
            pn, pe, px = pn.astype(act), pe.astype(act), px.astype(act)
            plddt = plddt.astype(act)
            if predict_with_confidence:
                # loop semantics exactly (`conf > max_conf or final is
                # None`): strictly greater, first cycle always populates —
                # via the explicit i == 0 term so a NaN conf (which fails
                # every comparison) still leaves the FIRST cycle's outputs
                # in place rather than zeros, and best_conf mirrors
                # python's max() (NaN never replaces)
                better = (conf > best_conf) | (i == 0)
                best_conf = jnp.where(conf > best_conf, conf, best_conf)
            else:
                # loop semantics: outputs follow the LAST cycle, while the
                # returned confidence is still the running max
                better = jnp.bool_(True)
                best_conf = jnp.where(conf > best_conf, conf, best_conf)
            best_node = jnp.where(better, node_out, best_node)
            best_edge = jnp.where(better, edge, best_edge)
            best_x = jnp.where(better, px, best_x)
            best_plddt = jnp.where(better, plddt, best_plddt)
            return (pn, pe, px, best_conf, best_node, best_edge,
                    best_x, best_plddt), None

        init = (prev_node, prev_edge, prev_x,
                jnp.float32(0.0), best_node, best_edge, best_x, best_plddt)
        n_cyc = p_msa.shape[0]
        (_, _, _, best_conf, best_node, best_edge, best_x, best_plddt), _ = (
            jax.lax.scan(body, init, (jnp.arange(n_cyc), p_msa, p_mask))
        )
        if return_structure:
            return best_edge, best_node, best_conf, best_x, best_plddt
        return best_edge, best_node, best_conf

    return jax.jit(run)


# ---------------------------------------------------------------------------
# weight import
# ---------------------------------------------------------------------------
def params_from_torch(model) -> tuple[OmegaFoldParams, OmegaFoldConfig]:
    """Convert a reference torch OmegaFold module (model.py:122-137)."""
    plm_params, plm_cfg = plm_params_from_torch(model.omega_plm)
    params = OmegaFoldParams(
        plm=plm_params,
        plm_node_embedder=linear_from_torch(model.plm_node_embedder),
        plm_edge_embedder=linear_from_torch(model.plm_edge_embedder),
        input_embedder=edge_embedder_from_torch(model.input_embedder),
        recycle=recycle_embedder_from_torch(model.recycle_embedder),
        geoformer=geoformer_params_from_torch(
            model.omega_fold_cycle.geoformer
        ),
        structure=structure_params_from_torch(
            model.omega_fold_cycle.structure_module
        ),
        confidence=confidence_params_from_torch(
            model.omega_fold_cycle.confidence_head
        ),
    )
    c = model.cfg
    cfg = OmegaFoldConfig(
        plm=plm_cfg,
        node_dim=c.node_dim, edge_dim=c.edge_dim,
        attn_c=c.attn_c, geom_c=c.geom_c, geom_head=c.geom_head,
        struct_num_head=c.struct.num_head,
        struct_num_scalar_qk=c.struct.num_scalar_qk,
        struct_num_point_qk=c.struct.num_point_qk,
    )
    return params, cfg


class _SDNode:
    """Attribute/index view over a flat torch state_dict, so the existing
    *_from_torch converters can walk a released checkpoint WITHOUT
    instantiating the reference torch model. Leaves are the checkpoint's
    tensors (torch tensors or numpy arrays wrapped to quack like them)."""

    def __init__(self, sd: dict, prefix: str = "", extra: dict | None = None):
        object.__setattr__(self, "_sd", sd)
        object.__setattr__(self, "_prefix", prefix)
        object.__setattr__(self, "_extra", extra or {})

    def __getattr__(self, name):
        if name in self._extra:
            return self._extra[name]
        key = self._prefix + name
        if key in self._sd:
            return _leaf(self._sd[key])
        return _SDNode(self._sd, key + ".")

    def __getitem__(self, idx):
        return getattr(self, str(idx))

    def __len__(self):
        n = -1
        plen = len(self._prefix)
        for k in self._sd:
            if k.startswith(self._prefix):
                head = k[plen:].split(".", 1)[0]
                if head.isdigit():
                    n = max(n, int(head))
        return n + 1

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]


class _Leaf:
    """numpy array quacking like a torch tensor (.detach().numpy())."""

    def __init__(self, arr):
        self._arr = arr

    def detach(self):
        return self

    def numpy(self):
        import numpy as np

        return np.asarray(self._arr)


def _leaf(x):
    return x if hasattr(x, "detach") else _Leaf(x)


def infer_config_from_state_dict(sd: dict) -> OmegaFoldConfig:
    """Derive every architectural dimension from checkpoint tensor SHAPES,
    so the importer works for any OmegaFold variant, not just the release
    dims (masked_ratio / padding_idx / distogram breaks are reference
    constants, not inferable — kept at defaults)."""
    shp = lambda k: tuple(sd[k].shape)
    alphabet, plm_node = shp("omega_plm.input_embedding.weight")
    edge_dim, num_layers = shp("plm_edge_embedder.weight")
    node_dim = shp("plm_node_embedder.weight")[0]
    attn_dim = shp("omega_plm.layers.0.gau.multi_headed_scaling.weight")[1]
    gva_out = shp("omega_plm.layers.0.gau.gva_proj.0.weight")[0]
    proj_dim = (gva_out - attn_dim) // 2
    num_relpos = shp("omega_plm.layers.0.gau.relpos.weight")[0]
    geo = "omega_fold_cycle.geoformer.blocks.0."
    attn_c = shp(geo + "attention_w_edge_bias.attention.qg_weights")[-1] // 2
    _, _, geom_head, g2c = shp(
        geo + "geometric_attention.0.attention.qg_weights"
    )
    ipa = "omega_fold_cycle.structure_module.cycles.0.ipa."
    num_head = shp(ipa + "trainable_point_weights")[0]
    return OmegaFoldConfig(
        plm=PLMConfig(
            alphabet_size=alphabet, node=plm_node, num_layers=num_layers,
            proj_dim=proj_dim, attn_dim=attn_dim, num_relpos=num_relpos,
        ),
        node_dim=node_dim,
        edge_dim=edge_dim,
        attn_c=attn_c,
        geom_c=g2c // 2,
        geom_head=geom_head,
        struct_num_head=num_head,
        struct_num_scalar_qk=shp(ipa + "q_scalar.weight")[0] // num_head,
        struct_num_point_qk=shp(ipa + "q_point.weight")[0] // (num_head * 3),
    )


def params_from_state_dict(
    sd: dict, cfg: OmegaFoldConfig | None = None
) -> tuple[OmegaFoldParams, OmegaFoldConfig]:
    """Build params from a released-checkpoint state_dict (the file loaded
    by the reference's torch.load, __main__.py:48-56). Keys follow the
    reference module tree; 'module.' prefixes are stripped. With cfg=None
    every dimension is inferred from tensor shapes
    (infer_config_from_state_dict), so non-release checkpoints import too."""
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    cfg = cfg or infer_config_from_state_dict(sd)
    root = _SDNode(sd)
    plm_node = _SDNode(
        sd, "omega_plm.",
        extra={
            "cfg": type(
                "C", (), dict(
                    alphabet_size=cfg.plm.alphabet_size, node=cfg.plm.node,
                    padding_idx=cfg.plm.padding_idx, edge=cfg.plm.num_layers,
                    proj_dim=cfg.plm.proj_dim, attn_dim=cfg.plm.attn_dim,
                    num_relpos=cfg.plm.num_relpos,
                    masked_ratio=cfg.plm.masked_ratio,
                )
            )(),
            "layers": _SDNode(sd, "omega_plm.layers."),
            "input_embedding": _SDNode(sd, "omega_plm.input_embedding."),
            "output_norm": _SDNode(sd, "omega_plm.output_norm."),
        },
    )
    plm_params, _ = plm_params_from_torch(plm_node)

    # RecycleEmbedder's distogram breaks are config, not weights
    rec = _SDNode(
        sd, "recycle_embedder.",
        extra={
            "dgram": type(
                "D", (), {
                    "cfg": type(
                        "B", (), dict(
                            first_break=3.25, last_break=20.75, num_bins=16
                        )
                    )()
                }
            )(),
            "layernorm_node": _SDNode(sd, "recycle_embedder.layernorm_node."),
            "layernorm_edge": _SDNode(sd, "recycle_embedder.layernorm_edge."),
            "prev_pos_embed": _SDNode(sd, "recycle_embedder.prev_pos_embed."),
        },
    )

    params = OmegaFoldParams(
        plm=plm_params,
        plm_node_embedder=linear_from_torch(root.plm_node_embedder),
        plm_edge_embedder=linear_from_torch(root.plm_edge_embedder),
        input_embedder=edge_embedder_from_torch(root.input_embedder),
        recycle=recycle_embedder_from_torch(rec),
        geoformer=geoformer_params_from_torch(root.omega_fold_cycle.geoformer),
        structure=structure_params_from_torch(
            root.omega_fold_cycle.structure_module
        ),
        confidence=confidence_params_from_torch(
            root.omega_fold_cycle.confidence_head
        ),
    )
    return params, cfg
