"""Export OUR flax params as a REFERENCE-format torch checkpoint.

The inverse of train/import_torch.py: a model trained in this framework is
written as the torch pickle the reference's evaluator consumes —
``{'model': state_dict, 'conf', 'optimizer', 'epoch', 'step'}``
(/root/reference/src/data/utils.py:324-362), loadable by its strict
``load_state_dict`` after the 'module.' strip
(/root/reference/eval_DFOLD_dynamics.py:113-140). Together with the
importer this closes the round trip: reference users can move checkpoints
in BOTH directions while migrating.

Strictness means the export must cover every key the reference
FullScoreNetwork registers, including its dead parameters (modules whose
outputs are computed then overwritten on the active path):

- ``embedding_layer.node_ln`` / ``edge_ln`` and the two ``*_timestep_proj``
  MLPs: DFOLDv2_Embeder's outputs are discarded — DFOLDIpaScore rebuilds
  node/edge embeds from ``expand_node_repr``/``expand_edge_repr`` directly
  (/root/reference/src/model/ipa_pytorch_dynamic.py:833-835). We emit
  torch-default LayerNorm values (weight=1, bias=0) and zero MLPs, so the
  exported file is deterministic and the dead weights are inert.

Every live parameter mapping mirrors tools/parity_model.py, whose
flax->torch transfer is forward-parity-proven (<=3e-5) against the live
reference model (tests/test_model_parity.py); the roundtrip identity with
import_torch.flax_from_reference_state_dict is pinned by
tests/test_export_torch.py.
"""
from __future__ import annotations

import logging
import types

import numpy as np

from dynamicpdb_tpu.config import ModelConfig

log = logging.getLogger(__name__)


def _point_perm(n_heads: int, n_pts: int) -> np.ndarray:
    """Our point-projection column o=(hp*3+xyz) -> reference row
    o'=xyz*(H*P)+hp (the exact permutation of tools/parity_model.py)."""
    hp = np.arange(n_heads * n_pts)
    perm = np.empty(3 * n_heads * n_pts, dtype=int)
    for xyz in range(3):
        perm[xyz * n_heads * n_pts + hp] = hp * 3 + xyz
    return perm


def _dead_embedder_entries(model_cfg: ModelConfig) -> dict[str, np.ndarray]:
    """State-dict entries for DFOLDv2_Embeder's dead parameters.

    Shapes follow the reference constructor
    (/root/reference/src/model/Dfold_network_dynamic.py:19-48):
    time_embed_size = node_embed_size; each *_timestep_proj is
    Linear(time, out//2) -> SiLU -> Linear(out//2, out).
    """
    ns, es = model_cfg.node_embed_size, model_cfg.edge_embed_size
    out: dict[str, np.ndarray] = {}

    def mlp(prefix: str, d_in: int, d_out: int):
        out[f"{prefix}.0.weight"] = np.zeros((d_out // 2, d_in), np.float32)
        out[f"{prefix}.0.bias"] = np.zeros((d_out // 2,), np.float32)
        out[f"{prefix}.2.weight"] = np.zeros((d_out, d_out // 2), np.float32)
        out[f"{prefix}.2.bias"] = np.zeros((d_out,), np.float32)

    mlp("embedding_layer.node_timestep_proj", ns, ns)
    out["embedding_layer.node_ln.weight"] = np.ones((ns,), np.float32)
    out["embedding_layer.node_ln.bias"] = np.zeros((ns,), np.float32)
    mlp("embedding_layer.edge_timestep_proj", ns, es)
    out["embedding_layer.edge_ln.weight"] = np.ones((es,), np.float32)
    out["embedding_layer.edge_ln.bias"] = np.zeros((es,), np.float32)
    return out


def reference_state_dict_from_flax(
    params, model_cfg: ModelConfig, *, strict: bool = True
) -> dict[str, np.ndarray]:
    """Map our flax params tree onto the reference FullScoreNetwork
    state_dict (numpy float32 values; callers wrap in torch tensors).

    ``strict=True`` raises if our tree holds parameters the reference
    architecture cannot represent (e.g. the optional aatype embedding,
    EmbedConfig.use_aatype_embedding) — exporting those silently would
    change the function the checkpoint computes.
    """
    import flax

    tree = params["params"] if "params" in params else params
    flat = {
        "/".join(k): np.asarray(v, np.float32)
        for k, v in flax.traverse_util.flatten_dict(tree).items()
    }
    used: set[str] = set()
    ipa = model_cfg.ipa
    H, PQ, PV = ipa.no_heads, ipa.no_qk_points, ipa.no_v_points
    sd = _dead_embedder_entries(model_cfg)

    def take(key: str) -> np.ndarray:
        used.add(key)
        try:
            return flat[key]
        except KeyError:
            raise KeyError(
                f"param '{key}' not in the checkpoint tree — the model "
                f"config used for export (num_blocks={ipa.num_blocks}, "
                f"c_s={ipa.c_s}, c_z={ipa.c_z}) does not match the "
                f"trained architecture. If the checkpoint lacks a config "
                f"snapshot, pass model.* overrides on the CLI "
                f"(e.g. model.ipa.num_blocks=2)."
            ) from None

    def lin(mine: str, ref: str):
        sd[f"{ref}.weight"] = take(f"{mine}/kernel").T
        if f"{mine}/bias" in flat:
            sd[f"{ref}.bias"] = take(f"{mine}/bias")

    def mlp(mine: str, ref: str):
        lin(f"{mine}/Dense_0", f"{ref}.0")
        lin(f"{mine}/Dense_1", f"{ref}.2")

    def points(mine: str, ref: str, n_pts: int):
        perm = _point_perm(H, n_pts)
        sd[f"{ref}.weight"] = take(f"{mine}/kernel").T[perm]
        sd[f"{ref}.bias"] = take(f"{mine}/bias")[perm]

    lin("expand_node", "expand_node")
    lin("expand_edge", "expand_edge")
    for name in ("force_embeder", "vel_embeder", "index_embeder",
                 "rigid_embeder", "angle_embeder"):
        mlp(name, f"score_model.{name}")
    for b in range(ipa.num_blocks):
        mine, ref = f"ipa_{b}", f"score_model.trunk.ipa_{b}"
        lin(f"{mine}/linear_q", f"{ref}.linear_q")
        lin(f"{mine}/linear_kv", f"{ref}.linear_kv")
        points(f"{mine}/linear_q_points", f"{ref}.linear_q_points", PQ)
        points(f"{mine}/linear_kv_points", f"{ref}.linear_kv_points", PQ + PV)
        lin(f"{mine}/linear_b", f"{ref}.linear_b")
        lin(f"{mine}/down_z", f"{ref}.down_z")
        lin(f"{mine}/linear_out", f"{ref}.linear_out")
        sd[f"{ref}.head_weights"] = take(f"{mine}/head_weights")
        # constructed-but-never-called in the reference IPA
        # (ipa_pytorch_dynamic.py:311) — dead, zero fill for strict load
        sd[f"{ref}.linear_rbf.weight"] = np.zeros((1, 20), np.float32)
        sd[f"{ref}.linear_rbf.bias"] = np.zeros((1,), np.float32)
        lin(f"bb_update_{b}/Dense_0", f"score_model.trunk.bb_update_{b}.linear")
    for i in range(4):
        for j, conv_idx in ((0, 0), (1, 2)):
            k = take(f"conv_0/Conv_{2 * i + j}/kernel")  # [kh, kw, in, out]
            ref = f"score_model.trunk.conv_0.conv{i + 1}.{conv_idx}"
            sd[f"{ref}.weight"] = np.ascontiguousarray(k.transpose(3, 2, 0, 1))
            sd[f"{ref}.bias"] = take(f"conv_0/Conv_{2 * i + j}/bias")
    lin("angle_resnet/Dense_0", "score_model.angle_resnet.linear_initial")
    lin("angle_resnet/Dense_1", "score_model.angle_resnet.linear_in")
    for i in range(2):
        lin(f"angle_resnet/AngleResnetBlock_{i}/Dense_0",
            f"score_model.angle_resnet.layers.{i}.linear_1")
        lin(f"angle_resnet/AngleResnetBlock_{i}/Dense_1",
            f"score_model.angle_resnet.layers.{i}.linear_2")
    lin("angle_resnet/Dense_2", "score_model.angle_resnet.linear_out")

    unmapped = sorted(set(flat) - used)
    if unmapped:
        msg = (
            "flax params not representable in the reference architecture: "
            + ", ".join(unmapped)
        )
        if strict:
            raise ValueError(msg)
        log.warning("%s (dropped, strict=False)", msg)
    return sd


def reference_model_conf(model_cfg: ModelConfig):
    """A pickleable ``conf`` whose ``.model`` matches the reference's Hydra
    model tree (key names from /root/reference/config/train_DFOLDv2.yaml),
    so the evaluator's ``OmegaConf.merge(conf.model, ckpt.conf.model)``
    (eval_DFOLD_dynamics.py:121) reconstructs the exported architecture."""
    e, i = model_cfg.embed, model_cfg.ipa
    model = {
        "node_embed_size": model_cfg.node_embed_size,
        "edge_embed_size": model_cfg.edge_embed_size,
        "dropout": model_cfg.dropout,
        "cfg_drop_rate": model_cfg.cfg_drop_rate,
        "cfg_gamma": model_cfg.cfg_gamma,
        "embed": {
            "index_embed_size": e.index_embed_size,
            "aatype_embed_size": e.aatype_embed_size,
            "embed_self_conditioning": e.embed_self_conditioning,
            "num_bins": e.num_bins,
            "min_bin": e.min_bin,
            "max_bin": e.max_bin,
            "DFOLDv2_embedder": True,
        },
        "ipa": {
            "c_s": i.c_s,
            "c_z": i.c_z,
            "c_hidden": i.c_hidden,
            "no_heads": i.no_heads,
            "no_qk_points": i.no_qk_points,
            "no_v_points": i.no_v_points,
            "num_blocks": i.num_blocks,
            "coordinate_scaling": i.coordinate_scaling,
            "temporal": i.temporal,
        },
    }
    return types.SimpleNamespace(model=model)


def export_reference_checkpoint(
    path: str,
    params,
    model_cfg: ModelConfig,
    *,
    epoch: int = 0,
    step: int = 0,
    strict: bool = True,
) -> None:
    """Write a reference-format torch checkpoint file.

    Payload layout matches the reference's write_checkpoint
    (/root/reference/src/data/utils.py:324-362); 'optimizer' is None (the
    reference's own warm start ignores it, train_DFOLD_dynamics.py:468-499;
    our Adam state is not representable in torch.optim format)."""
    import torch

    sd = reference_state_dict_from_flax(params, model_cfg, strict=strict)
    payload = {
        "model": {k: torch.tensor(v) for k, v in sd.items()},
        "conf": reference_model_conf(model_cfg),
        "optimizer": None,
        "epoch": epoch,
        "step": step,
    }
    torch.save(payload, path)
    n = sum(v.size for v in sd.values())
    log.info("exported reference checkpoint %s: %.1fM params (step %d)",
             path, n / 1e6, step)
    # the reference evaluator merges ONLY conf.model from the checkpoint
    # (eval_DFOLD_dynamics.py:121); its diffuser.r3.coordinate_scaling stays
    # at the EVAL config's value (yaml default 0.1), so a mismatch silently
    # desynchronizes the score model from the diffuser on the reference side
    log.warning(
        "reference eval config must set diffuser.r3.coordinate_scaling=%s "
        "to match the exported model.ipa.coordinate_scaling — the "
        "evaluator merges only conf.model from the checkpoint "
        "(see docs/MIGRATION.md)", model_cfg.ipa.coordinate_scaling,
    )


def main(argv=None):
    """CLI: our msgpack checkpoint -> reference torch checkpoint.

        python -m dynamicpdb_tpu.train.export_torch \\
            --ckpt runs/x/step_1000.ckpt --out dfold_ref.pth

    The model config is taken from the checkpoint's saved config snapshot
    (train/checkpoint.py stores it); ``model.*`` overrides win."""
    import argparse
    import json

    from flax import serialization

    from dynamicpdb_tpu import config as config_lib

    parser = argparse.ArgumentParser(description=main.__doc__)
    parser.add_argument("--ckpt", required=True, help="our msgpack checkpoint")
    parser.add_argument("--out", required=True, help="torch .pth/.pkl path")
    parser.add_argument("--no-strict", action="store_true",
                        help="drop (with a warning) params the reference "
                        "architecture cannot represent instead of erroring")
    parser.add_argument("overrides", nargs="*", metavar="model.key=value")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    with open(args.ckpt, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    params = serialization.msgpack_restore(payload["params"])

    cfg = config_lib.Config()
    if not payload.get("config"):
        log.warning(
            "checkpoint has no config snapshot; assuming the default "
            "flagship ModelConfig — pass model.* overrides if dims differ "
            "(a mismatch surfaces as a KeyError on the first missing param)"
        )
    if payload.get("config"):
        saved = json.loads(payload["config"])

        def flatten(prefix, tree, out):
            for k, v in tree.items():
                if isinstance(v, dict):
                    flatten(f"{prefix}{k}.", v, out)
                elif v is not None:
                    out.append(f"{prefix}{k}={v}")
            return out

        cfg = config_lib.apply_overrides(
            cfg, flatten("model.", saved.get("model", {}), [])
        )
    cfg = config_lib.apply_overrides(cfg, args.overrides)

    export_reference_checkpoint(
        args.out, params, cfg.model,
        epoch=int(payload.get("epoch", 0)), step=int(payload.get("step", 0)),
        strict=not args.no_strict,
    )
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
