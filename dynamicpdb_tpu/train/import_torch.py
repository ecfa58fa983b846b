"""Import trained REFERENCE checkpoints (torch) into our flax params.

The reference saves checkpoints as a torch-pickled dict
{'model': state_dict, 'conf': OmegaConf, 'optimizer', 'epoch', 'step'}
(/root/reference/src/data/utils.py:324-362) and eval loads them with a
'module.'-prefix strip (/root/reference/eval_DFOLD_dynamics.py:113-136).

This module inverts the weight mapping proven by tools/parity_model.py
(flax -> torch, forward-equal <=3e-5), so a reference-trained
FullScoreNetwork runs through OUR sampler/eval unchanged.
"""
from __future__ import annotations

import io
import logging
import pickle

import numpy as np

from dynamicpdb_tpu.config import ModelConfig

log = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# tolerant torch.load: real checkpoints pickle OmegaConf objects (and CUDA
# tensors) that this environment can't/shouldn't materialize
# ---------------------------------------------------------------------------
class _Stub:
    """Accepts any pickled state; stands in for unimportable classes."""

    def __init__(self, *a, **k):
        pass

    def __setstate__(self, state):
        self.__dict__["state"] = state


class _TolerantUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        try:
            return super().find_class(module, name)
        except (ImportError, AttributeError):
            log.debug("stubbing unpicklable %s.%s", module, name)
            return type(name, (_Stub,), {})


class _PickleModule:
    Unpickler = _TolerantUnpickler
    load = staticmethod(lambda f, **kw: _TolerantUnpickler(f).load())
    loads = staticmethod(
        lambda b, **kw: _TolerantUnpickler(io.BytesIO(b)).load()
    )


def load_reference_checkpoint(path: str) -> dict:
    """torch.load the reference pickle, stubbing unimportable classes and
    mapping tensors to CPU. Returns the raw payload dict."""
    import torch

    return torch.load(
        path, map_location="cpu", pickle_module=_PickleModule,
        weights_only=False,
    )


# ---------------------------------------------------------------------------
# state_dict -> flax params (inverse of tools/parity_model.py's mapping)
# ---------------------------------------------------------------------------
def _inv_point_perm(n_heads: int, n_pts: int) -> np.ndarray:
    """Reference point-projection rows are ordered xyz*(H*P)+hp; our columns
    are hp*3+xyz. Returns inv with ours_row[j] = ref_row[inv[j]]."""
    hp = np.arange(n_heads * n_pts)
    perm = np.empty(3 * n_heads * n_pts, dtype=int)
    for xyz in range(3):
        perm[xyz * n_heads * n_pts + hp] = hp * 3 + xyz
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    return inv


def flax_from_reference_state_dict(sd: dict, model_cfg: ModelConfig):
    """Map a reference FullScoreNetwork state_dict onto our flax params tree.

    Covers every parameter of the active DFOLD path (the reference's trunk
    LayerNorms are the parameterless MyLayerNorm). 'module.' prefixes are
    stripped (DDP wrapping, eval:132-134)."""

    def to_np(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    sd = {k.removeprefix("module."): to_np(v) for k, v in sd.items()}
    ipa = model_cfg.ipa
    H, PQ, PV = ipa.no_heads, ipa.no_qk_points, ipa.no_v_points
    flat: dict[str, np.ndarray] = {}

    def lin(mine, ref):
        flat[f"{mine}/kernel"] = sd[f"{ref}.weight"].T
        if f"{ref}.bias" in sd:
            flat[f"{mine}/bias"] = sd[f"{ref}.bias"]

    def mlp(mine, ref):
        lin(f"{mine}/Dense_0", f"{ref}.0")
        lin(f"{mine}/Dense_1", f"{ref}.2")

    def points(mine, ref, n_pts):
        inv = _inv_point_perm(H, n_pts)
        flat[f"{mine}/kernel"] = sd[f"{ref}.weight"][inv].T
        flat[f"{mine}/bias"] = sd[f"{ref}.bias"][inv]

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
        flat[f"{mine}/head_weights"] = sd[f"{ref}.head_weights"]
        lin(f"bb_update_{b}/Dense_0", f"score_model.trunk.bb_update_{b}.linear")
    for i in range(4):
        for j, conv_idx in ((0, 0), (1, 2)):
            w = sd[f"score_model.trunk.conv_0.conv{i + 1}.{conv_idx}.weight"]
            flat[f"conv_0/Conv_{2 * i + j}/kernel"] = w.transpose(2, 3, 1, 0)
            flat[f"conv_0/Conv_{2 * i + j}/bias"] = sd[
                f"score_model.trunk.conv_0.conv{i + 1}.{conv_idx}.bias"
            ]
    lin("angle_resnet/Dense_0", "score_model.angle_resnet.linear_initial")
    lin("angle_resnet/Dense_1", "score_model.angle_resnet.linear_in")
    for i in range(2):
        lin(f"angle_resnet/AngleResnetBlock_{i}/Dense_0",
            f"score_model.angle_resnet.layers.{i}.linear_1")
        lin(f"angle_resnet/AngleResnetBlock_{i}/Dense_1",
            f"score_model.angle_resnet.layers.{i}.linear_2")
    lin("angle_resnet/Dense_2", "score_model.angle_resnet.linear_out")

    import flax
    import jax.numpy as jnp

    return {
        "params": flax.traverse_util.unflatten_dict(
            {tuple(k.split("/")): jnp.asarray(v) for k, v in flat.items()}
        )
    }


def import_reference_checkpoint(path: str, model_cfg: ModelConfig):
    """Reference .pth/.pkl checkpoint -> (flax params, payload extras)."""
    payload = load_reference_checkpoint(path)
    params = flax_from_reference_state_dict(payload["model"], model_cfg)
    extras = {k: payload.get(k) for k in ("conf", "epoch", "step")}
    n = sum(v.size for v in
            __import__("jax").tree_util.tree_leaves(params))
    log.info("imported reference checkpoint %s: %.1fM params (step %s)",
             path, n / 1e6, extras.get("step"))
    return params, extras
