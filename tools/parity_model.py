"""Weight-transfer parity: load OUR flax parameters into the REFERENCE torch
model and compare full forward outputs.

This is the strongest architecture-parity proof available without trained
reference checkpoints: if a random-init set of OUR weights, mapped into the
reference's FullScoreNetwork, produces the same rigids/angles/scores/atoms on
the same inputs, the two networks compute the same function.

Run: python tools/parity_model.py   (CPU, ~1 min)
"""
import os
import sys
import types

import numpy as np

# ---------------------------------------------------------------------------
# stubs so the reference imports without Biopython/mdtraj/pandas-sklearn deps
# ---------------------------------------------------------------------------
for name in ["Bio", "Bio.PDB", "Bio.PDB.Chain", "omegaconf"]:
    sys.modules.setdefault(name, types.ModuleType(name))
sys.modules["Bio.PDB"].PDBParser = object
sys.modules["Bio"].PDB = sys.modules["Bio.PDB"]
sys.modules["Bio.PDB.Chain"].Chain = object
sys.modules["omegaconf"].OmegaConf = object
sys.modules["omegaconf"].DictConfig = object
_ds = types.ModuleType("deepspeed")
_ds.utils = types.SimpleNamespace(is_initialized=lambda: False)
sys.modules.setdefault("deepspeed", _ds)

sys.path.insert(0, "/root/reference")

import torch  # noqa: E402

# ---------------------------------------------------------------------------
# configs (small dims for speed; same math as flagship)
# ---------------------------------------------------------------------------
F, N = 2, 12
C_S, C_Z, C_H, H, PQ, PV, BLOCKS = 32, 16, 16, 2, 2, 3, 2
NODE_REPR_D, EDGE_REPR_D = 256, 128
SO3_GRID = dict(num_omega=100, num_sigma=50, min_sigma=0.1, max_sigma=1.5)


def ns(**kw):
    return types.SimpleNamespace(**kw)


ref_model_conf = ns(
    node_embed_size=C_S,
    edge_embed_size=C_Z,
    frame_time=F,
    dynamics=True,
    cfg_drop_rate=0.0,
    cfg_drop_in_train=False,
    cfg_gamma=2.0,
    embed=ns(
        DFOLDv2_embedder=True,
        index_embed_size=32,
        aatype_embed_size=32,
        embed_self_conditioning=False,
        num_bins=22,
        min_bin=1e-5,
        max_bin=20.0,
        skip_feature=True,
    ),
    ipa=ns(
        c_s=C_S, c_z=C_Z, c_hidden=C_H, no_heads=H,
        no_qk_points=PQ, no_v_points=PV, num_blocks=BLOCKS,
        coordinate_scaling=1.0, temporal=False,
    ),
)
ref_diff_conf = ns(
    diffuse_rot=True,
    diffuse_trans=True,
    dynamics=True,
    frame_time=F,
    so3=ns(schedule="logarithmic", cache_dir="/tmp/ref_igso3_cache",
           use_cached_score=False, **SO3_GRID),
    r3=ns(min_b=0.1, max_b=20.0, coordinate_scaling=1.0),
)

from src.data.se3_diffuser import SE3Diffuser as RefSE3  # noqa: E402
from src.model.Dfold_network_dynamic import FullScoreNetwork  # noqa: E402

torch.manual_seed(0)
ref_diffuser = RefSE3(ref_diff_conf)
ref_model = FullScoreNetwork(ref_model_conf, ref_diffuser).eval()

# ---------------------------------------------------------------------------
# our model
# ---------------------------------------------------------------------------
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from dynamicpdb_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

# reuse the test-suite cache: this script runs as a subprocess of
# tests/test_model_parity.py and its compiles dominate that test's time
enable_persistent_cache(os.path.join(_REPO, ".cache", "jax_tests"))
from dynamicpdb_tpu.config import EmbedConfig, IPAConfig, ModelConfig  # noqa: E402
from dynamicpdb_tpu.diffusion.r3_diffuser import R3Config  # noqa: E402
from dynamicpdb_tpu.diffusion.se3_diffuser import SE3Config, SE3Diffuser  # noqa: E402
from dynamicpdb_tpu.diffusion.so3_diffuser import SO3Config  # noqa: E402
from dynamicpdb_tpu.models.score_network import DFoldScoreNetwork, score_forward  # noqa: E402

my_cfg = ModelConfig(
    node_embed_size=C_S, edge_embed_size=C_Z,
    embed=EmbedConfig(),
    ipa=IPAConfig(c_s=C_S, c_z=C_Z, c_hidden=C_H, no_heads=H,
                  no_qk_points=PQ, no_v_points=PV, num_blocks=BLOCKS,
                  coordinate_scaling=1.0),
)
my_diffuser = SE3Diffuser(
    SE3Config(so3=SO3Config(cache_dir=None, series_L=1000, **SO3_GRID),
              r3=R3Config(coordinate_scaling=1.0))
)
my_model = DFoldScoreNetwork(my_cfg)

# ---------------------------------------------------------------------------
# inputs
# ---------------------------------------------------------------------------
rng = np.random.default_rng(0)
quat = rng.normal(size=(F, N, 4))
quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
rigids_0 = np.concatenate([quat, rng.normal(size=(F, N, 3)) * 5], -1)
quat_t = rng.normal(size=(F, N, 4))
quat_t /= np.linalg.norm(quat_t, axis=-1, keepdims=True)
rigids_t = np.concatenate([quat_t, rng.normal(size=(F, N, 3))], -1)

feats_np = {
    "res_mask": np.ones((F, N), np.float32),
    "fixed_mask": np.zeros((F, N), np.float32),
    "seq_idx": np.tile(np.arange(1, N + 1, dtype=np.int64)[None], (F, 1)),
    "t": np.full((F,), 0.37, np.float32),
    "rigids_t": rigids_t.astype(np.float32),
    "rigids_0": rigids_0.astype(np.float32),
    "node_repr": rng.normal(size=(N, NODE_REPR_D)).astype(np.float32),
    "edge_repr": rng.normal(size=(N, N, EDGE_REPR_D)).astype(np.float32),
    "torsion_angles_sin_cos": rng.normal(size=(F, N, 7, 2)).astype(np.float32),
    "torsion_angles_mask": np.ones((F, N, 7), np.float32),
    "force": rng.normal(size=(F, N, 3)).astype(np.float32),
    "vel": rng.normal(size=(F, N, 3)).astype(np.float32),
    "aatype": rng.integers(0, 20, (F, N)),
    "sc_ca_t": np.zeros((F, N, 3), np.float32),
}

my_feats = {k: jnp.asarray(v) for k, v in feats_np.items()}
params = my_model.init(jax.random.PRNGKey(0), my_feats)

# ---------------------------------------------------------------------------
# weight mapping: flax params -> reference state_dict
# ---------------------------------------------------------------------------
import flax  # noqa: E402

flat = {
    "/".join(k): np.asarray(v)
    for k, v in flax.traverse_util.flatten_dict(params["params"]).items()
}


def t_lin(prefix_mine, prefix_ref, sd):
    sd[f"{prefix_ref}.weight"] = torch.tensor(flat[f"{prefix_mine}/kernel"].T)
    if f"{prefix_mine}/bias" in flat:
        sd[f"{prefix_ref}.bias"] = torch.tensor(flat[f"{prefix_mine}/bias"])


def t_mlp(mine, ref, sd):
    t_lin(f"{mine}/Dense_0", f"{ref}.0", sd)
    t_lin(f"{mine}/Dense_1", f"{ref}.2", sd)


def point_perm(n_pts):
    """our column o=(hp*3+xyz) -> reference row o'=xyz*(H*n_pts)+hp."""
    hp = np.arange(H * n_pts)
    perm = np.empty(3 * H * n_pts, dtype=int)
    for xyz in range(3):
        perm[xyz * H * n_pts + hp] = hp * 3 + xyz
    return perm


def t_points(mine, ref, n_pts, sd):
    w = flat[f"{mine}/kernel"].T  # [out, in]
    b = flat[f"{mine}/bias"]
    perm = point_perm(n_pts)
    sd[f"{ref}.weight"] = torch.tensor(w[perm])
    sd[f"{ref}.bias"] = torch.tensor(b[perm])


sd = ref_model.state_dict()
t_lin("expand_node", "expand_node", sd)
t_lin("expand_edge", "expand_edge", sd)
for name in ("force_embeder", "vel_embeder", "index_embeder",
             "rigid_embeder", "angle_embeder"):
    t_mlp(name, f"score_model.{name}", sd)
for b in range(BLOCKS):
    mine, ref = f"ipa_{b}", f"score_model.trunk.ipa_{b}"
    t_lin(f"{mine}/linear_q", f"{ref}.linear_q", sd)
    t_lin(f"{mine}/linear_kv", f"{ref}.linear_kv", sd)
    t_points(f"{mine}/linear_q_points", f"{ref}.linear_q_points", PQ, sd)
    t_points(f"{mine}/linear_kv_points", f"{ref}.linear_kv_points", PQ + PV, sd)
    t_lin(f"{mine}/linear_b", f"{ref}.linear_b", sd)
    t_lin(f"{mine}/down_z", f"{ref}.down_z", sd)
    t_lin(f"{mine}/linear_out", f"{ref}.linear_out", sd)
    sd[f"{ref}.head_weights"] = torch.tensor(flat[f"{mine}/head_weights"])
    t_lin(f"bb_update_{b}/Dense_0", f"score_model.trunk.bb_update_{b}.linear", sd)
for i in range(4):
    for j, conv_idx in ((0, 0), (1, 2)):
        k = flat[f"conv_0/Conv_{2 * i + j}/kernel"]  # [kh, kw, in, out]
        sd[f"score_model.trunk.conv_0.conv{i + 1}.{conv_idx}.weight"] = (
            torch.tensor(k.transpose(3, 2, 0, 1))
        )
        sd[f"score_model.trunk.conv_0.conv{i + 1}.{conv_idx}.bias"] = (
            torch.tensor(flat[f"conv_0/Conv_{2 * i + j}/bias"])
        )
t_lin("angle_resnet/Dense_0", "score_model.angle_resnet.linear_initial", sd)
t_lin("angle_resnet/Dense_1", "score_model.angle_resnet.linear_in", sd)
for i in range(2):
    t_lin(f"angle_resnet/AngleResnetBlock_{i}/Dense_0",
          f"score_model.angle_resnet.layers.{i}.linear_1", sd)
    t_lin(f"angle_resnet/AngleResnetBlock_{i}/Dense_1",
          f"score_model.angle_resnet.layers.{i}.linear_2", sd)
t_lin("angle_resnet/Dense_2", "score_model.angle_resnet.linear_out", sd)
ref_model.load_state_dict(sd)

# ---------------------------------------------------------------------------
# EXPORTER check against the LIVE reference model: the standalone exporter
# (train/export_torch.py) must reproduce this proven transfer value-for-value
# on every live key, cover the reference's full key set (incl. the dead
# DFOLDv2_Embeder params), and survive the evaluator's strict
# load_state_dict (eval_DFOLD_dynamics.py:136).
# ---------------------------------------------------------------------------
import tempfile  # noqa: E402

from dynamicpdb_tpu.train.export_torch import (  # noqa: E402
    export_reference_checkpoint,
    reference_state_dict_from_flax,
)

_params_now = flax.core.freeze(
    {"params": flax.traverse_util.unflatten_dict(
        {tuple(k.split("/")): jnp.asarray(v) for k, v in flat.items()}
    )}
)
exp_sd = reference_state_dict_from_flax(_params_now, my_cfg)
assert set(exp_sd) == set(ref_model.state_dict()), (
    "exported key set != reference model key set:\n"
    f"missing: {sorted(set(ref_model.state_dict()) - set(exp_sd))}\n"
    f"extra: {sorted(set(exp_sd) - set(ref_model.state_dict()))}"
)
for _k, _v in exp_sd.items():
    if _k.startswith("embedding_layer.") or ".linear_rbf." in _k:
        continue  # dead params get a deterministic fill, not our values
    np.testing.assert_array_equal(_v, sd[_k].numpy(), err_msg=_k)
with tempfile.NamedTemporaryFile(suffix=".pth") as _f:
    export_reference_checkpoint(_f.name, _params_now, my_cfg, step=1)
    _payload = torch.load(_f.name, weights_only=False)
ref_model.load_state_dict(_payload["model"])  # strict — the eval path
ref_model.load_state_dict(sd)  # restore (exported file zeroes dead params)
print("exporter: key-set + value parity + strict load OK")

# give the bb updates non-zero weights so the trunk actually moves frames
with torch.no_grad():
    for b in range(BLOCKS):
        w = torch.randn_like(
            ref_model.score_model.trunk[f"bb_update_{b}"].linear.weight
        ) * 0.02
        ref_model.score_model.trunk[f"bb_update_{b}"].linear.weight.copy_(w)
        flat[f"bb_update_{b}/Dense_0/kernel"] = w.numpy().T.copy()
params = flax.core.freeze(
    {"params": flax.traverse_util.unflatten_dict(
        {tuple(k.split("/")): jnp.asarray(v) for k, v in flat.items()}
    )}
)

# ---------------------------------------------------------------------------
# forward both
# ---------------------------------------------------------------------------
ref_feats = {k: torch.tensor(v) for k, v in feats_np.items()}
with torch.no_grad():
    ref_out = ref_model(ref_feats)

my_out = score_forward(my_model, params, my_diffuser, my_feats)

print(f"{'output':<16} {'max abs diff':>14}")
ok = True
for key, ref_key in [
    ("rigids", "rigids"), ("angles", "angles"),
    ("unorm_angles", "unorm_angles"), ("rot_score", "rot_score"),
    ("trans_score", "trans_score"), ("atom14", "atom14"),
    ("atom37", "atom37"),
]:
    mine = np.asarray(my_out[key])
    theirs = ref_out[ref_key].detach().numpy()
    if key == "rigids":
        # quats equal up to sign
        sign = np.sign(
            np.sum(mine[..., :4] * theirs[..., :4], -1, keepdims=True)
        )
        mine = np.concatenate([mine[..., :4] * sign, mine[..., 4:]], -1)
    d = float(np.abs(mine - theirs).max())
    tol = 5e-3 if "score" in key else 1e-3
    status = "OK" if d < tol else "FAIL"
    ok &= d < tol
    print(f"{key:<16} {d:>14.2e}  {status}")

print("\nPARITY:", "PASS" if ok else "FAIL")
sys.exit(0 if ok else 1)
