"""Trained-checkpoint interop: a reference-format torch checkpoint imports
into flax params that reproduce the reference forward exactly (inverse of
the tools/parity_model.py mapping)."""
import os
import sys
import types

import numpy as np
import pytest

ref_available = os.path.isdir("/root/reference")

if ref_available:
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
    import torch

import jax
import jax.numpy as jnp

from dynamicpdb_tpu.config import EmbedConfig, IPAConfig, ModelConfig
from dynamicpdb_tpu.diffusion.r3_diffuser import R3Config
from dynamicpdb_tpu.diffusion.se3_diffuser import SE3Config, SE3Diffuser
from dynamicpdb_tpu.diffusion.so3_diffuser import SO3Config
from dynamicpdb_tpu.models.score_network import DFoldScoreNetwork, score_forward
from dynamicpdb_tpu.train.import_torch import (
    import_reference_checkpoint,
)

F, N = 2, 12
C_S, C_Z, C_H, H, PQ, PV, BLOCKS = 32, 16, 16, 2, 2, 3, 2
SO3_GRID = dict(num_omega=100, num_sigma=50, min_sigma=0.1, max_sigma=1.5)

MY_CFG = ModelConfig(
    node_embed_size=C_S, edge_embed_size=C_Z, embed=EmbedConfig(),
    ipa=IPAConfig(c_s=C_S, c_z=C_Z, c_hidden=C_H, no_heads=H,
                  no_qk_points=PQ, no_v_points=PV, num_blocks=BLOCKS,
                  coordinate_scaling=1.0),
)


def _ns(**kw):
    return types.SimpleNamespace(**kw)


def _purge_src_stubs():
    """test_diffusion.py installs fake 'src.data*' modules; drop them so the
    REAL reference packages import (order-dependent under the full suite)."""
    for k in [k for k in sys.modules
              if k == "src" or k.startswith("src.")]:
        if isinstance(getattr(sys.modules[k], "__file__", None), str):
            continue  # real module from /root/reference
        del sys.modules[k]


def _build_reference():
    _purge_src_stubs()
    from src.data.se3_diffuser import SE3Diffuser as RefSE3
    from src.model.Dfold_network_dynamic import FullScoreNetwork

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
    torch.manual_seed(1)
    ref_diffuser = RefSE3(diff_conf)
    model = FullScoreNetwork(model_conf, ref_diffuser).eval()
    # zero-init bb updates never move frames; give them real weights so the
    # imported checkpoint exercises the whole trunk
    with torch.no_grad():
        for b in range(BLOCKS):
            lin = model.score_model.trunk[f"bb_update_{b}"].linear
            lin.weight.copy_(torch.randn_like(lin.weight) * 0.02)
    model._ref_diffuser = ref_diffuser
    return model


def _fake_feats(rng):
    quat = rng.normal(size=(F, N, 4))
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    rigids_0 = np.concatenate([quat, rng.normal(size=(F, N, 3)) * 5], -1)
    quat_t = rng.normal(size=(F, N, 4))
    quat_t /= np.linalg.norm(quat_t, axis=-1, keepdims=True)
    rigids_t = np.concatenate([quat_t, rng.normal(size=(F, N, 3))], -1)
    return {
        "res_mask": np.ones((F, N), np.float32),
        "fixed_mask": np.zeros((F, N), np.float32),
        "seq_idx": np.tile(np.arange(1, N + 1, dtype=np.int64)[None], (F, 1)),
        "t": np.full((F,), 0.37, np.float32),
        "rigids_t": rigids_t.astype(np.float32),
        "rigids_0": rigids_0.astype(np.float32),
        "node_repr": rng.normal(size=(N, 256)).astype(np.float32),
        "edge_repr": rng.normal(size=(N, N, 128)).astype(np.float32),
        "torsion_angles_sin_cos": rng.normal(size=(F, N, 7, 2)).astype(np.float32),
        "torsion_angles_mask": np.ones((F, N, 7), np.float32),
        "force": rng.normal(size=(F, N, 3)).astype(np.float32),
        "vel": rng.normal(size=(F, N, 3)).astype(np.float32),
        "aatype": rng.integers(0, 20, (F, N)),
        "sc_ca_t": np.zeros((F, N, 3), np.float32),
    }


@pytest.mark.skipif(not ref_available, reason="reference not mounted")
def test_reference_checkpoint_roundtrip(tmp_path):
    ref_model = _build_reference()

    # write a checkpoint in the reference's exact on-disk format
    # (write_checkpoint, src/data/utils.py:324-362), incl. DDP 'module.'
    # prefixes and an unpicklable-here conf object
    ckpt = tmp_path / "step_77.pth"
    torch.save(
        {
            "model": {f"module.{k}": v for k, v in
                      ref_model.state_dict().items()},
            "conf": None,
            "optimizer": None,
            "epoch": 3,
            "step": 77,
        },
        str(ckpt),
    )

    params, extras = import_reference_checkpoint(str(ckpt), MY_CFG)
    assert extras["step"] == 77 and extras["epoch"] == 3

    rng = np.random.default_rng(0)
    feats_np = _fake_feats(rng)
    with torch.no_grad():
        ref_out = ref_model({k: torch.tensor(v) for k, v in feats_np.items()})

    diffuser = SE3Diffuser(
        SE3Config(so3=SO3Config(cache_dir=None, series_L=1000, **SO3_GRID),
                  r3=R3Config(coordinate_scaling=1.0))
    )
    model = DFoldScoreNetwork(MY_CFG)
    my_out = score_forward(
        model, params, diffuser,
        {k: jnp.asarray(v) for k, v in feats_np.items()},
    )

    for key, tol in [("rigids", 1e-3), ("angles", 1e-3), ("atom37", 1e-3),
                     ("rot_score", 5e-3), ("trans_score", 5e-3)]:
        mine = np.asarray(my_out[key])
        theirs = ref_out[key].detach().numpy()
        if key == "rigids":
            sign = np.sign(
                np.sum(mine[..., :4] * theirs[..., :4], -1, keepdims=True)
            )
            mine = np.concatenate([mine[..., :4] * sign, mine[..., 4:]], -1)
        assert np.abs(mine - theirs).max() < tol, key


@pytest.mark.skipif(not ref_available, reason="reference not mounted")
def test_sampler_parity_with_reference_inference_loop(tmp_path):
    """Reference weights through OUR scan-based sampler reproduce the
    reference's reverse-diffusion loop (inference_fn, train:1471-1503) at
    noise_scale=0 (both SDE steps deterministic). This is the end-to-end
    'imported reference weights reproduce reference eval through our
    sampler' proof."""
    import src.data.utils as ref_du
    from openfold.utils import rigid_utils as ref_ru

    from dynamicpdb_tpu.sampling.reverse import reverse_sample

    ref_model = _build_reference()
    ref_diffuser = ref_model._ref_diffuser
    params = __import__(
        "dynamicpdb_tpu.train.import_torch", fromlist=["x"]
    ).flax_from_reference_state_dict(ref_model.state_dict(), MY_CFG)

    rng = np.random.default_rng(3)
    feats_np = _fake_feats(rng)
    num_t, min_t, dt = 5, 0.01, 1.0 / 5

    # --- reference loop (mirrors inference_fn step semantics exactly) ----
    sample = {k: torch.tensor(v) for k, v in feats_np.items()}
    reverse_steps = np.linspace(min_t, 1.0, num_t)[::-1]
    tp = torch.ones((1,))
    with torch.no_grad():
        for t in reverse_steps:
            sample["t"] = t * tp
            rs, ts = ref_diffuser.score_scaling(t)
            sample["rot_score_scaling"] = rs * tp
            sample["trans_score_scaling"] = ts * tp
            model_out = ref_model(sample)
            if t > min_t:
                diffuse_mask = (1 - sample["fixed_mask"]) * sample["res_mask"]
                rigids_t = ref_diffuser.reverse(
                    rigid_t=ref_ru.Rigid.from_tensor_7(sample["rigids_t"]),
                    rot_score=ref_du.move_to_np(model_out["rot_score"]),
                    trans_score=ref_du.move_to_np(model_out["trans_score"]),
                    diffuse_mask=ref_du.move_to_np(diffuse_mask),
                    t=t, dt=dt, center=True, noise_scale=0.0,
                )
            else:
                rigids_t = ref_ru.Rigid.from_tensor_7(model_out["rigids"])
            sample["rigids_t"] = rigids_t.to_tensor_7().float()
    ref_final = sample["rigids_t"].numpy()
    ref_atom37 = model_out["atom37"].numpy()

    # --- our sampler ------------------------------------------------------
    diffuser = SE3Diffuser(
        SE3Config(so3=SO3Config(cache_dir=None, series_L=1000, **SO3_GRID),
                  r3=R3Config(coordinate_scaling=1.0))
    )
    model = DFoldScoreNetwork(MY_CFG)
    out = reverse_sample(
        jax.random.PRNGKey(0), model, params, diffuser,
        {k: jnp.asarray(v) for k, v in feats_np.items()},
        num_t=num_t, min_t=min_t, noise_scale=0.0,
    )
    mine = np.asarray(out["rigids"])
    sign = np.sign(np.sum(mine[..., :4] * ref_final[..., :4], -1,
                          keepdims=True))
    mine = np.concatenate([mine[..., :4] * sign, mine[..., 4:]], -1)
    assert np.abs(mine - ref_final).max() < 5e-3
    assert np.abs(np.asarray(out["atom37"]) - ref_atom37).max() < 5e-3


@pytest.mark.slow
@pytest.mark.skipif(not ref_available, reason="reference not mounted")
def test_eval_cli_ref_ckpt_end_to_end(tmp_path, capsys):
    """eval_cli --ref-ckpt: reference torch checkpoint -> our sampler/metrics."""
    import csv

    from dynamicpdb_tpu import eval_cli
    from dynamicpdb_tpu.data.synthetic import make_trajectory_npz

    ref_model = _build_reference()
    ckpt = tmp_path / "ref.pth"
    torch.save(
        {"model": ref_model.state_dict(), "conf": None, "optimizer": None,
         "epoch": 0, "step": 1},
        str(ckpt),
    )
    make_trajectory_npz(str(tmp_path / "traj.npz"), n_res=N, n_frames=8)
    with open(tmp_path / "m.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["name", "atlas_npz", "seq_len"])
        w.writerow(["p0", str(tmp_path / "traj.npz"), N])

    eval_cli.main([
        "--ckpt", str(ckpt), "--ref-ckpt",
        f"data.csv_path={tmp_path / 'm.csv'}",
        f"data.filtering.max_len={N}",
        "data.num_t=3",
        f"model.node_embed_size={C_S}", f"model.edge_embed_size={C_Z}",
        f"model.ipa.c_s={C_S}", f"model.ipa.c_z={C_Z}",
        f"model.ipa.c_hidden={C_H}", f"model.ipa.no_heads={H}",
        f"model.ipa.no_qk_points={PQ}", f"model.ipa.no_v_points={PV}",
        f"model.ipa.num_blocks={BLOCKS}",
    ])
    out = capsys.readouterr().out
    assert "ave_rot:" in out and "ave_atom_rmsd:" in out
