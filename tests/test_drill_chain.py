"""Structure-file-in-the-loop integration: realistic structure -> mmCIF
-> parser -> release-layout pack -> TrajectoryDataset -> one train step.

Pins the seam the real-structure drill (tools/realistic_structure_drill.py)
exercises at production scale: the packed trajectory npz is built ONLY
from coordinates that went through preprocess/mmcif.py's PDBx tokenizer,
so a writer/parser/packer drift breaks THIS test, not just the offline
tool. Mirrors the reference chain prep_atlas_with_forces.py:26-38
(per-frame structure file -> parsed features -> stacked npz).
"""
import csv
import pickle

import numpy as np
import pytest

# compile-heavy on a 1-core host (model init + train-step compile):
# run via `make heavy`; excluded from the default `make test` tier
pytestmark = pytest.mark.heavy


def test_mmcif_parsed_trajectory_trains(tmp_path):
    import jax

    from dynamicpdb_tpu.config import (
        Config, IPAConfig, ModelConfig, apply_overrides,
    )
    from dynamicpdb_tpu.data.dataset import TrajectoryDataset
    from dynamicpdb_tpu.data.realistic import make_realistic_window
    from dynamicpdb_tpu.diffusion.se3_diffuser import SE3Config
    from dynamicpdb_tpu.diffusion.so3_diffuser import SO3Config
    from dynamicpdb_tpu.preprocess.mmcif import parse_mmcif, write_mmcif
    from dynamicpdb_tpu.train.experiment import Trainer

    n_res, n_frames = 16, 4
    w = make_realistic_window(n_res=n_res, frame_time=n_frames, seed=3)

    # every frame through the writer + parser; pack ONLY parsed coords
    frames = []
    for f in range(n_frames):
        path = tmp_path / f"fr{f}.cif"
        write_mmcif(str(path), w["atom37"][f], w["atom37_mask"], w["aatype"])
        chain = parse_mmcif(str(path)).chains["A"]
        assert (chain.aatype == w["aatype"]).all()
        assert (chain.atom37_mask == w["atom37_mask"]).all()
        err = np.abs(
            (chain.atom37 - w["atom37"][f]) * w["atom37_mask"][..., None]
        ).max()
        assert err <= 5.1e-4, err  # %.3f writer quantization bound
        frames.append(chain.atom37)
    atom37 = np.stack(frames).astype(np.float32)

    npz = tmp_path / "p_new_w_pp.npz"
    np.savez(
        npz,
        all_atom_positions=atom37,
        all_atom_mask=w["atom37_mask"],
        aatype=np.eye(21, dtype=np.float32)[w["aatype"]],
        residue_index=w["residue_index"],
    )
    with open(tmp_path / "p_F_Ca.pkl", "wb") as f:
        pickle.dump(w["force"], f)
    with open(tmp_path / "p_V_ca.pkl", "wb") as f:
        pickle.dump(w["vel"], f)
    np.savez(tmp_path / "p.npz", node_repr=w["node_repr"],
             edge_repr=w["edge_repr"])
    manifest = tmp_path / "manifest.csv"
    row = {
        "name": "p_A",
        "atlas_npz": str(npz),
        "force_path": str(tmp_path / "p_F.pkl"),
        "vel_path": str(tmp_path / "p_V.pkl"),
        "embed_path": str(tmp_path / "p.npz"),
        "seq_len": n_res,
    }
    with open(manifest, "w", newline="") as f:
        wtr = csv.DictWriter(f, fieldnames=list(row))
        wtr.writeheader()
        wtr.writerow(row)

    cfg = Config(
        model=ModelConfig(
            node_embed_size=32, edge_embed_size=16,
            ipa=IPAConfig(c_s=32, c_z=16, c_hidden=16, no_heads=2,
                          no_qk_points=2, no_v_points=3, num_blocks=1),
        ),
        diffuser=SE3Config(
            so3=SO3Config(num_omega=100, num_sigma=50, cache_dir=None,
                          series_L=100),
        ),
    )
    cfg = apply_overrides(cfg, [
        f"data.csv_path={manifest}", "data.frame_time=2",
        f"data.filtering.max_len={n_res}",
    ])
    ds = TrajectoryDataset(cfg.data, split="train", pad_to=n_res)
    rng = np.random.default_rng(0)
    window = ds.get_window(0, rng)
    window.pop("name", None)

    trainer = Trainer(cfg)
    key = jax.random.PRNGKey(0)
    params, opt_state = trainer.init_params(key, window)
    batch = {k: np.stack([v]) for k, v in window.items()}
    step = trainer.compiled_train_step(opt_state)
    params, opt_state, aux = step(params, opt_state, key, batch)
    loss = float(aux["total_loss"])
    assert np.isfinite(loss), loss
