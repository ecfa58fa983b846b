"""End-to-end release ingestion: tools/ingest_release.py turns a
release-layout checkout (README.md:120-140 naming) into bundle npz files
+ a training manifest that the dataset class loads — the reference's four
data_preprocess scripts in one command."""
import csv
import pickle

import numpy as np

from dynamicpdb_tpu.analysis.pdb_io import write_pdb
from dynamicpdb_tpu.chem import constants as chem
from dynamicpdb_tpu.data.synthetic import make_window
from dynamicpdb_tpu.preprocess.dcd import write_dcd

BOX = 60.0


def _state_xml(box_a: float) -> str:
    nm = box_a / 10.0
    return (
        '<?xml version="1.0" ?>\n<State>\n<PeriodicBoxVectors>\n'
        f' <A x="{nm}" y="0" z="0"/>\n <B x="0" y="{nm}" z="0"/>\n'
        f' <C x="0" y="0" z="{nm}"/>\n</PeriodicBoxVectors>\n</State>\n'
    )


def _protein_files(n_res=5, n_frames=4, seed=3):
    w = make_window(n_res=n_res, frame_time=1, seed=seed)
    names, coords = [], []
    for i in range(n_res):
        for a in range(37):
            if w["atom37_mask"][i, a]:
                names.append(chem.ATOM37_NAMES[a])
                coords.append(w["atom37"][0, i, a])
    frame = np.asarray(coords, np.float32)
    traj = np.tile(frame[None], (n_frames, 1, 1))
    # drift so velocities/forces aren't degenerate
    traj += np.arange(n_frames, dtype=np.float32)[:, None, None] * 0.1
    return w, names, traj


def test_ingest_release_two_layouts(tmp_path, capsys):
    from tools.ingest_release import main

    root = tmp_path / "dynamicPDB"
    root.mkdir()

    # protein 1: release dir naming, combined pickles, WRAPPED coords + xml
    pid1 = "1a62_A"
    d1 = root / f"{pid1}_npt100000.0_ts0.001"
    d1.mkdir()
    w1, names1, traj1 = _protein_files(seed=3)
    write_pdb(str(d1 / f"{pid1}.pdb"), w1["atom37"][0], w1["aatype"],
              w1["atom37_mask"])
    wrapped = traj1.copy()
    wrapped[2:] += BOX  # a box jump at frame 2: unwrap must remove it
    for suffix, arr in (("_T.pkl", wrapped), ("_F.pkl", traj1 * 0.1),
                        ("_V.pkl", traj1 * 0.2)):
        with open(d1 / f"{pid1}{suffix}", "wb") as f:
            pickle.dump(arr, f)
    (d1 / f"{pid1}_state_npt100000.0.xml").write_text(_state_xml(BOX))

    # protein 2: plain dir, DCD-only coordinates, precomputed embeddings
    pid2 = "1ah7_A"
    d2 = root / pid2
    d2.mkdir()
    w2, names2, traj2 = _protein_files(seed=4)
    write_pdb(str(d2 / f"{pid2}.pdb"), w2["atom37"][0], w2["aatype"],
              w2["atom37_mask"])
    write_dcd(str(d2 / f"{pid2}_T.dcd"), traj2)
    emb = tmp_path / "embeds"
    emb.mkdir()
    n = len(w2["aatype"])
    rng = np.random.default_rng(0)
    np.savez(emb / f"{pid2}.npz",
             node_repr=rng.normal(size=(n, 256)).astype(np.float32),
             edge_repr=rng.normal(size=(n, n, 128)).astype(np.float32))

    # a non-protein dir must be ignored, not crash discovery
    (root / "assets").mkdir()

    out = tmp_path / "packed"
    assert main([
        "--data-root", str(root), "--out-dir", str(out),
        "--unwrap", "--embeddings-dir", str(emb),
    ]) == 0
    assert "2 proteins" in capsys.readouterr().out

    with open(out / "manifest.csv") as f:
        rows = {r["name"]: r for r in csv.DictReader(f)}
    assert set(rows) == {pid1, pid2}

    # unwrap removed the frame-2 box jump: trajectory is smooth again
    with np.load(rows[pid1]["atlas_npz"]) as z:
        pos = z["all_atom_positions"]
        steps = np.abs(np.diff(pos[:, :, 1], axis=0)).max()  # CA rows
        assert steps < 1.0, f"box jump survived unwrap: {steps}"
        assert z["force"].shape == (4, 5, 3)

    # protein 2 carried its precomputed embeddings into the bundle
    with np.load(rows[pid2]["atlas_npz"]) as z2, \
            np.load(emb / f"{pid2}.npz") as ze:
        np.testing.assert_array_equal(z2["node_repr"], ze["node_repr"])

    # the manifest drives the real dataset class
    from dynamicpdb_tpu.config import DataConfig
    from dynamicpdb_tpu.data.dataset import TrajectoryDataset

    cfg = DataConfig(csv_path=str(out / "manifest.csv"), frame_time=2)
    ds = TrajectoryDataset(cfg, split="train")
    assert len(ds) == 2
    item = ds.get_window(0, np.random.default_rng(0))
    assert item["atom37"].shape[0] == 2  # frame_time window


def test_ingest_skips_broken_protein(tmp_path, capsys):
    from tools.ingest_release import main

    root = tmp_path / "root"
    root.mkdir()
    pid = "1ok_A"
    d = root / pid
    d.mkdir()
    w, names, traj = _protein_files(seed=5)
    write_pdb(str(d / f"{pid}.pdb"), w["atom37"][0], w["aatype"],
              w["atom37_mask"])
    with open(d / f"{pid}_T.pkl", "wb") as f:
        pickle.dump(traj, f)
    # broken protein: topology but no trajectory at all
    bad = root / "2bad_B"
    bad.mkdir()
    write_pdb(str(bad / "2bad_B.pdb"), w["atom37"][0], w["aatype"],
              w["atom37_mask"])

    out = tmp_path / "packed"
    assert main(["--data-root", str(root), "--out-dir", str(out)]) == 0
    assert "1 proteins" in capsys.readouterr().out
