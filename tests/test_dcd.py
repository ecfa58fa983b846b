"""Dependency-free DCD I/O: the release ships {pid}_T.dcd trajectories
(reference README.md:59-66) that the reference reads via mdtraj
(data_preprocess/post_process.py); preprocess/dcd.py reads and writes the
format with no MD libraries. Pure numpy — fast tier."""
import struct

import numpy as np
import pytest

from dynamicpdb_tpu.preprocess.dcd import read_dcd, read_dcd_segments, write_dcd

RNG = np.random.default_rng(7)


def test_roundtrip_no_box(tmp_path):
    xyz = RNG.normal(size=(5, 17, 3)).astype(np.float32) * 10
    p = str(tmp_path / "t.dcd")
    write_dcd(p, xyz)
    out = read_dcd(p)
    np.testing.assert_array_equal(out["xyz"], xyz)
    assert "box_lengths" not in out


def test_roundtrip_with_box(tmp_path):
    xyz = RNG.normal(size=(3, 8, 3)).astype(np.float32)
    box = np.array([41.2, 41.2, 55.0])
    p = str(tmp_path / "t.dcd")
    write_dcd(p, xyz, box_lengths=box)
    out = read_dcd(p)
    np.testing.assert_array_equal(out["xyz"], xyz)
    np.testing.assert_allclose(out["box_lengths"], np.tile(box, (3, 1)))
    # cosine-form 0.0 -> 90 degrees
    np.testing.assert_allclose(out["box_angles_deg"], 90.0)


def test_per_frame_box(tmp_path):
    xyz = np.zeros((2, 4, 3), np.float32)
    boxes = np.array([[40.0, 41.0, 42.0], [43.0, 44.0, 45.0]])
    p = str(tmp_path / "t.dcd")
    write_dcd(p, xyz, box_lengths=boxes)
    np.testing.assert_allclose(read_dcd(p)["box_lengths"], boxes)


def _write_big_endian_dcd(path, xyz):
    """Hand-rolled big-endian file (CHARMM on big-endian hosts); exercises
    the byte-order detection path the writer never produces."""
    nframes, natoms = xyz.shape[:2]
    icntrl = [0] * 20
    icntrl[0], icntrl[19] = nframes, 24
    with open(path, "wb") as f:
        f.write(struct.pack(">i", 84) + b"CORD" + struct.pack(">20i", *icntrl))
        f.write(struct.pack(">i", 84))
        f.write(struct.pack(">ii", 84, 1) + b"t".ljust(80) + struct.pack(">i", 84))
        f.write(struct.pack(">iii", 4, natoms, 4))
        for fi in range(nframes):
            for axis in range(3):
                f.write(struct.pack(">i", 4 * natoms))
                f.write(xyz[fi, :, axis].astype(">f4").tobytes())
                f.write(struct.pack(">i", 4 * natoms))


def test_big_endian_detected(tmp_path):
    xyz = RNG.normal(size=(2, 6, 3)).astype(np.float32)
    p = str(tmp_path / "be.dcd")
    _write_big_endian_dcd(p, xyz)
    np.testing.assert_array_equal(read_dcd(p)["xyz"], xyz)


def test_degree_form_angles(tmp_path):
    """Older CHARMM files store angles in degrees, not cosines."""
    p = str(tmp_path / "deg.dcd")
    write_dcd(p, np.zeros((1, 2, 3), np.float32), box_lengths=[30, 30, 30])
    raw = bytearray(open(p, "rb").read())
    # unit-cell record body starts right after header(92) + title(96) +
    # natoms record(12) + its 4-byte length marker
    off = 92 + (8 + 84) + 12 + 4
    struct.pack_into("<6d", raw, off, 30.0, 90.0, 30.0, 90.0, 90.0, 30.0)
    open(p, "wb").write(raw)
    out = read_dcd(p)
    np.testing.assert_allclose(out["box_angles_deg"], 90.0)
    np.testing.assert_allclose(out["box_lengths"], 30.0)


def test_errors(tmp_path):
    notdcd = tmp_path / "x.dcd"
    notdcd.write_bytes(b"hello world, definitely not a dcd")
    with pytest.raises(ValueError, match="not a DCD"):
        read_dcd(str(notdcd))

    good = tmp_path / "good.dcd"
    write_dcd(str(good), np.zeros((2, 3, 3), np.float32))
    blob = good.read_bytes()
    trunc = tmp_path / "trunc.dcd"
    trunc.write_bytes(blob[:-20])  # cuts the last frame's z record
    with pytest.raises(ValueError, match="truncated"):
        read_dcd(str(trunc))


def test_empty_trajectory(tmp_path):
    p = str(tmp_path / "e.dcd")
    write_dcd(p, np.zeros((0, 9, 3), np.float32))
    assert read_dcd(p)["xyz"].shape == (0, 9, 3)


def test_segments(tmp_path):
    d = tmp_path / "1abc_A_dcd"
    d.mkdir()
    chunks = [RNG.normal(size=(2, 5, 3)).astype(np.float32) for _ in range(3)]
    # write out of lexicographic order to check numeric sorting
    for i, arr in zip((2, 0, 1), (chunks[2], chunks[0], chunks[1])):
        write_dcd(str(d / f"1abc_A_dcd_{i}.dcd"), arr)
    out = read_dcd_segments(str(d), "1abc_A_dcd")
    np.testing.assert_array_equal(out["xyz"], np.concatenate(chunks))
    with pytest.raises(FileNotFoundError):
        read_dcd_segments(str(d), "nope")


def test_cli_info_and_npz_conversion(tmp_path, capsys):
    from dynamicpdb_tpu.preprocess.dcd import main

    xyz = RNG.normal(size=(4, 3, 3)).astype(np.float32)
    p = str(tmp_path / "t.dcd")
    write_dcd(p, xyz, box_lengths=[50, 50, 50])
    assert main([p, "--out", str(tmp_path / "t.npz")]) == 0
    assert "4 frames x 3 atoms" in capsys.readouterr().out
    with np.load(tmp_path / "t.npz") as z:
        np.testing.assert_array_equal(z["xyz"], xyz)

    # rollout npz -> dcd (the eval_cli --extension artifact key)
    np.savez(tmp_path / "roll.npz", atom_traj=xyz.reshape(4, 1, 3, 3))
    assert main([str(tmp_path / "roll.npz"), "--out",
                 str(tmp_path / "roll.dcd")]) == 0
    np.testing.assert_array_equal(read_dcd(str(tmp_path / "roll.dcd"))["xyz"],
                                  xyz)


def test_pack_release_from_dcd_only(tmp_path):
    """pack_from_dynamicpdb_release falls back to {pid}_T.dcd when no
    pickle/segment trajectory exists (minimal release download)."""
    from dynamicpdb_tpu.analysis.pdb_io import write_pdb
    from dynamicpdb_tpu.chem import constants as chem
    from dynamicpdb_tpu.data.synthetic import make_window
    from dynamicpdb_tpu.preprocess.pack import pack_from_dynamicpdb_release

    w = make_window(n_res=5, frame_time=1, seed=11)
    pid = "1abc_A"
    write_pdb(str(tmp_path / f"{pid}.pdb"), w["atom37"][0], w["aatype"],
              w["atom37_mask"])
    names, coords = [], []
    for i in range(5):
        for a in range(37):
            if w["atom37_mask"][i, a]:
                names.append(chem.ATOM37_NAMES[a])
                coords.append(w["atom37"][0, i, a])
    traj = np.tile(np.asarray(coords, np.float32)[None], (4, 1, 1))
    write_dcd(str(tmp_path / f"{pid}_T.dcd"), traj)
    out = pack_from_dynamicpdb_release(
        str(tmp_path / "bundle.npz"), str(tmp_path), pid, max_frames=3
    )
    with np.load(out) as z:
        assert z["all_atom_positions"].shape == (3, 5, 37, 3)


def test_dcd_to_pbc_unwrap_chain(tmp_path):
    """Release chain without mdtraj: DCD -> read -> PBC unwrap
    (post_process.py:51-76 equivalent, end to end in this package)."""
    from dynamicpdb_tpu.preprocess import pbc

    box = 20.0
    # a walker drifting +3 A/frame in x: wraps at the box edge
    true_path = np.zeros((8, 4, 3), np.float32)
    true_path[:, :, 0] = np.arange(8)[:, None] * 3.0 + 10.0
    wrapped = true_path.copy()
    wrapped[:, :, 0] %= box
    p = str(tmp_path / "w.dcd")
    write_dcd(p, wrapped, box_lengths=[box] * 3)
    traj = read_dcd(p)
    fixed = pbc.unwrap_trajectory(traj["xyz"], traj["box_lengths"][0])
    np.testing.assert_allclose(fixed, true_path, atol=1e-4)
