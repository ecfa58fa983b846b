import numpy as np
import pytest

from dynamicpdb_tpu.analysis.pdb_io import read_pdb, write_pdb
from dynamicpdb_tpu.chem import constants as chem
from dynamicpdb_tpu.data.synthetic import make_window
from dynamicpdb_tpu.preprocess import pbc
from dynamicpdb_tpu.preprocess.embeddings import validate, zero_embeddings
from dynamicpdb_tpu.preprocess.pack import pack_trajectory, select_ca_rows

RNG = np.random.default_rng(0)


def test_unwrap_trajectory_fixes_box_jump():
    box = 50.0
    traj = np.cumsum(RNG.normal(0, 0.1, size=(20, 5, 3)), axis=0) + 25.0
    wrapped = np.mod(traj + 40.0, box)  # force crossings
    un = pbc.unwrap_trajectory(wrapped, box)
    # consecutive mean displacements should all be small after unwrap
    deltas = np.abs(np.diff(un, axis=0).mean(axis=1))
    assert deltas.max() < box / 2


def test_unwrap_per_atom_recovers_continuous_path():
    box = 30.0
    true = np.cumsum(RNG.normal(0, 0.5, size=(50, 8, 3)), axis=0)
    wrapped = np.mod(true, box)
    un = pbc.unwrap_per_atom(wrapped, box)
    # unwrapped path differs from true only by a constant offset per atom
    diff = un - true
    np.testing.assert_allclose(
        diff, np.broadcast_to(diff[0:1], diff.shape), atol=1e-8
    )


def test_pdb_roundtrip(tmp_path):
    w = make_window(n_res=8, frame_time=1, seed=3)
    path = str(tmp_path / "test.pdb")
    write_pdb(path, w["atom37"][0], w["aatype"], w["atom37_mask"])
    atom37, mask, aatype, residx = read_pdb(path)
    np.testing.assert_array_equal(aatype, w["aatype"])
    np.testing.assert_array_equal(mask, w["atom37_mask"])
    np.testing.assert_allclose(atom37, w["atom37"][0], atol=2e-3)  # %.3f PDB


def test_pack_trajectory_bundle(tmp_path):
    w = make_window(n_res=6, frame_time=1, seed=4)
    pdb_path = str(tmp_path / "topo.pdb")
    write_pdb(pdb_path, w["atom37"][0], w["aatype"], w["atom37_mask"])

    # build a fake full-atom trajectory in PDB atom order
    names, resseq, coords = [], [], []
    for i in range(6):
        for a in range(37):
            if w["atom37_mask"][i, a]:
                names.append(chem.ATOM37_NAMES[a])
                resseq.append(i + 1)
                coords.append(w["atom37"][0, i, a])
    full = np.tile(np.asarray(coords)[None], (4, 1, 1))
    forces = RNG.normal(size=full.shape)

    out = str(tmp_path / "bundle.npz")
    pack_trajectory(
        out, pdb_path, full, names, np.asarray(resseq), forces=forces
    )
    with np.load(out) as z:
        assert z["all_atom_positions"].shape == (4, 6, 37, 3)
        np.testing.assert_allclose(
            z["all_atom_positions"][0], w["atom37"][0], atol=2e-3
        )
        assert z["force"].shape == (4, 6, 3)
        # C-alpha rows extracted from the full-atom array
        ca_rows = select_ca_rows(forces, names)
        np.testing.assert_allclose(z["force"], ca_rows, atol=1e-6)
        assert np.argmax(z["aatype"], -1).tolist() == w["aatype"].tolist()


def test_embedding_validation(tmp_path):
    good = tmp_path / "good.npz"
    np.savez(good, **zero_embeddings(10))
    assert validate(str(good))["n_res"] == 10
    assert validate(str(good), n_res=10)

    bad = tmp_path / "bad.npz"
    np.savez(bad, node_repr=np.zeros((10, 64)), edge_repr=np.zeros((10, 10, 128)))
    with pytest.raises(ValueError):
        validate(str(bad))


def test_pack_from_dynamicpdb_release_layout(tmp_path):
    import pickle

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
    traj = np.tile(np.asarray(coords)[None], (3, 1, 1))
    for suffix, arr in (("_T.pkl", traj), ("_F.pkl", traj * 0.1),
                        ("_V.pkl", traj * 0.2)):
        with open(tmp_path / f"{pid}{suffix}", "wb") as f:
            pickle.dump(arr, f)
    out = pack_from_dynamicpdb_release(
        str(tmp_path / "bundle.npz"), str(tmp_path), pid
    )
    with np.load(out) as z:
        assert z["all_atom_positions"].shape == (3, 5, 37, 3)
        assert z["force"].shape == (3, 5, 3)


def test_box_from_state_xml_openmm_capital_vectors(tmp_path):
    """OpenMM saveState writes capital <A/><B/><C/> box vectors; the parser
    must read them (a lowercase-only regex used to raise on every real
    State XML)."""
    xml = tmp_path / "state.xml"
    xml.write_text(
        '<?xml version="1.0" ?>\n'
        '<State openmmVersion="8.0" time="1.0">\n'
        "  <PeriodicBoxVectors>\n"
        '    <A x="2.6" y="0" z="0"/>\n'
        '    <B x="0" y="2.6" z="0"/>\n'
        '    <C x="0" y="0" z="2.6"/>\n'
        "  </PeriodicBoxVectors>\n"
        "</State>\n"
    )
    box = pbc.box_from_state_xml(str(xml))
    np.testing.assert_allclose(box, [26.0, 26.0, 26.0])  # nm -> Angstrom


def _state_xml(box_nm: float) -> str:
    return (
        '<?xml version="1.0" ?>\n'
        '<State openmmVersion="8.0" time="100000.0">\n'
        "  <PeriodicBoxVectors>\n"
        f'    <A x="{box_nm}" y="0" z="0"/>\n'
        f'    <B x="0" y="{box_nm}" z="0"/>\n'
        f'    <C x="0" y="0" z="{box_nm}"/>\n'
        "  </PeriodicBoxVectors>\n"
        "</State>\n"
    )


def test_box_from_state_xml_compressed_variants(tmp_path):
    """gzip- and zlib-compressed State XMLs parse identically to plain."""
    import gzip
    import zlib

    text = _state_xml(2.6).encode()
    (tmp_path / "plain.xml").write_bytes(text)
    (tmp_path / "gz.xml").write_bytes(gzip.compress(text))
    (tmp_path / "z.xml").write_bytes(zlib.compress(text))
    for name in ("plain.xml", "gz.xml", "z.xml"):
        np.testing.assert_allclose(
            pbc.box_from_state_xml(str(tmp_path / name)), [26.0] * 3,
            err_msg=name,
        )
    vecs = pbc.box_vectors_from_state_xml(str(tmp_path / "gz.xml"))
    np.testing.assert_allclose(vecs, np.diag([26.0] * 3))


def test_box_from_state_xml_rejects_triclinic(tmp_path):
    xml = tmp_path / "tri.xml"
    xml.write_text(
        "<State><PeriodicBoxVectors>"
        '<A x="2.6" y="0" z="0"/><B x="1.3" y="2.6" z="0"/>'
        '<C x="0" y="0" z="2.6"/>'
        "</PeriodicBoxVectors></State>"
    )
    with pytest.raises(ValueError, match="triclinic"):
        pbc.box_from_state_xml(str(xml))


def test_release_dir_box_roundtrip(tmp_path):
    """The full reference chain (post_process.py:10-76) on release-layout
    fixtures, no OpenMM: find {pid}_state_npt*.xml in the per-protein dir,
    parse the box, unwrap a trajectory that crossed a face mid-run."""
    pid = "1a62_A"
    d = tmp_path / pid
    d.mkdir()
    (d / f"{pid}_state_npt100000.0.xml").write_text(_state_xml(2.6))
    box = pbc.box_from_release_dir(str(tmp_path), pid)
    np.testing.assert_allclose(box, [26.0] * 3)

    # true trajectory drifts +0.9 A/frame along x; wrap frames 4+ back by
    # one box length (a face crossing the mean-jump detector must undo)
    rng = np.random.default_rng(0)
    base = rng.normal(size=(1, 8, 3)) * 2.0
    drift = np.zeros((6, 1, 3))
    drift[:, 0, 0] = np.arange(6) * 0.9
    true = base + drift
    wrapped = true.copy()
    wrapped[4:, :, 0] -= box[0]
    un = pbc.unwrap_trajectory(wrapped, box)
    np.testing.assert_allclose(un, true, atol=1e-9)

    with pytest.raises(FileNotFoundError, match="box_size explicitly"):
        pbc.box_from_release_dir(str(tmp_path), "2xyz_B")


def test_read_pdb_insertion_codes_altloc_mse(tmp_path):
    """100/100A are distinct residues; only the first altLoc conformer is
    kept; HETATM MSE parses as MET with SE->SD."""

    def rec(kind, serial, name, altloc, res3, resseq, icode, x, y, z):
        pad_name = f" {name:<3s}" if len(name) < 4 else name
        return (
            f"{kind:<6s}{serial:5d} {pad_name}{altloc}{res3:>3s} A"
            f"{resseq:4d}{icode}   {x:8.3f}{y:8.3f}{z:8.3f}  1.00  0.00"
            f"          {name[0]:>2s}"
        )

    lines = [
        # residue (A, 100, ' ') = GLY
        rec("ATOM", 1, "N", " ", "GLY", 100, " ", 1.0, 0.0, 0.0),
        rec("ATOM", 2, "CA", " ", "GLY", 100, " ", 2.0, 0.0, 0.0),
        # residue (A, 100, 'A') = ALA with two CA conformers (A then B)
        rec("ATOM", 3, "N", " ", "ALA", 100, "A", 5.0, 0.0, 0.0),
        rec("ATOM", 4, "CA", "A", "ALA", 100, "A", 6.0, 0.0, 0.0),
        rec("ATOM", 5, "CA", "B", "ALA", 100, "A", 9.0, 9.0, 9.0),
        # selenomethionine as HETATM
        rec("HETATM", 6, "N", " ", "MSE", 101, " ", 10.0, 0.0, 0.0),
        rec("HETATM", 7, "CA", " ", "MSE", 101, " ", 11.0, 0.0, 0.0),
        rec("HETATM", 8, "SE", " ", "MSE", 101, " ", 12.0, 0.0, 0.0),
        "END",
    ]
    pdb = tmp_path / "icode.pdb"
    pdb.write_text("\n".join(lines) + "\n")
    atom37, mask, aatype, residx = read_pdb(str(pdb))
    assert len(aatype) == 3  # GLY, ALA(100A), MSE->MET — not merged
    assert aatype[0] == chem.RESTYPE_ORDER["G"]
    assert aatype[1] == chem.RESTYPE_ORDER["A"]
    assert aatype[2] == chem.RESTYPE_ORDER["M"]
    np.testing.assert_allclose(atom37[1, 1], [6.0, 0.0, 0.0])  # altLoc A wins
    sd_idx = chem.ATOM_ORDER["SD"]
    assert mask[2, sd_idx] == 1.0
    np.testing.assert_allclose(atom37[2, sd_idx], [12.0, 0.0, 0.0])
    assert residx.tolist() == [100, 100, 101]


def test_read_pdb_b_only_altloc_kept(tmp_path):
    """Atoms whose ONLY deposited conformer is labelled 'B' must not be
    dropped: 'first altLoc wins' means first-seen per (residue, atom),
    not a ' '/'A' whitelist (review finding — conformer-A-pruned files
    and occupancy-sorted deposits label the survivor 'B')."""

    def rec(serial, name, altloc, res3, resseq, x):
        pad_name = f" {name:<3s}" if len(name) < 4 else name
        return (
            f"{'ATOM':<6s}{serial:5d} {pad_name}{altloc}{res3:>3s} A"
            f"{resseq:4d}    {x:8.3f}{0.0:8.3f}{0.0:8.3f}  1.00  0.00"
            f"          {name[0]:>2s}"
        )

    lines = [
        rec(1, "N", "B", "ALA", 1, 1.0),
        rec(2, "CA", "B", "ALA", 1, 2.0),
        rec(3, "CA", "C", "ALA", 1, 9.0),  # later conformer still loses
        "END",
    ]
    pdb = tmp_path / "bonly.pdb"
    pdb.write_text("\n".join(lines) + "\n")
    atom37, mask, aatype, residx = read_pdb(str(pdb))
    assert len(aatype) == 1
    ca = chem.ATOM_ORDER["CA"]
    n = chem.ATOM_ORDER["N"]
    assert mask[0, n] == 1.0 and mask[0, ca] == 1.0
    np.testing.assert_allclose(atom37[0, ca], [2.0, 0.0, 0.0])
