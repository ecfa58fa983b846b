"""Release MD-state ingestion: OpenMM StateDataReporter .dat tables
({pid}_npt_sim.dat / equilibration logs, reference README.md:52-58) and
the segmented tenth-of-trajectory layout (README.md:120-140). The
reference documents these files but ships no reader; these tests pin our
parser's contract. Pure numpy — fast tier."""
import numpy as np
import pytest

from dynamicpdb_tpu.preprocess.energies import (
    energy_summary,
    read_statedata,
    read_statedata_segments,
)

HEADER = (
    '#"Step","Potential Energy (kJ/mole)","Kinetic Energy (kJ/mole)",'
    '"Total Energy (kJ/mole)","Temperature (K)","Box Volume (nm^3)",'
    '"Density (g/mL)"\n'
)


def _write_dat(path, rows):
    with open(path, "w") as f:
        f.write(HEADER)
        for r in rows:
            f.write(",".join(str(x) for x in r) + "\n")


def test_read_statedata_canonical_columns(tmp_path):
    p = tmp_path / "1abc_A_npt_sim.dat"
    _write_dat(p, [
        [1000, -169985.5, 35963.4, -134022.1, 297.8, 244.4, 1.017],
        [2000, -169441.2, 36210.0, -133231.2, 299.9, 244.6, 1.016],
    ])
    t = read_statedata(str(p))
    assert list(t["columns"])[0] == "Step"
    np.testing.assert_allclose(t["step"], [1000, 2000])
    np.testing.assert_allclose(t["potential_kj_mol"], [-169985.5, -169441.2])
    np.testing.assert_allclose(t["kinetic_kj_mol"], [35963.4, 36210.0])
    np.testing.assert_allclose(t["total_kj_mol"], [-134022.1, -133231.2])
    np.testing.assert_allclose(t["temperature_k"], [297.8, 299.9])
    np.testing.assert_allclose(t["box_volume_nm3"], [244.4, 244.6])
    np.testing.assert_allclose(t["density_g_ml"], [1.017, 1.016])


def test_read_statedata_whitespace_and_bare_header(tmp_path):
    p = tmp_path / "equi.dat"
    p.write_text("# Step Temperature\n10 300.5\n20 301.0\n")
    t = read_statedata(str(p))
    np.testing.assert_allclose(t["temperature_k"], [300.5, 301.0])


def test_read_statedata_unknown_column_sanitized(tmp_path):
    p = tmp_path / "x.dat"
    p.write_text('#"Step","Speed (ns/day)"\n1,42.5\n')
    t = read_statedata(str(p))
    np.testing.assert_allclose(t["speed_ns_day"], [42.5])


def test_read_statedata_empty_table_and_errors(tmp_path):
    p = tmp_path / "empty.dat"
    p.write_text(HEADER)
    t = read_statedata(str(p))
    assert t["step"].shape == (0,)

    bad = tmp_path / "ragged.dat"
    bad.write_text(HEADER + "1,2\n")
    with pytest.raises(ValueError, match="cells"):
        read_statedata(str(bad))

    nonnum = tmp_path / "nonnum.dat"
    nonnum.write_text('#"Step","T"\n1,abc\n')
    with pytest.raises(ValueError, match="non-numeric"):
        read_statedata(str(nonnum))

    noheader = tmp_path / "nohdr.dat"
    noheader.write_text("1,2,3\n")
    with pytest.raises(ValueError, match="header"):
        read_statedata(str(noheader))


def test_segments_concatenate_in_numeric_order(tmp_path):
    d = tmp_path / "1abc_A_npt_sim_data"
    d.mkdir()
    # write out of lexicographic order: _10 must follow _9, not _1
    for i in (10, 0, 9, 2):
        _write_dat(d / f"1abc_A_npt_sim_{i}.dat",
                   [[i, -1.0 * i, 1.0, -1.0, 300.0, 244.0, 1.0]])
    t = read_statedata_segments(str(d), "1abc_A_npt_sim")
    np.testing.assert_allclose(t["step"], [0, 2, 9, 10])
    np.testing.assert_allclose(t["potential_kj_mol"], [0, -2, -9, -10])


def test_segments_column_mismatch_rejected(tmp_path):
    d = tmp_path / "seg"
    d.mkdir()
    _write_dat(d / "p_0.dat", [[1, -1, 1, -1, 300, 244, 1.0]])
    (d / "p_1.dat").write_text('#"Step","T"\n2,300\n')
    with pytest.raises(ValueError, match="column set"):
        read_statedata_segments(str(d), "p")


def test_energy_summary(tmp_path):
    p = tmp_path / "s.dat"
    _write_dat(p, [[1, -10.0, 1, -9, 300, 244, 1.0],
                   [2, -20.0, 1, -19, 302, 244, 1.0]])
    s = energy_summary(read_statedata(str(p)))
    assert s["potential_kj_mol_mean"] == -15.0
    assert s["potential_kj_mol_min"] == -20.0
    assert s["temperature_k_max"] == 302.0


def test_cli_summary_and_npz(tmp_path, capsys):
    from dynamicpdb_tpu.preprocess.energies import main

    d = tmp_path / "1abc_A_npt_sim_data"
    d.mkdir()
    for i in range(2):
        _write_dat(d / f"1abc_A_npt_sim_{i}.dat",
                   [[i, -1.0, 1.0, 0.0, 300.0, 244.0, 1.0]])
    out = tmp_path / "e.npz"
    assert main([str(d), "--out", str(out)]) == 0
    assert "2 rows" in capsys.readouterr().out
    with np.load(out, allow_pickle=True) as z:
        np.testing.assert_allclose(z["step"], [0, 1])


def test_pack_release_segmented_pkls(tmp_path):
    """pack_from_dynamicpdb_release consumes the segmented {pid}_T/ dirs
    when the combined pickle is absent (README.md:120-140)."""
    import pickle

    from dynamicpdb_tpu.analysis.pdb_io import write_pdb
    from dynamicpdb_tpu.chem import constants as chem
    from dynamicpdb_tpu.data.synthetic import make_window
    from dynamicpdb_tpu.preprocess.pack import (
        load_segmented_pkl,
        pack_from_dynamicpdb_release,
    )

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
    frame = np.asarray(coords)
    for kind, scale in (("T", 1.0), ("F", 0.1), ("V", 0.2)):
        seg = tmp_path / f"{pid}_{kind}"
        seg.mkdir()
        for i in range(3):  # 3 segments x 2 frames
            arr = np.tile(frame[None], (2, 1, 1)) * scale + i
            with open(seg / f"{pid}_{kind}_{i}.pkl", "wb") as f:
                pickle.dump(arr, f)
    # helper itself: order + shape
    t = load_segmented_pkl(str(tmp_path), pid, "T")
    assert t.shape == (6, frame.shape[0], 3)
    assert load_segmented_pkl(str(tmp_path), pid, "X") is None

    out = pack_from_dynamicpdb_release(
        str(tmp_path / "bundle.npz"), str(tmp_path), pid
    )
    with np.load(out) as z:
        assert z["all_atom_positions"].shape == (6, 5, 37, 3)
        assert z["force"].shape == (6, 5, 3)
