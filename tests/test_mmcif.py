"""mmCIF ingestion: write/parse roundtrip, reference-style filters, and the
mmCIF -> training-window path (VERDICT r1 item 8; reference
process_pdb_dataset.py:26-140 semantics)."""
import numpy as np

from dynamicpdb_tpu.data.dataset import StaticPdbDataset
from dynamicpdb_tpu.data.synthetic import make_window
from dynamicpdb_tpu.preprocess.mmcif import (
    parse_mmcif,
    process_mmcif_dir,
    write_mmcif,
)


def _write_case(tmp_path, name="1abc", n_res=12, resolution=2.1, seed=0):
    w = make_window(n_res=n_res, frame_time=1, seed=seed)
    path = str(tmp_path / f"{name}.cif")
    write_mmcif(path, w["atom37"][0], w["atom37_mask"], w["aatype"],
                resolution=resolution)
    return path, w


def test_roundtrip(tmp_path):
    path, w = _write_case(tmp_path)
    obj = parse_mmcif(path)
    assert obj.resolution == 2.1
    assert list(obj.chains) == ["A"]
    ch = obj.chains["A"]
    np.testing.assert_array_equal(ch.aatype, w["aatype"])
    np.testing.assert_array_equal(ch.atom37_mask, w["atom37_mask"])
    np.testing.assert_allclose(
        ch.atom37, w["atom37"][0] * w["atom37_mask"][..., None], atol=1e-3
    )
    np.testing.assert_array_equal(ch.residue_index, np.arange(1, 13))


def test_quoted_tokens_and_altloc():
    from dynamicpdb_tpu.preprocess.mmcif import _tokenize

    assert _tokenize("ATOM 'CA' \"C 1\" x") == ["ATOM", "CA", "C 1", "x"]


def test_process_dir_filters(tmp_path):
    # good file
    _write_case(tmp_path, "good", n_res=10, resolution=2.0, seed=1)
    # too low resolution
    _write_case(tmp_path, "blurry", n_res=10, resolution=9.0, seed=2)
    # too long
    _write_case(tmp_path, "long", n_res=40, resolution=2.0, seed=3)
    rows = process_mmcif_dir(
        str(tmp_path), str(tmp_path / "out"),
        max_resolution=5.0, max_len=20, min_file_size=10,
    )
    names = sorted(r["name"] for r in rows)
    assert names == ["good_A"]
    assert rows[0]["seq_len"] == 10


def test_mmcif_to_training_window(tmp_path):
    """mmCIF -> processed npz -> StaticPdbDataset -> featurized window."""
    import jax.numpy as jnp

    from dynamicpdb_tpu.data.featurize import featurize_window

    _write_case(tmp_path, "prot", n_res=10, resolution=1.5, seed=4)
    rows = process_mmcif_dir(
        str(tmp_path), str(tmp_path / "out"), min_file_size=10
    )
    ds = StaticPdbDataset([rows[0]["npz_path"]], frame_time=2, pad_to=16)
    raw = ds.get_window(0)
    raw.pop("name")
    feats = featurize_window({k: jnp.asarray(v) for k, v in raw.items()})
    assert feats["rigids_0"].shape == (2, 16, 7)
    assert float(jnp.sum(feats["res_mask"][0])) == 10.0
    # direct .cif consumption too
    ds2 = StaticPdbDataset([str(tmp_path / "prot.cif")], frame_time=2)
    raw2 = ds2.get_window(0)
    np.testing.assert_allclose(raw2["atom37"][0], raw["atom37"][0][:10],
                               atol=1e-4)
