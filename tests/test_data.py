import os

import numpy as np
import pytest

from dynamicpdb_tpu.config import DataConfig, FilteringConfig
from dynamicpdb_tpu.data.dataset import (
    EpochSampler,
    TrajectoryDataset,
    batch_iterator,
    eval_windows,
    pad_window,
)
from dynamicpdb_tpu.data.synthetic import make_trajectory_npz, make_window


@pytest.fixture(scope="module")
def csv_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    rows = ["name,atlas_npz,seq_len"]
    for i, n_res in enumerate([12, 16, 300]):
        p = d / f"prot{i}.npz"
        make_trajectory_npz(p, n_res=n_res, n_frames=20, seed=i)
        rows.append(f"prot{i},{p},{n_res}")
    csv = d / "manifest.csv"
    csv.write_text("\n".join(rows) + "\n")
    return str(csv)


def _cfg(csv, frame_time=2, frame_sample_step=3, **kw):
    return DataConfig(
        csv_path=csv, val_csv_path=csv, test_csv_path=csv,
        frame_time=frame_time, frame_sample_step=frame_sample_step,
        keep_first=None, fix_sample_start=5, **kw,
    )


def test_length_filter(csv_dir):
    ds = TrajectoryDataset(_cfg(csv_dir), split="train")
    assert len(ds) == 2  # 300-residue protein filtered at max_len=256


def test_window_shapes_and_stride(csv_dir):
    ds = TrajectoryDataset(_cfg(csv_dir), split="train")
    w = ds.get_window(0, np.random.default_rng(0))
    assert w["atom37"].shape == (2, 12, 37, 3)
    assert w["force"].shape == (2, 12, 3)
    assert w["edge_repr"].shape == (12, 12, 128)
    assert w["aatype"].dtype == np.int32


def test_eval_window_fixed_start(csv_dir):
    ds = TrajectoryDataset(_cfg(csv_dir), split="val")
    w1 = ds.get_window(0, np.random.default_rng(0))
    w2 = ds.get_window(0, np.random.default_rng(99))
    np.testing.assert_array_equal(w1["atom37"], w2["atom37"])


def test_train_window_random_start(csv_dir):
    ds = TrajectoryDataset(_cfg(csv_dir), split="train")
    starts = set()
    for s in range(20):
        w = ds.get_window(0, np.random.default_rng(s))
        starts.add(float(w["atom37"][0].sum()))
    assert len(starts) > 3


def test_padding(csv_dir):
    ds = TrajectoryDataset(_cfg(csv_dir), split="train", pad_to=32)
    w0 = ds.get_window(0, np.random.default_rng(0))  # 12 res
    w1 = ds.get_window(1, np.random.default_rng(0))  # 16 res
    for w, n in ((w0, 12), (w1, 16)):
        assert w["atom37"].shape == (2, 32, 37, 3)
        assert w["edge_repr"].shape == (32, 32, 128)
        # padded residues masked out
        assert w["atom37_mask"][n:].sum() == 0


def test_epoch_sampler_determinism_and_striding():
    s0 = EpochSampler(n_items=5, batch_size=4, seed=7, num_hosts=2, host_index=0)
    s1 = EpochSampler(n_items=5, batch_size=4, seed=7, num_hosts=2, host_index=1)
    a0, a1 = s0.epoch_indices(2), s1.epoch_indices(2)
    # same epoch -> reproducible
    np.testing.assert_array_equal(a0, s0.epoch_indices(2))
    # different epochs shuffle differently
    assert not np.array_equal(a0, s0.epoch_indices(3))
    # hosts see disjoint interleaved strides of one global sequence
    assert len(a0) == len(a1)
    full = np.empty(len(a0) + len(a1), dtype=a0.dtype)
    full[0::2], full[1::2] = a0, a1
    counts = np.bincount(full, minlength=5)
    assert counts.min() >= 4  # every item repeated ~batch_size times


def test_epoch_sampler_local_batches_are_single_protein():
    """Per-host local batches must hold copies of ONE protein (round-3
    review: striding after repetition used to mix num_hosts proteins into
    each local batch and pay global-batch I/O on every host)."""
    import pytest as _pytest

    B, H = 4, 2
    for h in range(H):
        s = EpochSampler(n_items=5, batch_size=B, seed=3, num_hosts=H,
                         host_index=h)
        idx = s.epoch_indices(0)
        local = s.local_batch_size
        assert local == B // H
        for i in range(0, len(idx) - local + 1, local):
            chunk = idx[i:i + local]
            assert len(set(chunk.tolist())) == 1, (h, i, chunk)
    with _pytest.raises(ValueError, match="divide evenly"):
        EpochSampler(n_items=5, batch_size=3, seed=0, num_hosts=2)


def test_read_clusters_reference_format(tmp_path):
    """Cluster-file parse mirrors TrainSampler._read_clusters
    (Dfold_data_loader_dynamic.py:409-416): line i = cluster i,
    space-separated chain ids, PDB id = pre-'_' part, uppercased."""
    from dynamicpdb_tpu.data.dataset import assign_clusters, read_clusters

    p = tmp_path / "clusters.txt"
    p.write_text("1abc_A 1abd_B 2xyz_A\n3foo_A\n4bar_A 4baz_C\n")
    table = read_clusters(str(p))
    assert table == {"1ABC": 0, "1ABD": 0, "2XYZ": 0,
                     "3FOO": 1, "4BAR": 2, "4BAZ": 2}
    # lookup strips '.'-suffixes and uppercases; unknown names get NEW
    # singleton clusters (the reference's missing_pdbs path, :395-400)
    got = assign_clusters(
        ["1abc.pdb", "3foo", "9zzz", "8yyy", "9zzz"], table
    )
    np.testing.assert_array_equal(got, [0, 1, 3, 4, 3])


def _mode_sampler(mode, n_items=6, batch_size=4, **kw):
    lengths = np.array([12, 16, 12, 16, 12, 20])[:n_items]
    clusters = np.array([0, 0, 1, 1, 2, 2])[:n_items]
    return EpochSampler(
        n_items=n_items, batch_size=batch_size, seed=5,
        sample_mode=mode, lengths=lengths, clusters=clusters, **kw,
    )


def test_length_batch_mode():
    """Every batch holds batch_size proteins of ONE length, groups in
    ascending-length order; draws are epoch-seeded with replacement."""
    s = _mode_sampler("length_batch")
    lengths = np.asarray(s.lengths)
    idx = s.epoch_indices(0)
    assert len(idx) == 3 * 4  # one batch per distinct length
    batch_lengths = lengths[idx].reshape(3, 4)
    assert (batch_lengths == batch_lengths[:, :1]).all()
    np.testing.assert_array_equal(batch_lengths[:, 0], [12, 16, 20])
    np.testing.assert_array_equal(idx, s.epoch_indices(0))  # deterministic
    assert not np.array_equal(idx, s.epoch_indices(1))


def test_cluster_time_batch_mode():
    """One epoch-random representative per cluster, repeated batch_size
    times (batch = diffusion draws of one protein), cluster order kept."""
    s = _mode_sampler("cluster_time_batch")
    clusters = np.asarray(s.clusters)
    reps_seen = set()
    for epoch in range(6):
        idx = s.epoch_indices(epoch)
        assert len(idx) == 3 * 4  # one batch per cluster
        batches = idx.reshape(3, 4)
        # each batch = one protein; one batch per cluster, in cluster order
        assert (batches == batches[:, :1]).all()
        np.testing.assert_array_equal(clusters[batches[:, 0]], [0, 1, 2])
        reps_seen.update(batches[:, 0].tolist())
    assert len(reps_seen) > 3  # representatives vary across epochs


def test_cluster_length_batch_mode():
    s = _mode_sampler("cluster_length_batch")
    lengths, clusters = np.asarray(s.lengths), np.asarray(s.clusters)
    idx = s.epoch_indices(0)
    batches = idx.reshape(-1, 4)
    for b in batches:
        assert len(set(lengths[b].tolist())) == 1  # same-length batches
    # only one representative per cluster can appear in the whole epoch
    for c in np.unique(clusters):
        assert len(set(idx[clusters[idx] == c].tolist())) <= 1


def test_mode_sampler_host_striding():
    """Host-strided streams of every mode interleave back into the global
    stream (each host takes batch_size/num_hosts rows of every batch)."""
    for mode in ("length_batch", "cluster_time_batch",
                 "cluster_length_batch"):
        full = _mode_sampler(mode).epoch_indices(4)
        a0 = _mode_sampler(mode, num_hosts=2, host_index=0).epoch_indices(4)
        a1 = _mode_sampler(mode, num_hosts=2, host_index=1).epoch_indices(4)
        inter = np.empty(len(a0) + len(a1), dtype=a0.dtype)
        inter[0::2], inter[1::2] = a0, a1
        np.testing.assert_array_equal(inter, full, err_msg=mode)


def test_sampler_mode_validation():
    with pytest.raises(ValueError, match="invalid sample_mode"):
        EpochSampler(n_items=3, batch_size=2, sample_mode="bogus")
    with pytest.raises(ValueError, match="lengths"):
        EpochSampler(n_items=3, batch_size=2, sample_mode="length_batch")
    with pytest.raises(ValueError, match="clusters"):
        EpochSampler(n_items=3, batch_size=2,
                     sample_mode="cluster_time_batch")


def test_make_sampler_end_to_end(csv_dir, tmp_path):
    """cluster_time_batch through the real manifest + batch_iterator."""
    from dynamicpdb_tpu.data.dataset import make_sampler

    cluster_file = tmp_path / "clusters.txt"
    cluster_file.write_text("prot0_A prot1_A\n")  # both train rows: 1 cluster
    cfg = _cfg(csv_dir, sample_mode="cluster_time_batch",
               cluster_path=str(cluster_file))
    ds = TrajectoryDataset(cfg, split="train", pad_to=16)
    sampler = make_sampler(ds, cfg, batch_size=2, seed=0)
    batches = list(batch_iterator(ds, sampler, epoch=0))
    assert len(batches) == 1  # ONE cluster -> one batch per epoch
    assert batches[0]["atom37"].shape == (2, 2, 16, 37, 3)
    # representative varies with epoch (epoch-seeded choice of member)
    picks = {
        int(sampler.epoch_indices(e)[0]) for e in range(8)
    }
    assert picks == {0, 1}


def test_batch_iterator(csv_dir):
    ds = TrajectoryDataset(_cfg(csv_dir), split="train", pad_to=16)
    sampler = EpochSampler(n_items=len(ds), batch_size=2, seed=0)
    batches = list(batch_iterator(ds, sampler, epoch=0))
    assert len(batches) == 2
    for b in batches:
        assert b["atom37"].shape == (2, 2, 16, 37, 3)
        assert "name" not in b


def test_eval_windows(csv_dir):
    ds = TrajectoryDataset(_cfg(csv_dir), split="test")
    ws = list(eval_windows(ds))
    assert len(ws) == 2
    assert ws[0]["name"] == "prot0"


def test_device_prefetcher():
    import jax
    import jax.numpy as jnp

    from dynamicpdb_tpu.data.prefetch import prefetch_to_device

    src = ({"x": np.full((2, 2), i, np.float32)} for i in range(5))
    out = list(prefetch_to_device(src, buffer_size=2))
    assert len(out) == 5
    assert isinstance(out[0]["x"], jax.Array)
    np.testing.assert_allclose(np.asarray(out[3]["x"]), 3.0)


def test_device_prefetcher_propagates_errors():
    from dynamicpdb_tpu.data.prefetch import prefetch_to_device

    def bad():
        yield {"x": np.ones(2, np.float32)}
        raise RuntimeError("loader exploded")

    it = iter(prefetch_to_device(bad()))
    next(it)
    with pytest.raises(RuntimeError, match="loader exploded"):
        list(it)


def test_static_pdb_dataset(tmp_path):
    from dynamicpdb_tpu.analysis.pdb_io import write_pdb
    from dynamicpdb_tpu.data.dataset import StaticPdbDataset
    from dynamicpdb_tpu.data.synthetic import make_window

    w = make_window(n_res=9, frame_time=1, seed=8)
    p = str(tmp_path / "x.pdb")
    write_pdb(p, w["atom37"][0], w["aatype"], w["atom37_mask"])
    ds = StaticPdbDataset([p], frame_time=3, pad_to=12)
    raw = ds.get_window(0)
    assert raw["atom37"].shape == (3, 12, 37, 3)
    assert raw["name"] == "x"
    # static: all frames identical
    np.testing.assert_array_equal(raw["atom37"][0], raw["atom37"][2])
    # featurizes cleanly
    import jax
    import jax.numpy as jnp

    from dynamicpdb_tpu.data.featurize import featurize_window

    raw.pop("name")
    feats = featurize_window(jax.tree_util.tree_map(jnp.asarray, raw))
    assert feats["rigids_0"].shape == (3, 12, 7)


def test_reference_multifile_layout_interop(tmp_path):
    """Artifacts written in the reference's on-disk layout ({pid}_new_w_pp.npz
    + {pid}_F_Ca.pkl/_V_ca.pkl + embed npz, README.md:184-211) load through
    TrajectoryDataset exactly like reference-produced data."""
    from dynamicpdb_tpu.analysis.pdb_io import write_pdb
    from dynamicpdb_tpu.chem import constants as chem
    from dynamicpdb_tpu.data.dataset import TrajectoryDataset
    from dynamicpdb_tpu.data.synthetic import make_window
    from dynamicpdb_tpu.preprocess.embeddings import zero_embeddings
    from dynamicpdb_tpu.preprocess.pack import pack_reference_layout

    w = make_window(n_res=7, frame_time=1, seed=9)
    topo = str(tmp_path / "topo.pdb")
    write_pdb(topo, w["atom37"][0], w["aatype"], w["atom37_mask"])

    names, resseq, coords = [], [], []
    for i in range(7):
        for a in range(37):
            if w["atom37_mask"][i, a]:
                names.append(chem.ATOM37_NAMES[a])
                resseq.append(i + 1)
                coords.append(w["atom37"][0, i, a])
    full = np.tile(np.asarray(coords)[None], (6, 1, 1))
    forces = np.random.default_rng(0).normal(size=full.shape)
    vels = np.random.default_rng(1).normal(size=full.shape)

    paths = pack_reference_layout(
        str(tmp_path), "prot", topo, full, names, np.asarray(resseq),
        forces=forces, velocities=vels,
    )
    embed = tmp_path / "prot_embed.npz"
    np.savez(embed, **zero_embeddings(7))

    csv = tmp_path / "m.csv"
    csv.write_text(
        "name,atlas_npz,force_path,vel_path,embed_path,seq_len\n"
        f"prot,{paths['atlas_npz']},{paths['force_path']},"
        f"{paths['vel_path']},{embed},7\n"
    )
    ds = TrajectoryDataset(
        _cfg(str(csv), frame_time=2, frame_sample_step=1), split="train"
    )
    raw = ds.get_window(0, np.random.default_rng(0))
    assert raw["atom37"].shape == (2, 7, 37, 3)
    assert raw["force"].shape == (2, 7, 3)
    assert raw["node_repr"].shape == (7, 256)
    np.testing.assert_allclose(raw["atom37"][0], w["atom37"][0], atol=2e-3)


def test_device_prefetcher_close_unblocks_worker():
    """Abandoning the iterator mid-epoch must not leave the worker thread
    blocked in q.put pinning device batches (round-3 review finding)."""
    import itertools
    import time as _time

    from dynamicpdb_tpu.data.prefetch import prefetch_to_device

    src = ({"x": np.full((4,), i)} for i in itertools.count())  # infinite
    pf = prefetch_to_device(src, buffer_size=2)
    it = iter(pf)
    next(it)  # consume one; worker now blocked on a full queue
    pf.close()
    assert not pf._thread.is_alive()

    # context-manager form + early break
    with prefetch_to_device(
        ({"x": np.full((4,), i)} for i in itertools.count()), buffer_size=2
    ) as pf2:
        for i, b in enumerate(pf2):
            if i == 1:
                break
    deadline = _time.time() + 5
    while pf2._thread.is_alive() and _time.time() < deadline:
        _time.sleep(0.05)
    assert not pf2._thread.is_alive()


def test_device_prefetcher_sentinel_survives_full_buffer():
    """A producer that fills the buffer and finishes BEFORE the consumer
    takes its first batch must still deliver the end-of-iteration sentinel.
    The old put_nowait dropped it on queue.Full, deadlocking the consumer
    in q.get() (hit deterministically once the train step came out of the
    persistent compile cache faster than the producer)."""
    import threading
    import time

    from dynamicpdb_tpu.data.prefetch import prefetch_to_device

    src = iter([np.zeros(3), np.ones(3)])
    pf = prefetch_to_device(src, buffer_size=1, place=lambda x: x)
    time.sleep(0.5)  # producer fills the 1-slot buffer and ends
    out = []
    t = threading.Thread(target=lambda: out.extend(list(pf)), daemon=True)
    t.start()
    t.join(timeout=10)
    assert not t.is_alive(), "consumer deadlocked waiting for the sentinel"
    assert len(out) == 2
    pf.close()
