"""Trajectory dataset: CSV manifest -> windowed raw training examples.

Host-side replacement for the reference PdbDataset + samplers
(/root/reference/src/data/Dfold_data_loader_dynamic.py:102-528) with the
heavy featurization moved on-device (data/featurize.py). The host only:
  * reads the CSV manifest (columns: name, seqres, atlas_npz, embed_path,
    force_path, vel_path, pdb_path, seq_len — README.md:205-211);
  * mmaps the trajectory npz and selects an F-frame window at stride k
    (random start over frames[:keep_first] when training, fixed
    fix_sample_start at eval — loader :165-218);
  * loads the C-alpha force/vel pickles and the OmegaFold embedding npz;
  * optionally pads the residue axis to a fixed size so every batch has one
    static shape (ONE XLA compilation across proteins — a TPU must-have the
    torch reference does not need).

Also accepts the single-bundle npz layout written by
data/synthetic.make_trajectory_npz (keys: all_atom_positions, force, vel,
node_repr, edge_repr, ...) so tests/benchmarks run with no external data.
"""
from __future__ import annotations

import logging
import os
import pickle
from dataclasses import dataclass

import numpy as np

from dynamicpdb_tpu.config import DataConfig

log = logging.getLogger(__name__)


def _load_force_vel(path: str, suffix: str) -> np.ndarray:
    """Reference quirk preserved: force uses '_Ca.pkl', velocity '_ca.pkl'
    (loader :195-198)."""
    real = path.replace(".pkl", suffix)
    with open(real, "rb") as f:
        return pickle.load(f)


def pad_window(raw: dict, pad_to: int) -> dict:
    """Zero-pad the residue axis to pad_to (masks keep semantics)."""
    n = raw["aatype"].shape[0]
    if n == pad_to:
        return raw
    if n > pad_to:
        # returning the window unpadded would silently break the
        # static-shape invariant pad_to exists for (second XLA compile, or
        # np.stack crash against padded batch mates)
        raise ValueError(
            f"window has {n} residues > pad_to={pad_to}; raise pad_to or "
            f"filter by seq_len (data.filtering.max_len)"
        )
    p = pad_to - n

    def pad(x, axes):
        widths = [(0, 0)] * x.ndim
        for ax in axes:
            widths[ax] = (0, p)
        return np.pad(x, widths)

    out = dict(raw)
    out["atom37"] = pad(raw["atom37"], [1])
    out["atom37_mask"] = pad(raw["atom37_mask"], [0])
    out["aatype"] = pad(raw["aatype"], [0])
    out["residue_index"] = pad(raw["residue_index"], [0])
    out["force"] = pad(raw["force"], [1])
    out["vel"] = pad(raw["vel"], [1])
    out["node_repr"] = pad(raw["node_repr"], [0])
    out["edge_repr"] = pad(raw["edge_repr"], [0, 1])
    return out


class TrajectoryDataset:
    """Index-addressable set of proteins; __call__ draws one window."""

    def __init__(self, cfg: DataConfig, *, split: str = "train",
                 pad_to: int | None = None):
        import pandas as pd

        self.cfg = cfg
        self.split = split
        self.pad_to = pad_to
        csv_path = {
            "train": cfg.csv_path,
            "val": cfg.val_csv_path or cfg.csv_path,
            "test": cfg.test_csv_path or cfg.val_csv_path or cfg.csv_path,
        }[split]
        df = pd.read_csv(csv_path)
        if "seq_len" in df:
            df = df[df.seq_len <= cfg.filtering.max_len]
        self.df = df.reset_index(drop=True)
        log.info("%s dataset: %d proteins from %s", split, len(self.df), csv_path)

    def __len__(self):
        return len(self.df)

    # -- window extraction ----------------------------------------------------
    def _select_window(self, n_frames: int, rng: np.random.Generator):
        F, k = self.cfg.frame_time, self.cfg.frame_sample_step
        if n_frames < F * k:
            # eval used to clamp silently and yield FEWER than F frames —
            # a shape mismatch against the compiled step downstream
            raise ValueError(
                f"trajectory too short: {n_frames} frames for window "
                f"F={F} stride={k}"
            )
        if self.split == "train":
            limit = min(n_frames, self.cfg.keep_first or n_frames)
            hi = limit - F * k + 1
            if hi < 1:
                raise ValueError(
                    f"trajectory too short: keep_first="
                    f"{self.cfg.keep_first} frames for window F={F} "
                    f"stride={k}"
                )
            start = int(rng.integers(0, hi))
        else:
            start = self.cfg.fix_sample_start or 0
            if start + F * k > n_frames:
                start = max(0, n_frames - F * k)
        return slice(start, start + F * k, k)

    def _load_bundle(self, path: str):
        """Load a trajectory bundle with a tiny LRU cache.

        np.load(mmap_mode='r') is silently IGNORED for members of a .npz
        (compressed members cannot be mmapped), so every access decompresses
        the full trajectory array. batch_iterator draws the SAME protein
        batch_size times per batch, which would redo that decompression B
        times; caching the last two opened bundles (keys -> ndarray) makes
        the repeats free. True mmap requires per-key .npy files
        (preprocess/pack.py can emit them), same as the reference, whose
        mmap_mode on npz has the identical silent no-op.
        """
        cache = getattr(self, "_bundle_cache", None)
        if cache is None:
            cache = self._bundle_cache = {}
        if path not in cache:
            if len(cache) >= 2:  # keep at most 2 decompressed trajectories
                cache.pop(next(iter(cache)))
            with np.load(path, allow_pickle=True) as z:
                cache[path] = {k: z[k] for k in z.files}
        else:
            cache[path] = cache.pop(path)  # mark most-recently-used
        return cache[path]

    def get_window(self, idx: int, rng: np.random.Generator) -> dict:
        row = self.df.iloc[idx]
        bundle = self._load_bundle(row["atlas_npz"])
        positions = bundle["all_atom_positions"]
        sel = self._select_window(positions.shape[0], rng)

        if "force" in bundle:
            force, vel = bundle["force"], bundle["vel"]
        else:
            force = _load_force_vel(row["force_path"], "_Ca.pkl")
            vel = _load_force_vel(row["vel_path"], "_ca.pkl")

        if "node_repr" in bundle:
            node_repr, edge_repr = bundle["node_repr"], bundle["edge_repr"]
        else:
            embed = np.load(row["embed_path"])
            node_repr, edge_repr = embed["node_repr"], embed["edge_repr"]

        aatype = bundle["aatype"]
        if aatype.ndim == 2:  # one-hot (reference layout)
            aatype = np.argmax(aatype, axis=-1)

        mask = np.asarray(bundle["all_atom_mask"], np.float32)
        atom37 = np.asarray(positions[sel], np.float32) * mask[None, ..., None]

        raw = {
            "name": str(row.get("name", f"idx{idx}")),
            "atom37": atom37,
            "atom37_mask": mask,
            "aatype": np.asarray(aatype, np.int32),
            "residue_index": np.asarray(bundle["residue_index"], np.int32),
            "force": np.asarray(force[sel], np.float32),
            "vel": np.asarray(vel[sel], np.float32),
            "node_repr": np.asarray(node_repr, np.float32),
            "edge_repr": np.asarray(edge_repr, np.float32),
        }
        if self.pad_to:
            name = raw.pop("name")
            raw = pad_window(raw, self.pad_to)
            raw["name"] = name
        return raw


def read_clusters(path: str) -> dict[str, int]:
    """Parse the reference's cluster-file format (TrainSampler._read_clusters,
    Dfold_data_loader_dynamic.py:409-416): line i defines cluster i; entries
    are space-separated chain ids like ``1abc_A``; the PDB id is the part
    before '_', uppercased."""
    pdb_to_cluster: dict[str, int] = {}
    with open(path) as f:
        for i, line in enumerate(f):
            for chain in line.split(" "):
                pdb = chain.split("_")[0]
                if pdb.strip():
                    pdb_to_cluster[pdb.strip().upper()] = i
    return pdb_to_cluster


def assign_clusters(names, pdb_to_cluster: dict[str, int]) -> np.ndarray:
    """Cluster id per dataset row (TrainSampler's cluster_lookup,
    Dfold_data_loader_dynamic.py:389-401): names are uppercased and stripped
    of any '.'-suffix; a name absent from the cluster file becomes a NEW
    singleton cluster (the reference counts these as missing_pdbs)."""
    table = dict(pdb_to_cluster)
    max_cluster = max(table.values(), default=-1)
    out = []
    for name in names:
        key = str(name).upper().split(".")[0]
        if key not in table:
            max_cluster += 1
            table[key] = max_cluster
        out.append(table[key])
    return np.asarray(out, np.int64)


@dataclass
class EpochSampler:
    """Epoch-seeded deterministic index stream + host striding — the
    reference's two samplers on one contract:

    * DistributedTrainSampler (Dfold_data_loader_dynamic.py:455-528): every
      host sees the same epoch permutation; host striding happens AFTER
      batch layout so each host consumes whole sub-batches.
    * TrainSampler's four sample modes (:389-445):
        - time_batch (default): each batch = batch_size copies of ONE
          protein (multiple diffusion draws of the same window);
        - length_batch: each batch = batch_size proteins sampled (with
          replacement) from one seq-length group — batches are
          shape-homogeneous without padding, one XLA program per length;
        - cluster_time_batch / cluster_length_batch: first draw ONE
          epoch-random representative per sequence cluster (cluster file
          via read_clusters/assign_clusters), then apply time/length
          layout over the representatives (:430-445). Balances sampling
          across redundant sequence clusters.

    Length modes need `lengths` (per-row seq_len); cluster modes need
    `clusters` (per-row cluster id, see assign_clusters). Use make_sampler
    to wire both from a TrajectoryDataset + DataConfig."""

    n_items: int
    batch_size: int
    seed: int = 0
    num_hosts: int = 1
    host_index: int = 0
    shuffle: bool = True
    sample_mode: str = "time_batch"
    lengths: np.ndarray | None = None
    clusters: np.ndarray | None = None

    def __post_init__(self):
        if self.num_hosts > 1 and self.batch_size % self.num_hosts:
            # striding AFTER batch layout (the reference's subsample
            # order, Dfold_data_loader_dynamic.py:502-519) only preserves
            # the whole-batch contract when each host receives a whole
            # number of rows per batch
            raise ValueError(
                f"batch_size={self.batch_size} must divide evenly over "
                f"num_hosts={self.num_hosts}"
            )
        modes = ("time_batch", "length_batch",
                 "cluster_time_batch", "cluster_length_batch")
        if self.sample_mode not in modes:
            raise ValueError(
                f"invalid sample_mode {self.sample_mode!r}; one of {modes}"
            )
        if "length" in self.sample_mode and self.lengths is None:
            raise ValueError(f"{self.sample_mode} needs per-row lengths")
        if self.sample_mode.startswith("cluster") and self.clusters is None:
            raise ValueError(f"{self.sample_mode} needs per-row clusters")

    @property
    def local_batch_size(self) -> int:
        """Rows each host actually consumes per batch. The GLOBAL batch is
        batch_size copies of one protein; after host striding every host
        holds batch_size/num_hosts contiguous copies (a round-3 review
        found the iterator previously stacked batch_size LOCAL rows —
        mixing num_hosts different proteins per batch and paying the full
        global-batch I/O on every host)."""
        return self.batch_size // self.num_hosts

    def epoch_indices(self, epoch: int) -> np.ndarray:
        rng = np.random.default_rng(self.seed + epoch)
        if self.sample_mode.startswith("cluster"):
            # ONE epoch-random representative per cluster, in cluster-id
            # order (the reference's groupby('cluster').sample(1,
            # random_state=epoch) keeps group order, :430-445)
            clusters = np.asarray(self.clusters)[: self.n_items]
            pool = np.asarray([
                int(rng.choice(np.flatnonzero(clusters == c)))
                for c in np.unique(clusters)
            ])
        else:
            pool = np.arange(self.n_items)

        if self.sample_mode.endswith("length_batch"):
            # batch_size same-length proteins per batch, drawn WITH
            # replacement from each length group in ascending-length order
            # (groupby('modeled_seq_len').sample(batch_size, replace=True),
            # :420-423,436-439)
            lengths = np.asarray(self.lengths)[pool]
            idx = np.concatenate([
                rng.choice(pool[lengths == length], size=self.batch_size,
                           replace=True)
                for length in np.unique(lengths)
            ])
        else:
            # time layout: batch_size copies of each pooled protein
            if self.shuffle and self.sample_mode == "time_batch":
                pool = rng.permutation(pool)
            # (cluster_time_batch keeps cluster order, like the reference)
            idx = np.repeat(pool, self.batch_size)
        total = int(np.ceil(len(idx) / self.num_hosts)) * self.num_hosts
        if total > len(idx):
            idx = np.concatenate([idx, idx[: total - len(idx)]])
        return idx[self.host_index :: self.num_hosts]


def make_sampler(dataset: TrajectoryDataset, cfg: DataConfig, *,
                 batch_size: int, seed: int = 0, num_hosts: int = 1,
                 host_index: int = 0) -> EpochSampler:
    """Build the epoch sampler for cfg.sample_mode, wiring per-row lengths
    (manifest seq_len column) and cluster ids (cfg.cluster_path parsed with
    the reference's format) from the dataset manifest."""
    lengths = clusters = None
    if "length" in cfg.sample_mode:
        if "seq_len" not in dataset.df:
            raise ValueError(
                f"{cfg.sample_mode} needs a seq_len column in the manifest"
            )
        lengths = dataset.df["seq_len"].to_numpy()
    if cfg.sample_mode.startswith("cluster"):
        if not cfg.cluster_path:
            raise ValueError(
                f"{cfg.sample_mode} needs data.cluster_path (reference "
                f"config/base.yaml:87 cluster_path)"
            )
        clusters = assign_clusters(
            dataset.df["name"], read_clusters(cfg.cluster_path)
        )
    return EpochSampler(
        n_items=len(dataset), batch_size=batch_size, seed=seed,
        num_hosts=num_hosts, host_index=host_index,
        sample_mode=cfg.sample_mode, lengths=lengths, clusters=clusters,
    )


def batch_iterator(dataset: TrajectoryDataset, sampler: EpochSampler,
                   epoch: int, *, drop_names: bool = True):
    """Yield stacked [B, ...] numpy batches for one epoch. In the time
    modes every batch holds repeated copies of one protein (multiple
    diffusion draws of the same window); in the length modes it holds
    batch_size same-length proteins, so shapes stay batch-homogeneous
    either way (one XLA program per distinct length unless pad_to is set)."""
    idx = sampler.epoch_indices(epoch)
    rng = np.random.default_rng(
        np.random.SeedSequence([sampler.seed, epoch, sampler.host_index])
    )
    B = sampler.local_batch_size
    for i in range(0, len(idx) - B + 1, B):
        windows = [dataset.get_window(int(j), rng) for j in idx[i : i + B]]
        if drop_names:
            for w in windows:
                w.pop("name", None)
        yield {
            k: np.stack([w[k] for w in windows]) for k in windows[0]
        }


def eval_windows(dataset: TrajectoryDataset):
    """One deterministic window per protein for evaluation."""
    for i in range(len(dataset)):
        rng = np.random.default_rng(i)
        yield dataset.get_window(i, rng)


class StaticPdbDataset:
    """Dataset over plain PDB files (no MD trajectory artifacts).

    Covers the reference's legacy static-PDB path (src/data/pdb_data_loader.py
    FrameDiff heritage) in a form the dynamic model accepts: each item is an
    F-frame window holding F copies of the static structure, with zero
    force/velocity channels and zero embeddings (or caller-provided embedding
    npz per structure). Useful for debugging, geometry pretraining, and
    datasets without dynamics.
    """

    def __init__(self, pdb_paths: list, *, frame_time: int = 2,
                 pad_to: int | None = None, embed_paths: list | None = None):
        self.pdb_paths = list(pdb_paths)
        self.frame_time = frame_time
        self.pad_to = pad_to
        self.embed_paths = embed_paths

    def __len__(self):
        return len(self.pdb_paths)

    def get_window(self, idx: int, rng=None) -> dict:
        path = self.pdb_paths[idx]
        if path.endswith(".npz"):
            # preprocessed chain (preprocess/mmcif.process_mmcif_dir output)
            with np.load(path) as z:
                atom37 = np.asarray(z["atom37"], np.float32)
                mask = np.asarray(z["atom37_mask"], np.float32)
                aatype = np.asarray(z["aatype"], np.int32)
                residue_index = np.asarray(z["residue_index"], np.int32)
        elif path.endswith(".cif") or path.endswith(".cif.gz"):
            from dynamicpdb_tpu.preprocess.mmcif import parse_mmcif

            obj = parse_mmcif(path)
            ch = next(iter(obj.chains.values()))
            atom37, mask = ch.atom37, ch.atom37_mask
            aatype, residue_index = ch.aatype, ch.residue_index
        else:
            from dynamicpdb_tpu.analysis.pdb_io import read_pdb

            atom37, mask, aatype, residue_index = read_pdb(path)
        n = len(aatype)
        F = self.frame_time
        if self.embed_paths is not None:
            with np.load(self.embed_paths[idx]) as z:
                node_repr = np.asarray(z["node_repr"], np.float32)
                edge_repr = np.asarray(z["edge_repr"], np.float32)
        else:
            node_repr = np.zeros((n, 256), np.float32)
            edge_repr = np.zeros((n, n, 128), np.float32)
        raw = {
            "name": os.path.splitext(os.path.basename(self.pdb_paths[idx]))[0],
            "atom37": np.repeat(atom37[None], F, axis=0),
            "atom37_mask": mask,
            "aatype": aatype,
            "residue_index": residue_index,
            "force": np.zeros((F, n, 3), np.float32),
            "vel": np.zeros((F, n, 3), np.float32),
            "node_repr": node_repr,
            "edge_repr": edge_repr,
        }
        if self.pad_to:
            name = raw.pop("name")
            raw = pad_window(raw, self.pad_to)
            raw["name"] = name
        return raw
