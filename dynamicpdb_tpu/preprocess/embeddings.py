"""Sequence-embedding artifacts (OmegaFold node/edge representations).

The reference extracts per-protein embeddings offline with its vendored
OmegaFold (data_preprocess/extract_embedding.py: GeoFormer, 10 recycles ->
node_repr [N, 256], edge_repr [N, N, 128], saved as {pid}.npz) and the model
only ever consumes the cached npz (Dfold_data_loader_dynamic.py:311-316).
We keep that contract: embeddings are offline artifacts. This module
validates/normalizes them and provides a runner that shells out to the
reference extractor when torch + OmegaFold weights are available.
"""
from __future__ import annotations

import subprocess
import sys

import numpy as np

NODE_DIM = 256
EDGE_DIM = 128


def validate(npz_path: str, n_res: int | None = None) -> dict:
    """Check an embedding npz against the model's input contract."""
    with np.load(npz_path) as z:
        if "node_repr" not in z.files or "edge_repr" not in z.files:
            raise ValueError(
                f"{npz_path}: need node_repr/edge_repr, got {z.files}"
            )
        node, edge = z["node_repr"], z["edge_repr"]
    if node.ndim != 2 or node.shape[1] != NODE_DIM:
        raise ValueError(f"node_repr must be [N, {NODE_DIM}], got {node.shape}")
    if edge.ndim != 3 or edge.shape[2] != EDGE_DIM or edge.shape[0] != edge.shape[1]:
        raise ValueError(f"edge_repr must be [N, N, {EDGE_DIM}], got {edge.shape}")
    if edge.shape[0] != node.shape[0]:
        raise ValueError("node/edge residue counts disagree")
    if n_res is not None and node.shape[0] != n_res:
        raise ValueError(f"expected N={n_res}, got {node.shape[0]}")
    if not (np.isfinite(node).all() and np.isfinite(edge).all()):
        raise ValueError(f"{npz_path}: non-finite embedding values")
    return {"n_res": int(node.shape[0])}


def zero_embeddings(n_res: int) -> dict:
    """Placeholder embeddings for ablation / embedding-free training."""
    return {
        "node_repr": np.zeros((n_res, NODE_DIM), np.float32),
        "edge_repr": np.zeros((n_res, n_res, EDGE_DIM), np.float32),
    }


def extract_with_omegafold(
    fasta_path: str,
    out_npz: str,
    *,
    omegafold_repo: str,
    weights_path: str,
    num_cycles: int = 10,
    device: str = "cpu",
) -> str:
    """Run the (external) OmegaFold extractor as a subprocess.

    Mirrors data_preprocess/extract_embedding.py:39-73; requires a torch
    environment with the OmegaFold package and released weights. The result
    is validated against the model contract before returning.
    """
    script = (
        "import sys, numpy as np, torch;"
        f"sys.path.insert(0, {omegafold_repo!r});"
        "from omegafold.__main__ import OmegaFoldModel;"
        f"m = OmegaFoldModel({weights_path!r}, device={device!r});"
        f"lines = open({fasta_path!r}).read().splitlines();"
        f"edge, node = m.inference(lines, {num_cycles});"
        f"np.savez_compressed({out_npz!r}, node_repr=node[0].numpy(),"
        " edge_repr=edge[0].numpy())"
    )
    subprocess.run([sys.executable, "-c", script], check=True)
    validate(out_npz)
    return out_npz
