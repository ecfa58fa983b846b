"""OmegaFold input pipeline (port step 7 of docs/OMEGAFOLD_PORT.md).

Equivalent of pipeline.fasta2inputs
(/root/reference/src/toolbox/OmegaFold/omegafold/pipeline.py:92-160): parse
FASTA text into tokenized sequences and build the per-cycle pseudo-MSA —
num_pseudo_msa randomly-masked copies of the sequence stacked under the
unmasked row, masked positions replaced by the mask token (21).

For bit-identical inputs to the reference extractor, the random subsampling
masks are drawn with torch's CPU generator seeded by the sequence length
(the reference's `deterministic` mode). torch is an offline/test dependency
only — the model itself is pure JAX.
"""
from __future__ import annotations

from typing import Iterator

import numpy as np

RESTYPES = "ARNDCQEGHILKMFPSTWYV"  # + X (20); '-' / mask token = 21
MASK_TOKEN = 21


def parse_fasta(fasta_lines) -> list[tuple[str, str]]:
    """[(chain_id, sequence)] sorted by sequence length (pipeline.py:116-132).

    Sequence lines attach to the most recent header, so a header with no
    sequence cannot silently shift every later record onto the wrong chain
    id (embeddings are written to ``{chain_id}.npz`` downstream — a mispair
    corrupts the artifact mapping). Headerless leading sequence lines and
    empty records raise instead of mis-parsing.
    """
    records: list[tuple[str, list[str]]] = []
    for line in fasta_lines:
        line = line.rstrip("\n")
        if len(line) == 0:
            continue
        if line.startswith(">") or line.startswith(":"):
            records.append((line[1:], []))
        else:
            if not records:
                raise ValueError(
                    "FASTA sequence line before any '>' header"
                )
            records[-1][1].append(line.upper())
    empty = [cid for cid, parts in records if not parts]
    if empty:
        raise ValueError(f"FASTA records with no sequence: {empty}")
    return sorted(
        ((cid, "".join(parts)) for cid, parts in records),
        key=lambda x: len(x[1]),
    )


def tokenize(seq: str) -> np.ndarray:
    """Sequence string -> int tokens (Z->E, B->D, U->C, X->20, '-'->21)."""
    seq = seq.replace("Z", "E").replace("B", "D").replace("U", "C")
    out = []
    for aa in seq:
        if aa == "-":
            out.append(21)
        elif aa == "X":
            out.append(20)
        else:
            idx = RESTYPES.find(aa)
            if idx < 0:
                raise ValueError(f"unknown residue {aa!r}")
            out.append(idx)
    return np.asarray(out, np.int64)


def make_pseudo_msa(
    aatype: np.ndarray,
    *,
    num_pseudo_msa: int = 15,
    mask_rate: float = 0.12,
    num_cycle: int = 10,
    deterministic: bool = True,
    seed: int | None = None,
) -> list[dict]:
    """Per-cycle {p_msa [M, L], p_msa_mask [M, L]} inputs (pipeline.py:
    139-157). Row 0 is the true sequence, rows 1..M-1 are randomly masked
    copies; masked positions carry token 21."""
    num_res = len(aatype)
    mask = np.ones((num_res,), np.float32)
    try:
        import torch

        g = None
        if deterministic:
            g = torch.Generator()
            g.manual_seed(num_res if seed is None else seed)
        rand = lambda: torch.rand(
            [num_pseudo_msa, num_res], generator=g
        ).numpy()
    except ImportError:  # pragma: no cover - torch is baked into the image
        rng = np.random.default_rng(num_res if seed is None else seed)
        rand = lambda: rng.random((num_pseudo_msa, num_res), np.float32)

    data = []
    for _ in range(num_cycle):
        p_msa_mask = rand() > mask_rate
        p_msa_mask = np.concatenate([mask[None, :], p_msa_mask], axis=0)
        p_msa = np.tile(aatype[None, :], (num_pseudo_msa + 1, 1))
        p_msa[p_msa_mask == 0] = MASK_TOKEN
        data.append(
            {
                "p_msa": p_msa.astype(np.int64),
                "p_msa_mask": p_msa_mask.astype(np.float32),
            }
        )
    return data


def pad_cycle_inputs(cycles: list[dict], pad_to: int) -> list[dict]:
    """Right-pad each cycle's {p_msa, p_msa_mask} along the residue axis to
    ``pad_to`` columns so every sequence in a length bucket shares ONE
    compiled program (fixed XLA shapes; the exact-length path pays a fresh
    ~40 s compile per distinct length).

    Padding columns carry token 20 ('X') with mask 0 — NOT the mask token
    21: the PLM's token-dropout rescaling counts token-21 positions
    (omegaplm.py:221-243 via plm._finetuning_scale), so a 21-padded tail
    would perturb every real row. Run the model with pad_safe=True and
    slice outputs back to the true length (each cycle dict carries it as
    'num_res')."""
    out = []
    for cyc in cycles:
        n = cyc["p_msa"].shape[-1]
        if pad_to < n:
            raise ValueError(f"pad_to={pad_to} < sequence length {n}")
        pad = pad_to - n
        out.append({
            "p_msa": np.pad(cyc["p_msa"], ((0, 0), (0, pad)),
                            constant_values=20),
            "p_msa_mask": np.pad(cyc["p_msa_mask"], ((0, 0), (0, pad))),
            "num_res": n,
        })
    return out


def fasta2inputs(
    fasta_lines,
    *,
    num_pseudo_msa: int = 15,
    mask_rate: float = 0.12,
    num_cycle: int = 10,
    deterministic: bool = True,
    pad_multiple: int = 0,
) -> Iterator[tuple[str, list[dict]]]:
    """Yield (chain_id, cycle_inputs) per sequence, shortest first.

    pad_multiple > 0 right-pads every sequence to the next multiple (length
    bucketing: one compiled program per bucket instead of per distinct
    length; see pad_cycle_inputs). Each cycle dict then carries the true
    length as 'num_res'."""
    for ch, seq in parse_fasta(fasta_lines):
        aatype = tokenize(seq)
        cycles = make_pseudo_msa(
            aatype,
            num_pseudo_msa=num_pseudo_msa,
            mask_rate=mask_rate,
            num_cycle=num_cycle,
            deterministic=deterministic,
        )
        if pad_multiple:
            bucket = -(-len(aatype) // pad_multiple) * pad_multiple
            cycles = pad_cycle_inputs(cycles, bucket)
        yield ch, cycles
