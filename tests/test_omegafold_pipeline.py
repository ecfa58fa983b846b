"""Bit-parity for the OmegaFold input pipeline (port step 7)."""
import os
import sys
import types

import numpy as np
import pytest

from dynamicpdb_tpu.models.omegafold import pipeline as P

REF = "/root/reference/src/toolbox/OmegaFold"
ref_available = os.path.isdir(REF)

if ref_available:
    for name in ["Bio", "Bio.PDB", "Bio.Data", "Bio.Data.SCOPData"]:
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["Bio"].PDB = sys.modules["Bio.PDB"]
    sys.modules["Bio"].PDB.StructureBuilder = types.ModuleType("SB")
    sys.modules["Bio"].Data = sys.modules["Bio.Data"]
    sys.modules["Bio.Data"].SCOPData = sys.modules["Bio.Data.SCOPData"]
    sys.modules["Bio.Data.SCOPData"].protein_letters_3to1 = {}
    sys.modules.setdefault("Bio.PDB.StructureBuilder", types.ModuleType("SB"))
    sys.path.insert(0, REF)

FASTA = [
    ">chainB\n",
    "MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQ\n",
    ">chainA\n",
    "GSHM\n",
    "ZKBU\n",  # exercises Z->E, B->D, U->C
]


def test_parse_sorted_and_tokens():
    parsed = P.parse_fasta(FASTA)
    assert [c for c, _ in parsed] == ["chainA", "chainB"]  # shortest first
    assert parsed[0][1] == "GSHMZKBU"
    toks = P.tokenize(parsed[0][1])
    # G S H M E K D C
    assert toks.tolist() == [7, 15, 8, 12, 6, 11, 3, 4]


def test_mask_token_placement_and_row0():
    aatype = P.tokenize("MKTAYIAKQR")
    data = P.make_pseudo_msa(aatype, num_pseudo_msa=4, num_cycle=3)
    assert len(data) == 3
    for d in data:
        assert d["p_msa"].shape == (5, 10)
        np.testing.assert_array_equal(d["p_msa"][0], aatype)  # unmasked row
        np.testing.assert_array_equal(d["p_msa_mask"][0], 1.0)
        assert np.all(d["p_msa"][d["p_msa_mask"] == 0] == 21)


@pytest.mark.skipif(not ref_available, reason="reference not mounted")
def test_bit_parity_vs_reference_fasta2inputs():
    from omegafold import pipeline as ref_pipeline

    ours = list(P.fasta2inputs(FASTA, num_pseudo_msa=5, num_cycle=4))
    theirs = list(
        ref_pipeline.fasta2inputs(
            FASTA, num_pseudo_msa=5, num_cycle=4, deterministic=True
        )
    )
    assert len(ours) == len(theirs) == 2
    for (name, cycles), ref_cycles in zip(ours, theirs):
        for d, rd in zip(cycles, ref_cycles):
            np.testing.assert_array_equal(d["p_msa"], rd["p_msa"].numpy())
            np.testing.assert_array_equal(
                d["p_msa_mask"], rd["p_msa_mask"].numpy().astype(np.float32)
            )


def test_parse_fasta_rejects_malformed():
    """A header with no sequence must raise, not silently shift every later
    sequence onto the wrong chain id; a leading bare sequence line raises."""
    import pytest

    with pytest.raises(ValueError, match="no sequence"):
        P.parse_fasta([">A\n", ">B\n", "MKTA\n"])
    with pytest.raises(ValueError, match="before any"):
        P.parse_fasta(["MKTA\n", ">A\n", "GSHM\n"])
    # multi-line sequences still concatenate onto the right record
    parsed = P.parse_fasta([">x\n", "MK\n", "TA\n", ">y\n", "G\n"])
    assert dict(parsed) == {"x": "MKTA", "y": "G"}
