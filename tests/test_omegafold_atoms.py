"""Torch-parity for the OmegaFold atom14 expansion (port step 6).

Round-1 measurement showed OmegaFold's side-chain group chaining deviates
from the AF2 convention by up to 11.6 A; this pins our port to the
reference AAFrame semantics exactly.
"""
import os
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

from dynamicpdb_tpu.models.omegafold import atoms as A

REF = "/root/reference/src/toolbox/OmegaFold"
ref_available = os.path.isdir(REF)

if ref_available:
    for name in ["Bio", "Bio.PDB", "Bio.Data", "Bio.Data.SCOPData"]:
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["Bio"].PDB = sys.modules["Bio.PDB"]
    sys.modules["Bio"].Data = sys.modules["Bio.Data"]
    sys.modules["Bio.Data"].SCOPData = sys.modules["Bio.Data.SCOPData"]
    sys.modules["Bio.Data.SCOPData"].protein_letters_3to1 = {}
    sys.path.insert(0, REF)
    import torch

RNG = np.random.default_rng(11)
L = 24


def _random_frames(mask):
    from scipy.spatial.transform import Rotation

    rots = Rotation.random(L, random_state=3).as_matrix().astype(np.float32)
    trans = (RNG.normal(size=(L, 3)) * 5).astype(np.float32)
    rots[mask == 0] = np.eye(3, dtype=np.float32)
    trans[mask == 0] = 0
    return rots, trans


@pytest.mark.skipif(not ref_available, reason="reference not mounted")
@pytest.mark.parametrize("masked_tail", [False, True])
def test_expand_and_atom14_parity(masked_tail):
    from omegafold.utils.protein_utils import aaframe

    mask = np.ones((L,), np.float32)
    if masked_tail:
        mask[-3:] = 0
    rots, trans = _random_frames(mask)
    # every residue type appears at least once
    fasta = np.concatenate([np.arange(21), RNG.integers(0, 21, L - 21)])
    fasta = fasta.astype(np.int64)
    torsions = RNG.normal(size=(L, 7, 2)).astype(np.float32)

    bb = aaframe.AAFrame(
        translation=torch.tensor(trans),
        rotation=torch.tensor(rots),
        mask=torch.tensor(mask).bool(),
        unit="Angstrom",
    )
    frames8 = bb.expand_w_torsion(
        torsion_angles=torch.tensor(torsions),
        torsion_angles_mask=torch.ones(L, 7, dtype=torch.bool),
        fasta=torch.tensor(fasta),
    )
    pos14_t, mask14_t = frames8.expanded_to_pos(torch.tensor(fasta))

    r8, t8, m8 = A.expand_w_torsion(
        jnp.asarray(rots), jnp.asarray(trans), jnp.asarray(mask).astype(bool),
        jnp.asarray(torsions), jnp.asarray(fasta),
    )
    np.testing.assert_allclose(
        np.asarray(r8), frames8.rotation.numpy(), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(t8), frames8.translation.numpy(), atol=2e-4
    )
    np.testing.assert_array_equal(
        np.asarray(m8), frames8.mask.numpy()
    )

    pos14, mask14 = A.expanded_to_pos(r8, t8, m8, jnp.asarray(fasta))
    np.testing.assert_allclose(
        np.asarray(pos14), pos14_t.numpy(), atol=2e-4
    )
    np.testing.assert_array_equal(np.asarray(mask14), mask14_t.numpy())


@pytest.mark.skipif(not ref_available, reason="reference not mounted")
def test_five_angle_zero_pad_branch():
    """torsion_angles with 5 groups get zero-padded to 7 (aaframe.py:749-761)."""
    from omegafold.utils.protein_utils import aaframe

    mask = np.ones((L,), np.float32)
    rots, trans = _random_frames(mask)
    fasta = RNG.integers(0, 21, L).astype(np.int64)
    torsions5 = RNG.normal(size=(L, 5, 2)).astype(np.float32)

    bb = aaframe.AAFrame(
        translation=torch.tensor(trans), rotation=torch.tensor(rots),
        mask=torch.tensor(mask).bool(), unit="Angstrom",
    )
    frames8 = bb.expand_w_torsion(
        torsion_angles=torch.tensor(torsions5),
        torsion_angles_mask=torch.ones(L, 5, dtype=torch.bool),
        fasta=torch.tensor(fasta),
    )
    r8, t8, m8 = A.expand_w_torsion(
        jnp.asarray(rots), jnp.asarray(trans), jnp.asarray(mask).astype(bool),
        jnp.asarray(torsions5), jnp.asarray(fasta),
    )
    np.testing.assert_allclose(
        np.asarray(t8), frames8.translation.numpy(), atol=2e-4
    )
