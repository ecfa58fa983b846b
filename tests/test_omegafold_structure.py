"""Torch-parity for the OmegaFold structure module + confidence (step 4)."""
import os
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

from dynamicpdb_tpu.models.omegafold import structure as S

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

RNG = np.random.default_rng(2)
D_NODE, D_EDGE, H = 24, 16, 2
CFG = dict(
    node_dim=D_NODE, edge_dim=D_EDGE, num_head=H, num_scalar_qk=6,
    num_point_qk=4, num_scalar_v=6, num_point_v=4, num_transition=2,
    num_cycle=3, num_channel=20, num_residual_block=2, hidden_dim=18,
    num_bins=10,
)
IPA_DIMS = dict(num_head=H, num_scalar_qk=6, num_point_qk=4)


def _ns(**kw):
    return types.SimpleNamespace(**kw)


@pytest.mark.skipif(not ref_available, reason="reference not mounted")
def test_decode_ipa_parity():
    from omegafold import decode, utils as of_utils

    torch.manual_seed(5)
    mod = decode.InvariantPointAttention(_ns(**CFG))
    L = 9
    node = RNG.normal(size=(L, D_NODE)).astype(np.float32)
    edge = RNG.normal(size=(L, L, D_EDGE)).astype(np.float32)
    mask = np.ones((L,), np.float32)
    mask[-2:] = 0
    # random valid frames
    from scipy.spatial.transform import Rotation

    rots = Rotation.random(L, random_state=0).as_matrix().astype(np.float32)
    trans = RNG.normal(size=(L, 3)).astype(np.float32)
    # AAFrame 'safe' construction resets masked rows to identity frames
    rots[mask == 0] = np.eye(3, dtype=np.float32)
    trans = trans * mask[:, None]

    frames = of_utils.AAFrame(
        translation=torch.tensor(trans), rotation=torch.tensor(rots),
        mask=torch.tensor(mask).bool(), unit="nano",
    )
    with torch.no_grad():
        ref = mod(torch.tensor(node), torch.tensor(edge), frames)
    got = S.decode_ipa(
        S.decode_ipa_from_torch(mod), jnp.asarray(node), jnp.asarray(edge),
        jnp.asarray(rots), jnp.asarray(trans), jnp.asarray(mask), **IPA_DIMS,
    )
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=5e-5)


@pytest.mark.skipif(not ref_available, reason="reference not mounted")
def test_structure_module_parity():
    from omegafold import decode

    torch.manual_seed(6)
    mod = decode.StructureModule(_ns(**CFG))
    L = 8
    node = RNG.normal(size=(L, D_NODE)).astype(np.float32)
    edge = RNG.normal(size=(L, L, D_EDGE)).astype(np.float32)
    mask = np.ones((L,), np.float32)
    fasta = RNG.integers(0, 20, (L,))

    with torch.no_grad():
        ref_node, ref_ret = mod(
            torch.tensor(node), torch.tensor(edge), torch.tensor(fasta),
            torch.tensor(mask),
        )
    got_node, (rots, trans), torsions = S.structure_module(
        S.structure_params_from_torch(mod), jnp.asarray(node),
        jnp.asarray(edge), jnp.asarray(mask), ipa_dims=IPA_DIMS,
    )
    np.testing.assert_allclose(np.asarray(got_node), ref_node.numpy(), atol=1e-4)
    ref_frames = ref_ret["final_frames"]  # AAFrame, expanded [L, 8]
    # backbone frame = group 0 of the expanded frames
    np.testing.assert_allclose(
        np.asarray(rots), ref_frames.rotation[:, 0].numpy(), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(trans), ref_frames.translation[:, 0].numpy(), atol=1e-3
    )


@pytest.mark.skipif(not ref_available, reason="reference not mounted")
def test_confidence_head_parity():
    from omegafold import confidence

    torch.manual_seed(7)
    mod = confidence.ConfidenceHead(_ns(**CFG))
    L = 7
    node = RNG.normal(size=(L, D_NODE)).astype(np.float32)
    with torch.no_grad():
        ref = mod(torch.tensor(node))
    got = S.confidence_head(
        S.confidence_params_from_torch(mod), jnp.asarray(node)
    )
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-5)


@pytest.mark.skipif(not ref_available, reason="reference not mounted")
def test_edge_and_recycle_embedder_parity():
    from omegafold import embedders as ref_emb

    from dynamicpdb_tpu.models.omegafold import embedders as E

    torch.manual_seed(8)
    L, DE, DN = 9, D_EDGE, D_NODE
    cfg = _ns(alphabet_size=21, edge_dim=DE, relpos_len=32, node_dim=DN,
              prev_pos=_ns(first_break=3.25, last_break=20.75, num_bins=16,
                           ignore_index=0))
    ee = ref_emb.EdgeEmbedder(cfg)
    fasta = RNG.integers(0, 20, (L,))
    out = RNG.normal(size=(L, L, DE)).astype(np.float32)
    with torch.no_grad():
        ref = ee(torch.tensor(fasta), torch.tensor(out.copy()))
    got = E.edge_embedder(
        E.edge_embedder_from_torch(ee), jnp.asarray(fasta), jnp.asarray(out)
    )
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-6)

    re = ref_emb.RecycleEmbedder(cfg)
    M = 3
    prev_node = RNG.normal(size=(L, DN)).astype(np.float32)
    prev_edge = RNG.normal(size=(L, L, DE)).astype(np.float32)
    prev_x = RNG.normal(size=(L, 14, 3)).astype(np.float32) * 4
    node = RNG.normal(size=(M, L, DN)).astype(np.float32)
    edge = RNG.normal(size=(L, L, DE)).astype(np.float32)
    with torch.no_grad():
        ref_n, ref_e = re(
            fasta=torch.tensor(fasta),
            prev_node=torch.tensor(prev_node),
            prev_edge=torch.tensor(prev_edge),
            prev_x=torch.tensor(prev_x),
            node_repr=torch.tensor(node.copy()),
            edge_repr=torch.tensor(edge.copy()),
        )
    got_n, got_e = E.recycle_embedder(
        E.recycle_embedder_from_torch(re), jnp.asarray(fasta),
        jnp.asarray(prev_node), jnp.asarray(prev_edge), jnp.asarray(prev_x),
        jnp.asarray(node), jnp.asarray(edge),
    )
    np.testing.assert_allclose(np.asarray(got_n), ref_n.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_e), ref_e.numpy(), atol=2e-5)
