"""Torch-parity tests for the OmegaFold core primitives (port step 1)."""
import os
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

from dynamicpdb_tpu.models.omegafold import core

REF = "/root/reference/src/toolbox/OmegaFold"
ref_available = os.path.isdir(REF)

if ref_available:
    # stub Biopython bits the reference imports at module scope
    for name in ["Bio", "Bio.PDB", "Bio.Data", "Bio.Data.SCOPData"]:
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["Bio"].PDB = sys.modules["Bio.PDB"]
    sys.modules["Bio"].Data = sys.modules["Bio.Data"]
    sys.modules["Bio.Data"].SCOPData = sys.modules["Bio.Data.SCOPData"]
    sys.modules["Bio.Data.SCOPData"].protein_letters_3to1 = {}
    sys.path.insert(0, REF)
    import torch

RNG = np.random.default_rng(0)


@pytest.mark.skipif(not ref_available, reason="reference not mounted")
def test_attention_parity():
    from omegafold import modules

    q = RNG.normal(size=(3, 2, 8, 16)).astype(np.float32)
    k = RNG.normal(size=(3, 2, 8, 16)).astype(np.float32)
    v = RNG.normal(size=(3, 2, 8, 24)).astype(np.float32)
    bias = RNG.normal(size=(8, 8)).astype(np.float32)
    ref_out, ref_edge = modules.attention(
        torch.tensor(q), torch.tensor(k), 0.3, torch.tensor(v),
        torch.tensor(bias), subbatch_size=4,
        return_edge=True, edge_reduction="sum", edge_reduction_dim=-3,
    )
    out, edge = core.attention(
        jnp.asarray(q), jnp.asarray(k), 0.3, jnp.asarray(v),
        jnp.asarray(bias), return_edge=True, edge_reduction="sum",
        edge_reduction_dim=-3,
    )
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(edge), ref_edge.numpy(), atol=2e-5)


@pytest.mark.skipif(not ref_available, reason="reference not mounted")
def test_rope_parity():
    from omegafold import embedders

    mod = embedders.RoPE(16)
    x = RNG.normal(size=(2, 5, 3, 16)).astype(np.float32)  # [.., L, H, d]
    ref = mod(torch.tensor(x), seq_dim=x.ndim - 3)
    got = core.rope(jnp.asarray(x), x.ndim - 3)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-6)


@pytest.mark.skipif(not ref_available, reason="reference not mounted")
def test_multi_headed_scaling_parity():
    from omegafold import modules

    torch.manual_seed(0)
    mod = modules.MultiHeadedScaling(16, num_heads=2, on_out_ready=None)
    x = RNG.normal(size=(4, 7, 16)).astype(np.float32)
    ref = mod(torch.tensor(x))
    got = core.multi_headed_scaling(
        jnp.asarray(x),
        jnp.asarray(mod.weight.detach().numpy()),
        jnp.asarray(mod.bias.detach().numpy()),
    )
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), r.detach().numpy(), atol=2e-6)


@pytest.mark.skipif(not ref_available, reason="reference not mounted")
def test_relpos_parity():
    from omegafold import embedders

    torch.manual_seed(1)
    mod = embedders.RelPosEmbedder(65, embedding_dim=4)
    ref = mod(12).detach().numpy()
    got = core.relpos_embedding(jnp.asarray(mod.weight.detach().numpy()), 12)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-6)


@pytest.mark.skipif(not ref_available, reason="reference not mounted")
def test_gated_attention_unit_parity():
    from omegafold import omegaplm

    cfg = types.SimpleNamespace(
        node=32, proj_dim=48, attn_dim=16, num_relpos=65,
    )
    torch.manual_seed(2)
    gau = omegaplm.GatedAttentionUnit(cfg)
    fwd_cfg = types.SimpleNamespace(subbatch_size=None)

    M, L = 3, 10  # pseudo-MSA rows x residues
    node = RNG.normal(size=(M, L, 32)).astype(np.float32)
    bias = (RNG.random((M, 1, L)) > 0.2).astype(np.float32) * -1e9
    scaling = np.float32(np.log(L) / (np.log(512) * 16 ** 0.5))

    with torch.no_grad():
        ref_node, ref_edge = gau(
            torch.tensor(node), torch.tensor(scaling),
            torch.tensor(bias)[:, None].squeeze(1), fwd_cfg,
        )

    params = core.GAUParams(
        gva_w=jnp.asarray(gau.gva_proj[0].weight.detach().numpy().T),
        gva_b=jnp.asarray(gau.gva_proj[0].bias.detach().numpy()),
        mhs_weight=jnp.asarray(gau.multi_headed_scaling.weight.detach().numpy()),
        mhs_bias=jnp.asarray(gau.multi_headed_scaling.bias.detach().numpy()),
        relpos_table=jnp.asarray(gau.relpos.weight.detach().numpy()),
        out_w=jnp.asarray(gau.output_proj.weight.detach().numpy().T),
        out_b=jnp.asarray(gau.output_proj.bias.detach().numpy()),
    )
    got_node, got_edge = core.gated_attention_unit(
        params, jnp.asarray(node), jnp.asarray(scaling), jnp.asarray(bias),
        proj_dim=48, attn_dim=16,
    )
    np.testing.assert_allclose(
        np.asarray(got_node), ref_node.numpy(), atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_edge), ref_edge.numpy(), atol=3e-5
    )


@pytest.mark.skipif(not ref_available, reason="reference not mounted")
def test_omega_plm_parity():
    """Full PLM stack (small dims): tokens -> node + per-layer edge maps."""
    from omegafold import omegaplm

    from dynamicpdb_tpu.models.omegafold.plm import omega_plm, params_from_torch

    cfg = types.SimpleNamespace(
        alphabet_size=23, node=32, padding_idx=21, edge=3,
        proj_dim=48, attn_dim=16, num_relpos=129, masked_ratio=0.12,
        num_head=1,
    )
    torch.manual_seed(3)
    ref = omegaplm.OmegaPLM(cfg).eval()
    fwd_cfg = types.SimpleNamespace(subbatch_size=None)

    M, L = 4, 11
    tokens = RNG.integers(0, 21, (M, L))
    tokens[1, 3:6] = 21  # masked positions exercise token-dropout scaling
    mask = np.ones((M, L), np.float32)
    mask[2, 8:] = 0.0

    with torch.no_grad():
        ref_node, ref_edges = ref(
            torch.tensor(tokens), torch.tensor(mask), fwd_cfg
        )

    params, pcfg = params_from_torch(ref)
    node, edges = omega_plm(
        params, pcfg, jnp.asarray(tokens), jnp.asarray(mask)
    )
    np.testing.assert_allclose(
        np.asarray(node), ref_node.numpy(), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(edges), ref_edges.numpy(), atol=5e-5
    )


@pytest.mark.skipif(not ref_available, reason="reference not mounted")
def test_omega_plm_sequence_parallel_matches_single_device():
    """The PLM stack under an 8-way 'seq' mesh (parallel/sp.py) must
    reproduce the unsharded (node, per-layer edge) outputs — the other
    O(L^2) stage of long-protein embedding extraction."""
    import jax

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from jax.sharding import NamedSharding, PartitionSpec as P
    from omegafold import omegaplm

    from dynamicpdb_tpu.models.omegafold.plm import omega_plm, params_from_torch
    from dynamicpdb_tpu.parallel import mesh as mesh_lib, sp

    cfg = types.SimpleNamespace(
        alphabet_size=23, node=32, padding_idx=21, edge=3,
        proj_dim=48, attn_dim=16, num_relpos=129, masked_ratio=0.12,
        num_head=1,
    )
    torch.manual_seed(3)
    ref = omegaplm.OmegaPLM(cfg).eval()
    params, pcfg = params_from_torch(ref)

    M, L = 4, 16
    tokens = jnp.asarray(RNG.integers(0, 21, (M, L)))
    mask = np.ones((M, L), np.float32)
    mask[2, 12:] = 0.0
    mask = jnp.asarray(mask)

    run = lambda p, t, m: omega_plm(p, pcfg, t, m)  # noqa: E731
    n1, e1 = jax.jit(run)(params, tokens, mask)

    mesh = mesh_lib.make_mesh((1, 8), ("data", "seq"))
    rep = NamedSharding(mesh, P())
    placed = jax.device_put((params, tokens, mask), rep)
    with sp.activated(mesh):
        n8, e8 = jax.jit(run)(*placed)

    np.testing.assert_allclose(np.asarray(n1), np.asarray(n8), atol=2e-5)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e8), atol=2e-5)
