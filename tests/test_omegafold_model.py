"""Full-model torch parity for the OmegaFold port (step 8): fasta ->
pseudo-MSA -> PLM -> GeoFormer -> structure -> confidence-selected
(edge_repr, node_repr) through 3 recycling cycles, plus the state_dict
importer."""
import os
import sys
import types

import numpy as np
import pytest
# compile/oracle-heavy on a 1-core host (measured, Makefile header):
# run via `make heavy`; excluded from the default `make test` tier
pytestmark = pytest.mark.heavy

import jax.numpy as jnp

from dynamicpdb_tpu.models.omegafold import model as M
from dynamicpdb_tpu.models.omegafold import pipeline as P

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

RNG = np.random.default_rng(6)


def _small_cfg():
    ns = types.SimpleNamespace
    return ns(
        alphabet_size=21,
        plm=ns(
            alphabet_size=23, node=32, padding_idx=21, edge=3, proj_dim=48,
            attn_dim=16, num_head=1, num_relpos=129, masked_ratio=0.12,
        ),
        node_dim=24,
        edge_dim=16,
        relpos_len=32,
        prev_pos=ns(first_break=3.25, last_break=20.75, num_bins=16,
                    ignore_index=0),
        c=16,
        geo_num_blocks=2,
        gating=True,
        attn_c=8,
        attn_n_head=2,
        transition_multiplier=2,
        activation="ReLU",
        opm_dim=10,
        geom_count=2,
        geom_c=8,
        geom_head=2,
        struct=ns(
            node_dim=20, edge_dim=16, num_cycle=2, num_transition=2,
            num_head=2, num_point_qk=4, num_point_v=4, num_scalar_qk=6,
            num_scalar_v=6, num_channel=20, num_residual_block=2,
            hidden_dim=18, num_bins=10,
        ),
    )


def _sane_init(mod):
    with torch.no_grad():
        for q in mod.parameters():
            q.normal_(0, 0.3)
    return mod


def _build_ref():
    from omegafold import model as ref_model

    torch.manual_seed(9)
    return _sane_init(ref_model.OmegaFold(_small_cfg())).eval()


FASTA = [">t\n", "MKTAYIAKQRQISFVK\n"]


@pytest.mark.skipif(not ref_available, reason="reference not mounted")
def test_full_model_parity_three_cycles():
    ref = _build_ref()
    fwd_cfg = types.SimpleNamespace(subbatch_size=None)

    name, cycles = next(P.fasta2inputs(FASTA, num_pseudo_msa=3, num_cycle=3))
    ref_inputs = [
        {"p_msa": torch.tensor(c["p_msa"]),
         "p_msa_mask": torch.tensor(c["p_msa_mask"])}
        for c in cycles
    ]
    with torch.no_grad():
        ref_edge, ref_node = ref(ref_inputs, fwd_cfg=fwd_cfg)

    params, cfg = M.params_from_torch(ref)
    # jit=True: the jit and eager paths are proven equal in
    # test_jit_cycle_matches_eager; the jitted one hits the persistent
    # compile cache, keeping this heavy parity test fast on reruns
    edge, node, conf = M.omegafold_embed(params, cfg, cycles, jit=True)

    assert 0 < conf <= 1
    np.testing.assert_allclose(
        np.asarray(node), ref_node.numpy(), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(edge), ref_edge.numpy(), atol=2e-4
    )


@pytest.mark.skipif(not ref_available, reason="reference not mounted")
def test_state_dict_importer_matches_module_conversion():
    """params_from_state_dict(sd) must equal params_from_torch(module)."""
    import jax

    ref = _build_ref()
    params_a, cfg = M.params_from_torch(ref)

    sd = ref.state_dict()
    plm_cfg = M.PLMConfig(
        alphabet_size=23, node=32, padding_idx=21, num_layers=3,
        proj_dim=48, attn_dim=16, num_relpos=129, masked_ratio=0.12,
    )
    our_cfg = M.OmegaFoldConfig(
        plm=plm_cfg, node_dim=24, edge_dim=16, attn_c=8, geom_c=8,
        geom_head=2, struct_num_head=2, struct_num_scalar_qk=6,
        struct_num_point_qk=4,
    )
    params_b, _ = M.params_from_state_dict(sd, our_cfg)

    la = jax.tree_util.tree_leaves(params_a)
    lb = jax.tree_util.tree_leaves(params_b)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


@pytest.mark.skipif(not ref_available, reason="reference not mounted")
def test_jit_cycle_matches_eager():
    ref = _build_ref()
    params, cfg = M.params_from_torch(ref)
    _, cycles = next(P.fasta2inputs(FASTA, num_pseudo_msa=2, num_cycle=2))
    e1, n1, c1 = M.omegafold_embed(params, cfg, cycles, jit=False)
    e2, n2, c2 = M.omegafold_embed(params, cfg, cycles, jit=True)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=2e-5)
    np.testing.assert_allclose(np.asarray(n1), np.asarray(n2), atol=2e-5)


@pytest.mark.skipif(not ref_available, reason="reference not mounted")
def test_extract_embeddings_end_to_end(tmp_path):
    """fasta file -> native extractor -> npz contract (shapes, finiteness,
    deterministic across runs)."""
    from dynamicpdb_tpu.preprocess.extract_embeddings import extract_embeddings

    ref = _build_ref()
    params, cfg = M.params_from_torch(ref)
    fasta = [">p1\n", "MKTAYIAKQRQISFVK\n", ">p2\n", "GSHMKT\n"]

    out = dict(extract_embeddings(fasta, params, cfg, num_cycles=2,
                                  num_pseudo_msa=2, jit=True))
    assert set(out) == {"p1", "p2"}
    assert out["p2"]["node_repr"].shape == (6, 24)
    assert out["p2"]["edge_repr"].shape == (6, 6, 16)
    assert out["p1"]["node_repr"].shape == (16, 24)
    for v in out.values():
        assert np.isfinite(v["node_repr"]).all()
        assert np.isfinite(v["edge_repr"]).all()
        assert 0 < float(v["confidence"]) <= 1

    out2 = dict(extract_embeddings(fasta, params, cfg, num_cycles=2,
                                   num_pseudo_msa=2, jit=True))
    np.testing.assert_array_equal(
        out["p1"]["node_repr"], out2["p1"]["node_repr"]
    )


@pytest.mark.skipif(not ref_available, reason="reference not mounted")
def test_load_release_weights_roundtrip(tmp_path):
    """torch.save'd state_dict file -> params identical to module conversion."""
    import jax

    from dynamicpdb_tpu.models.omegafold.model import params_from_state_dict

    ref = _build_ref()
    params_a, _ = M.params_from_torch(ref)
    path = tmp_path / "release.pt"
    torch.save(ref.state_dict(), str(path))

    sd = torch.load(str(path), map_location="cpu", weights_only=False)
    plm_cfg = M.PLMConfig(
        alphabet_size=23, node=32, padding_idx=21, num_layers=3,
        proj_dim=48, attn_dim=16, num_relpos=129, masked_ratio=0.12,
    )
    our_cfg = M.OmegaFoldConfig(
        plm=plm_cfg, node_dim=24, edge_dim=16, attn_c=8, geom_c=8,
        geom_head=2, struct_num_head=2, struct_num_scalar_qk=6,
        struct_num_point_qk=4,
    )
    params_b, _ = params_from_state_dict(sd, our_cfg)
    for a, b in zip(
        jax.tree_util.tree_leaves(params_a), jax.tree_util.tree_leaves(params_b)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.skipif(not ref_available, reason="reference not mounted")
def test_bf16_inference_close_to_f32():
    """Opt-in bf16 inference path: reprs within bf16-level tolerance of the
    f32 reference-parity path (norm statistics stay f32)."""
    ref = _build_ref()
    params, cfg = M.params_from_torch(ref)
    _, cycles = next(P.fasta2inputs(FASTA, num_pseudo_msa=2, num_cycle=2))
    e32, n32, _ = M.omegafold_embed(params, cfg, cycles, jit=True)
    ebf, nbf, _ = M.omegafold_embed(params, cfg, cycles, jit=True,
                                    dtype=jnp.bfloat16)
    assert ebf.dtype == jnp.float32 and nbf.dtype == jnp.float32
    scale = float(np.abs(np.asarray(n32)).mean()) + 1e-6
    assert float(np.abs(np.asarray(nbf) - np.asarray(n32)).mean()) < 0.1 * scale
    escale = float(np.abs(np.asarray(e32)).mean()) + 1e-6
    assert float(np.abs(np.asarray(ebf) - np.asarray(e32)).mean()) < 0.1 * escale


@pytest.mark.skipif(not ref_available, reason="reference not mounted")
def test_padded_extraction_matches_exact():
    """Length-bucket padding (pipeline pad_multiple + pad_safe masking):
    the sliced-back reprs of a padded run must match the exact-shape run.
    Exercises the three pad-leak closures (token-dropout scale via the
    'X' pad token, GeometricAttention attended-branch key mask, triangle
    summed-axis mask)."""
    ref = _build_ref()
    params, cfg = M.params_from_torch(ref)
    _, exact_cycles = next(P.fasta2inputs(FASTA, num_pseudo_msa=3,
                                          num_cycle=2))
    _, padded_cycles = next(P.fasta2inputs(FASTA, num_pseudo_msa=3,
                                           num_cycle=2, pad_multiple=12))
    n = len(FASTA[1].strip())
    assert padded_cycles[0]["p_msa"].shape[-1] == 24 > n
    assert padded_cycles[0]["num_res"] == n

    e0, n0, c0 = M.omegafold_embed(params, cfg, exact_cycles, jit=True)
    ep, np_, cp = M.omegafold_embed(params, cfg, padded_cycles, jit=True,
                                    pad_safe=True)
    ep, np_ = ep[:n, :n], np_[:n]
    np.testing.assert_allclose(np.asarray(np_), np.asarray(n0), atol=3e-4)
    np.testing.assert_allclose(np.asarray(ep), np.asarray(e0), atol=3e-4)
    assert abs(cp - c0) < 1e-3


def test_pad_safe_noop_when_unpadded():
    """pad_safe must be bitwise-invisible for all-ones residue masks."""
    from dynamicpdb_tpu.models.omegafold import geoformer as G

    import jax

    rng = np.random.default_rng(3)
    L, d, c, h = 6, 4, 3, 2
    ks = jax.random.split(jax.random.PRNGKey(1), 8)
    p = G.GeomAttnParams(
        linear_b_w=jax.random.normal(ks[0], (d, 2, h)) * 0.3,
        linear_b_b=jax.random.normal(ks[1], (2, h, 1, 1)) * 0.3,
        act_w=jax.random.normal(ks[2], (d, 2, 5 * d)) * 0.3,
        act_b=jax.random.normal(ks[3], (2, 5 * d)) * 0.3,
        out_proj_w=jax.random.normal(ks[4], (2, d, d)) * 0.3,
        out_proj_b=jax.random.normal(ks[5], (2, d)) * 0.3,
        attn=G.AttnParams(
            qg_weights=jax.random.normal(ks[6], (d, 2, h, 2 * c)) * 0.3,
            qg_bias=jnp.zeros((2, h, 1, 2 * c)),
            kv_weights=jax.random.normal(ks[7], (d, 2, h, 2 * c)) * 0.3,
            kv_bias=jnp.zeros((2, h, 1, 2 * c)),
            o_weights=jax.random.normal(ks[0], (2, h, c, d)) * 0.3,
            o_bias=jnp.zeros((d, 2)),
        ),
    )
    edge = jnp.asarray(rng.normal(size=(L, L, d)).astype(np.float32))
    ones = jnp.ones((L,), jnp.float32)
    a = G.geometric_attention(p, edge, ones, c=c, n_head=h, pad_safe=False)
    b = G.geometric_attention(p, edge, ones, c=c, n_head=h, pad_safe=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.skipif(not ref_available, reason="reference not mounted")
def test_scan_embed_matches_loop():
    """omegafold_embed_scan (one device computation, on-device best-cycle
    argmax) must reproduce the python-loop omegafold_embed exactly."""
    ref = _build_ref()
    params, cfg = M.params_from_torch(ref)
    _, cycles = next(P.fasta2inputs(FASTA, num_pseudo_msa=2, num_cycle=3))
    e_loop, n_loop, c_loop = M.omegafold_embed(params, cfg, cycles, jit=True)
    e_scan, n_scan, c_scan = M.omegafold_embed_scan(params, cfg, cycles)
    np.testing.assert_allclose(np.asarray(n_scan), np.asarray(n_loop),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(e_scan), np.asarray(e_loop),
                               atol=1e-5)
    assert abs(c_scan - c_loop) < 1e-5

    # predict_with_confidence=False: outputs = last cycle, conf = running max
    e2, n2, c2 = M.omegafold_embed(params, cfg, cycles, jit=True,
                                   predict_with_confidence=False)
    e2s, n2s, c2s = M.omegafold_embed_scan(
        params, cfg, cycles, predict_with_confidence=False
    )
    np.testing.assert_allclose(np.asarray(n2s), np.asarray(n2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(e2s), np.asarray(e2), atol=1e-5)
    assert abs(c2s - c2) < 1e-5


@pytest.mark.skipif(not ref_available, reason="reference not mounted")
def test_infer_config_from_state_dict():
    """Shape-based config inference must recover every architectural dim of
    a non-release checkpoint (the CLI imports with cfg=None)."""
    ref = _build_ref()
    sd = {k.removeprefix("module."): v for k, v in ref.state_dict().items()}
    got = M.infer_config_from_state_dict(sd)
    assert got.plm.alphabet_size == 23 and got.plm.node == 32
    assert got.plm.num_layers == 3 and got.plm.proj_dim == 48
    assert got.plm.attn_dim == 16 and got.plm.num_relpos == 129
    assert got.node_dim == 24 and got.edge_dim == 16
    assert got.attn_c == 8 and got.geom_c == 8 and got.geom_head == 2
    assert got.struct_num_head == 2
    assert got.struct_num_scalar_qk == 6 and got.struct_num_point_qk == 4
    # and the params built with the inferred cfg equal the module conversion
    params_a, _ = M.params_from_torch(ref)
    params_b, _ = M.params_from_state_dict(ref.state_dict())
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(params_a),
                    jax.tree_util.tree_leaves(params_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.skipif(not ref_available, reason="reference not mounted")
def test_scan_embed_bf16_traces_and_runs():
    """dtype=bfloat16 + scan (the extract_embeddings default path): the
    cycle promotes activations to f32, so the scan body must cast back to
    keep the carry dtype — this used to be a lax.scan carry-type error at
    trace time. Outputs must stay close to the f32 scan."""
    ref = _build_ref()
    params, cfg = M.params_from_torch(ref)
    _, cycles = next(P.fasta2inputs(FASTA, num_pseudo_msa=2, num_cycle=3))
    e32, n32, _ = M.omegafold_embed_scan(params, cfg, cycles)
    ebf, nbf, _ = M.omegafold_embed_scan(params, cfg, cycles,
                                         dtype=jnp.bfloat16)
    assert ebf.dtype == jnp.float32 and nbf.dtype == jnp.float32
    scale = float(np.abs(np.asarray(n32)).mean()) + 1e-6
    assert float(np.abs(np.asarray(nbf) - np.asarray(n32)).mean()) < 0.1 * scale
    escale = float(np.abs(np.asarray(e32)).mean()) + 1e-6
    assert float(np.abs(np.asarray(ebf) - np.asarray(e32)).mean()) < 0.1 * escale


@pytest.mark.skipif(not ref_available, reason="reference not mounted")
def test_fold_structure_output_and_pdb(tmp_path):
    """return_structure surfaces the fold result the vendored reference
    computes-then-drops: pos14/plddt of the most-confident cycle. The scan
    and loop variants must agree, and the fold() pipeline must write a PDB
    that parses back with matching CA coordinates."""
    from dynamicpdb_tpu.analysis.pdb_io import read_pdb, write_pdb
    from dynamicpdb_tpu.fold_cli import fold

    ref = _build_ref()
    params, cfg = M.params_from_torch(ref)
    _, cycles = next(P.fasta2inputs(FASTA, num_pseudo_msa=2, num_cycle=2))

    e1, n1, c1, s_loop = M.omegafold_embed(
        params, cfg, cycles, jit=True, return_structure=True
    )
    e2, n2, c2, s_scan = M.omegafold_embed_scan(
        params, cfg, cycles, return_structure=True
    )
    np.testing.assert_allclose(np.asarray(s_scan["pos14"]),
                               np.asarray(s_loop["pos14"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_scan["plddt"]),
                               np.asarray(s_loop["plddt"]), atol=1e-5)
    plddt = np.asarray(s_loop["plddt"])
    assert plddt.shape == (16,) and (plddt >= 0).all() and (plddt <= 1).all()
    assert np.isfinite(np.asarray(s_loop["pos14"])).all()
    # the 3-tuple API is unchanged
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-5)

    # full fold pipeline -> PDB roundtrip
    name, result = next(fold(FASTA, params, cfg, num_cycles=2,
                             num_pseudo_msa=2))
    pdb = tmp_path / f"{name}.pdb"
    b = np.broadcast_to((result["plddt"] * 100.0)[:, None],
                        result["atom37_mask"].shape)
    write_pdb(str(pdb), result["atom37"], result["aatype"],
              atom37_mask=result["atom37_mask"], b_factors=np.asarray(b))
    atom37, mask, aatype, _ = read_pdb(str(pdb))
    assert (aatype == result["aatype"]).all()
    ca = np.asarray(result["atom37"][:, 1])
    np.testing.assert_allclose(atom37[:, 1], ca, atol=1e-2)  # PDB has 3 dp


@pytest.mark.skipif(not ref_available, reason="reference not mounted")
def test_fold_rejects_gap_tokens():
    """'-' tokenizes to 21, outside the atom tables / PDB writer domain —
    fold() must fail fast with a clear message, not after the compute."""
    from dynamicpdb_tpu.fold_cli import fold

    ref = _build_ref()
    params, cfg = M.params_from_torch(ref)
    gap_fasta = [">g\n", "MKTA-YIAK\n"]
    with pytest.raises(ValueError, match="gap"):
        next(fold(gap_fasta, params, cfg, num_cycles=1, num_pseudo_msa=1))
