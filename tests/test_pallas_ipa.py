"""Parity tests for the fused Pallas IPA attention kernel (interpret mode on
CPU; the same kernel compiles for TPU via Mosaic)."""
import math

import numpy as np
import pytest
# compile/oracle-heavy on a 1-core host (measured, Makefile header):
# run via `make heavy`; excluded from the default `make test` tier
pytestmark = pytest.mark.heavy

import jax
import jax.numpy as jnp

from dynamicpdb_tpu.ops.pallas.ipa_attention import fused_ipa_attention

RNG = np.random.default_rng(0)


def _setup(F=2, N=16, H=2, C=8, Pq=4, Pv=6, Dz=4, masked=3):
    f32 = lambda *s: jnp.asarray(RNG.normal(size=s), jnp.float32)
    data = dict(
        q=f32(F, N, H, C), k=f32(F, N, H, C), v=f32(F, N, H, C),
        q_pts=f32(F, N, H, Pq, 3), k_pts=f32(F, N, H, Pq, 3),
        v_pts=f32(F, N, H, Pv, 3),
        bias=f32(N, N, H), pair_z=f32(N, N, Dz),
        mask=jnp.ones((F, N)).at[:, N - masked :].set(0.0) if masked else jnp.ones((F, N)),
        head_weights=jnp.asarray(RNG.uniform(0.3, 1.0, H), jnp.float32),
    )
    return data, math.sqrt(1.0 / (3 * C))


def _reference(d, c_qk, inf=1e5):
    a = jnp.einsum("fihc,fjhc->fhij", d["q"], d["k"]) * c_qk
    a = a + math.sqrt(1 / 3) * jnp.transpose(d["bias"], (2, 0, 1))[None]
    disp = d["q_pts"][:, :, None] - d["k_pts"][:, None]
    pt = jnp.einsum("fijhp->fhij", jnp.sum(disp**2, -1))
    a = a + (-0.5) * d["head_weights"][None, :, None, None] * pt
    m = d["mask"]
    a = a + inf * (m[:, :, None] * m[:, None, :] - 1)[:, None]
    a = jax.nn.softmax(a, -1)
    return (
        jnp.einsum("fhij,fjhc->fihc", a, d["v"]),
        jnp.einsum("fhij,fjhpx->fihpx", a, d["v_pts"]),
        jnp.einsum("fhij,ijd->fihd", a, d["pair_z"]),
    )


@pytest.mark.parametrize("blk", [8, 16])
def test_fused_ipa_matches_reference(blk):
    d, c_qk = _setup()
    o, o_pt, o_pair = fused_ipa_attention(
        d["q"], d["k"], d["v"], d["q_pts"], d["k_pts"], d["v_pts"],
        d["bias"], d["pair_z"], d["mask"], d["head_weights"],
        c_qk=c_qk, blk_q=blk, blk_k=blk, interpret=True,
    )
    o_ref, o_pt_ref, o_pair_ref = _reference(d, c_qk)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), atol=3e-6)
    np.testing.assert_allclose(np.asarray(o_pt), np.asarray(o_pt_ref), atol=3e-6)
    np.testing.assert_allclose(np.asarray(o_pair), np.asarray(o_pair_ref), atol=3e-6)


def test_fused_ipa_online_softmax_stability():
    """Large logits: online softmax must not overflow."""
    d, c_qk = _setup(masked=0)
    d["q"] = d["q"] * 100.0
    o, *_ = fused_ipa_attention(
        d["q"], d["k"], d["v"], d["q_pts"], d["k_pts"], d["v_pts"],
        d["bias"], d["pair_z"], d["mask"], d["head_weights"],
        c_qk=c_qk, blk_q=8, blk_k=8, interpret=True,
    )
    assert bool(jnp.all(jnp.isfinite(o)))
    o_ref, *_ = _reference(d, c_qk)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), atol=1e-5)


def test_model_with_pallas_attention_matches_jnp():
    """Full score-network forward with use_pallas_attention (interpret)."""
    import dataclasses

    from dynamicpdb_tpu.data.featurize import diffuse_training_window, featurize_window
    from dynamicpdb_tpu.data.synthetic import make_window
    from dynamicpdb_tpu.diffusion.se3_diffuser import SE3Diffuser
    from dynamicpdb_tpu.models.score_network import DFoldScoreNetwork
    from tests.test_model import TINY_MODEL, TINY_SE3

    w = make_window(n_res=16, frame_time=2, seed=5)
    diffuser = SE3Diffuser(TINY_SE3)
    feats = featurize_window(jax.tree_util.tree_map(jnp.asarray, w))
    feats = diffuse_training_window(jax.random.PRNGKey(1), feats, diffuser, 0.01)

    model_jnp = DFoldScoreNetwork(TINY_MODEL)
    params = jax.jit(model_jnp.init)(jax.random.PRNGKey(0), feats)
    out_jnp = jax.jit(model_jnp.apply)(params, feats)

    pallas_ipa = dataclasses.replace(
        TINY_MODEL.ipa, use_pallas_attention=True, pallas_interpret=True
    )
    model_pl = DFoldScoreNetwork(dataclasses.replace(TINY_MODEL, ipa=pallas_ipa))
    out_pl = jax.jit(model_pl.apply)(params, feats)

    np.testing.assert_allclose(
        np.asarray(out_pl["rigids"]), np.asarray(out_jnp["rigids"]), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_pl["angles"]), np.asarray(out_jnp["angles"]), atol=1e-4
    )


def test_fused_backward_matches_dense_grads():
    """The three-kernel flash backward reproduces autodiff-of-dense grads
    for every differentiable input (interpret mode)."""
    from dynamicpdb_tpu.ops.pallas.ipa_attention import ipa_attention

    d, c_qk = _setup(F=2, N=16, H=2, C=8, Pq=4, Pv=6, Dz=4, masked=3)
    args = (d["q"], d["k"], d["v"], d["q_pts"], d["k_pts"], d["v_pts"],
            d["bias"], d["pair_z"], d["mask"], d["head_weights"])
    # zero cotangents on masked rows: their outputs are padding means whose
    # gradients hit float32 cancellation of the +-1e5 mask bias (~0.4% —
    # measured identical pattern in the dense path); real rows match 1e-6
    row_m = d["mask"][:, :, None, None]
    w = [jnp.asarray(RNG.normal(size=x.shape), jnp.float32)
         * row_m.reshape(row_m.shape[:2] + (1,) * (x.ndim - 2))
         for x in _reference(d, c_qk)]

    def loss_fused(*a):
        o, o_pt, o_pair = ipa_attention(
            *a, c_qk, math.sqrt(1 / 3), 1e5, 8, 8, True, True
        )
        return (jnp.sum(o * w[0]) + jnp.sum(o_pt * w[1])
                + jnp.sum(o_pair * w[2]))

    def loss_dense(*a):
        names = ["q", "k", "v", "q_pts", "k_pts", "v_pts", "bias", "pair_z",
                 "mask", "head_weights"]
        o, o_pt, o_pair = _reference(dict(zip(names, a)), c_qk)
        return (jnp.sum(o * w[0]) + jnp.sum(o_pt * w[1])
                + jnp.sum(o_pair * w[2]))

    argnums = (0, 1, 2, 3, 4, 5, 6, 7, 9)  # everything except mask
    g_fused = jax.jit(jax.grad(loss_fused, argnums=argnums))(*args)
    g_dense = jax.jit(jax.grad(loss_dense, argnums=argnums))(*args)
    names = ["q", "k", "v", "q_pts", "k_pts", "v_pts", "bias", "pair_z",
             "head_weights"]
    for name, gf, gd in zip(names, g_fused, g_dense):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gd), atol=2e-4, err_msg=name
        )


def test_fused_backward_bf16_pair_grad_accumulates_in_f32():
    """dpz must be accumulated in f32 across the F*H grid revisits even when
    pair_z is bf16 (in-place bf16 += used to round away gradient mass each
    revisit); the returned grad still carries pair_z's dtype."""
    from dynamicpdb_tpu.ops.pallas.ipa_attention import ipa_attention

    d, c_qk = _setup(F=2, N=16, H=2, C=8, Pq=4, Pv=6, Dz=4, masked=0)

    def loss(pz, dtype):
        o, o_pt, o_pair = ipa_attention(
            d["q"], d["k"], d["v"], d["q_pts"], d["k_pts"], d["v_pts"],
            d["bias"], pz.astype(dtype), d["mask"], d["head_weights"],
            c_qk, math.sqrt(1 / 3), 1e5, 8, 8, True, True,
        )
        return jnp.sum(o.astype(jnp.float32) ** 2) + jnp.sum(
            o_pair.astype(jnp.float32) ** 2
        )

    g_bf16 = jax.jit(jax.grad(lambda pz: loss(pz, jnp.bfloat16)))(d["pair_z"])
    g_f32 = jax.jit(jax.grad(lambda pz: loss(pz, jnp.float32)))(d["pair_z"])
    # bf16 inputs quantize the forward, so compare at bf16-level tolerance;
    # without f32 accumulation the revisit rounding pushed errors well past
    # this
    np.testing.assert_allclose(
        np.asarray(g_bf16, np.float32), np.asarray(g_f32), atol=0.15, rtol=0.05
    )
