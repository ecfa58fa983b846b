import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynamicpdb_tpu.config import Config, IPAConfig, ModelConfig
from dynamicpdb_tpu.data.featurize import (
    diffuse_training_window,
    eval_init_window,
    featurize_window,
)
from dynamicpdb_tpu.data.synthetic import make_window
from dynamicpdb_tpu.diffusion.r3_diffuser import R3Config
from dynamicpdb_tpu.diffusion.se3_diffuser import SE3Config, SE3Diffuser
from dynamicpdb_tpu.diffusion.so3_diffuser import SO3Config
from dynamicpdb_tpu.models.score_network import DFoldScoreNetwork, score_forward

TINY_IPA = IPAConfig(
    c_s=16, c_z=8, c_hidden=8, no_heads=2, no_qk_points=2, no_v_points=3,
    num_blocks=2,
)
TINY_MODEL = ModelConfig(node_embed_size=16, edge_embed_size=8, ipa=TINY_IPA)
TINY_SE3 = SE3Config(
    so3=SO3Config(num_omega=100, num_sigma=50, cache_dir=None, series_L=100),
    r3=R3Config(coordinate_scaling=1.0),
)


@pytest.fixture(scope="module")
def setup():
    w = make_window(n_res=10, frame_time=3, seed=0)
    diffuser = SE3Diffuser(TINY_SE3)
    feats = featurize_window(jax.tree_util.tree_map(jnp.asarray, w))
    feats = diffuse_training_window(
        jax.random.PRNGKey(1), feats, diffuser, min_t=0.01
    )
    model = DFoldScoreNetwork(TINY_MODEL)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), feats)
    return w, diffuser, feats, model, params


@pytest.fixture(scope="module")
def jitted(setup):
    """Shared jitted forwards: one compile per program for the whole module
    (and across runs via the persistent compilation cache)."""
    _, diffuser, _, model, _ = setup
    japply = jax.jit(model.apply)
    jfwd = jax.jit(lambda p, f: score_forward(model, p, diffuser, f))
    return japply, jfwd


def test_output_shapes(setup, jitted):
    _, diffuser, feats, model, params = setup
    out = jitted[1](params, feats)
    F, N = feats["res_mask"].shape
    assert out["rigids"].shape == (F, N, 7)
    assert out["angles"].shape == (F, N, 7, 2)
    assert out["rot_score"].shape == (F, N, 3)
    assert out["trans_score"].shape == (F, N, 3)
    assert out["atom37"].shape == (F, N, 37, 3)
    assert out["atom14"].shape == (F, N, 14, 3)
    for v in jax.tree_util.tree_leaves(out):
        assert bool(jnp.all(jnp.isfinite(v)))


def test_zero_init_predicts_previous_frame(setup, jitted):
    """BackboneUpdate is zero-init, so at initialization the prediction slot
    must carry frame F-2 verbatim (the reference's RefAsPred baseline) —
    ref-cat conditioning (ipa_pytorch_dynamic.py:819) + zeroed updates."""
    _, _, feats, model, params = setup
    out = jitted[0](params, feats)
    np.testing.assert_allclose(
        np.asarray(out["rigids"][-1]), np.asarray(feats["rigids_0"][-2]), atol=1e-5
    )
    # reference frames pass through untouched
    np.testing.assert_allclose(
        np.asarray(out["rigids"][:-1]), np.asarray(feats["rigids_0"][:-1]), atol=1e-5
    )


def test_reference_frames_never_move_after_training_updates(setup, jitted):
    """Even with non-zero updates, frames 0..F-2 must stay clean."""
    _, diffuser, feats, model, params = setup
    # jam the update weights with noise
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    for k in flat:
        if "bb_update" in "/".join(map(str, k)):
            flat[k] = jnp.ones_like(flat[k]) * 0.05
    params2 = flax.traverse_util.unflatten_dict(flat)
    out = jitted[0](params2, feats)
    np.testing.assert_allclose(
        np.asarray(out["rigids"][:-1]), np.asarray(feats["rigids_0"][:-1]), atol=1e-5
    )
    # but the prediction frame did move
    assert np.abs(np.asarray(out["rigids"][-1] - feats["rigids_0"][-2])).max() > 1e-4


def test_score_conversion_at_perfect_prediction(setup):
    """If the network predicted the exact clean frames, its scores must equal
    the forward-marginal score targets (training consistency)."""
    w, diffuser, feats, model, params = setup
    from dynamicpdb_tpu.ops.rigid import Rigid

    init = Rigid.from_tensor_7(feats["rigids_t"])
    clean = Rigid.from_tensor_7(feats["rigids_0"])
    rot_score = diffuser.calc_rot_score(init.quat, clean.quat, feats["t"])
    np.testing.assert_allclose(
        np.asarray(rot_score), np.asarray(feats["rot_score"]), atol=5e-2, rtol=5e-2
    )
    trans_score = diffuser.calc_trans_score(
        init.trans, clean.trans, feats["t"][:, None, None], scale=True
    )
    np.testing.assert_allclose(
        np.asarray(trans_score), np.asarray(feats["trans_score"]), atol=1e-3
    )


def test_featurize_eval_init(setup):
    w, diffuser, _, _, _ = setup
    feats = featurize_window(jax.tree_util.tree_map(jnp.asarray, w))
    ev = eval_init_window(jax.random.PRNGKey(3), feats, diffuser)
    assert float(ev["t"][0]) == 1.0
    assert ev["rigids_t"].shape == feats["rigids_0"].shape


def test_masked_residues_do_not_leak(setup, jitted):
    """Zeroing res_mask on some residues: outputs on kept residues must be
    invariant to the masked residues' node inputs (attention masking)."""
    _, diffuser, feats, model, params = setup
    f1 = dict(feats)
    mask = jnp.ones_like(f1["res_mask"]).at[:, -2:].set(0.0)
    f1["res_mask"] = mask
    out1 = jitted[0](params, f1)

    f2 = dict(f1)
    f2["node_repr"] = f1["node_repr"].at[-2:].set(99.0)
    out2 = jitted[0](params, f2)
    # masked-node perturbation must not change kept-residue attention output;
    # conv mixes spatially, so compare only a strict-interior residue window
    np.testing.assert_allclose(
        np.asarray(out1["rigids"][:, :4]), np.asarray(out2["rigids"][:, :4]),
        atol=1e-4,
    )


def test_bfloat16_compute_dtype(setup, jitted):
    """bf16 mixed precision: geometry outputs stay float32 and close to the
    f32 path; atoms finite."""
    import dataclasses

    _, diffuser, feats, model, params = setup
    mbf = DFoldScoreNetwork(
        dataclasses.replace(TINY_MODEL, compute_dtype="bfloat16")
    )
    out32 = jitted[0](params, feats)
    outbf = jax.jit(mbf.apply)(params, feats)
    assert outbf["rigids"].dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(outbf["rigids"]), np.asarray(out32["rigids"]), atol=0.05
    )
    for v in jax.tree_util.tree_leaves(outbf):
        assert bool(jnp.all(jnp.isfinite(v.astype(jnp.float32))))


def test_dense_ipa_attention_bf16_inputs_f32_accumulate():
    """Mixed-precision contract of the attention of record (ipa.py): with
    bf16 q/k/v/bias/pair_z the logits, softmax, and all three outputs are
    computed/accumulated in f32 (preferred_element_type) — outputs are
    f32 dtype and close to the all-f32 result at bf16 input tolerance."""
    import math

    from dynamicpdb_tpu.models.ipa import dense_ipa_attention

    key = jax.random.PRNGKey(3)
    F, N, H, C, Pq, Pv, Dz = 2, 12, 2, 8, 2, 3, 4
    ks = jax.random.split(key, 8)
    q = jax.random.normal(ks[0], (F, N, H, C))
    k = jax.random.normal(ks[1], (F, N, H, C))
    v = jax.random.normal(ks[2], (F, N, H, C))
    qp = jax.random.normal(ks[3], (F, N, H, Pq, 3))
    kp = jax.random.normal(ks[4], (F, N, H, Pq, 3))
    vp = jax.random.normal(ks[5], (F, N, H, Pv, 3))
    bias = jax.random.normal(ks[6], (N, N, H))
    pz = jax.random.normal(ks[7], (N, N, Dz))
    mask = jnp.ones((F, N)).at[:, -3:].set(0.0)
    hw = jnp.ones((H,))
    cqk = math.sqrt(1.0 / (3 * C))

    o32 = dense_ipa_attention(q, k, v, qp, kp, vp, bias, pz, mask, hw, cqk)
    bf = jnp.bfloat16
    obf = dense_ipa_attention(
        q.astype(bf), k.astype(bf), v.astype(bf), qp, kp, vp,
        bias.astype(bf), pz.astype(bf), mask, hw, cqk,
    )
    for a32, abf in zip(o32, obf):
        assert abf.dtype == jnp.float32
        np.testing.assert_allclose(
            np.asarray(abf), np.asarray(a32), atol=0.08, rtol=0.05
        )


def test_batch_vmap_equals_independent_windows(setup):
    """B>1 semantics: our batch axis is vmap over INDEPENDENT windows, so a
    B=2 batch must reproduce two B=1 forwards exactly.

    Deliberate deviation from the reference at B>1 (documented in
    COVERAGE.md): the reference flattens [B, F, ...] -> [B*F, ...]
    (train:679-684) and then treats dim 0 as ONE frame window — its
    MyLayerNorm couples statistics across windows (ipa_pytorch_dynamic.py:
    709-724), rigid_update[:-1] *= 0 freezes every frame except the LAST
    window's last frame (:869), and the trans loss covers only that global
    last frame (train:1248). Those semantics are only coherent at per-device
    B=1, which is exactly the reference's release config (global batch 4
    over 4 GPUs). vmap is the faithful generalization.
    """
    w0, diffuser, _, model, params = setup
    w1 = make_window(n_res=10, frame_time=3, seed=42)

    def fwd(raw, key):
        feats = featurize_window(jax.tree_util.tree_map(jnp.asarray, raw))
        feats = diffuse_training_window(key, feats, diffuser, min_t=0.01)
        return score_forward(model, params, diffuser, feats)

    jf = jax.jit(fwd)
    k0, k1 = jax.random.split(jax.random.PRNGKey(7))
    solo = [jf(w0, k0), jf(w1, k1)]

    batch = {
        k: jnp.stack([jnp.asarray(w0[k]), jnp.asarray(w1[k])])
        for k in w0
    }

    def window_fwd(raw, key):
        feats = featurize_window(raw)
        feats = diffuse_training_window(key, feats, diffuser, min_t=0.01)
        return score_forward(model, params, diffuser, feats)

    batched = jax.jit(jax.vmap(window_fwd))(batch, jnp.stack([k0, k1]))
    for name in ("rigids", "rot_score", "trans_score", "atom37"):
        for b in range(2):
            np.testing.assert_allclose(
                np.asarray(batched[name][b]), np.asarray(solo[b][name]),
                atol=5e-5, err_msg=f"{name}[{b}]",
            )


def test_small_f_conv_matches_generic():
    """The unfolded small-F conv path must equal the generic 5x5 SAME conv
    bit-for-bit semantics (it replaces nn.Conv in ConvNet)."""
    from dynamicpdb_tpu.models.layers import _small_f_conv5x5

    rng = np.random.default_rng(0)
    for F, N, Ci, Co in ((2, 16, 12, 8), (3, 9, 6, 10), (1, 7, 4, 4)):
        x = jnp.asarray(rng.normal(size=(F, N, Ci)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(5, 5, Ci, Co)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(Co,)), jnp.float32)
        got = _small_f_conv5x5(x, k, b)
        ref = jax.lax.conv_general_dilated(
            x[None], k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0] + b
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
