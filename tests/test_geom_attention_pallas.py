"""Fused Pallas GeometricAttention (ops/pallas/geom_attention.py): kernel
parity vs the dense reference formulas, and the geoformer flash=True path vs
flash=False (the torch-parity-proven path). Runs the same kernel code via
the Pallas interpreter on CPU."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynamicpdb_tpu.models.omegafold import geoformer as G
from dynamicpdb_tpu.models.omegafold.core import attention
from dynamicpdb_tpu.ops.pallas.geom_attention import (
    MAX_FLASH_RES,
    fused_gated_geom_attention,
)

RNG = np.random.default_rng(11)


def _rand_params(d, c, h, key=1):
    ks = jax.random.split(jax.random.PRNGKey(key), 8)
    return G.GeomAttnParams(
        linear_b_w=jax.random.normal(ks[0], (d, 2, h)) * 0.2,
        linear_b_b=jax.random.normal(ks[1], (2, h, 1, 1)) * 0.2,
        act_w=jax.random.normal(ks[2], (d, 2, 5 * d)) * 0.2,
        act_b=jax.random.normal(ks[3], (2, 5 * d)) * 0.2,
        out_proj_w=jax.random.normal(ks[4], (2, d, d)) * 0.2,
        out_proj_b=jax.random.normal(ks[5], (2, d)) * 0.2,
        attn=G.AttnParams(
            qg_weights=jax.random.normal(ks[6], (d, 2, h, 2 * c)) * 0.2,
            qg_bias=jax.random.normal(ks[7], (2, h, 1, 2 * c)) * 0.1,
            kv_weights=jax.random.normal(ks[0], (d, 2, h, 2 * c)) * 0.2,
            kv_bias=jax.random.normal(ks[1], (2, h, 1, 2 * c)) * 0.1,
            o_weights=jax.random.normal(ks[2], (2, h, c, d)) * 0.2,
            o_bias=jnp.zeros((d, 2)),
        ),
    )


def test_kernel_matches_dense_gated_attention():
    """Kernel output (projections + biased softmax + gating fused) vs the
    dense einsum/attention sequence it replaces."""
    B = L = 8
    d, c, h = 6, 4, 2
    p = _rand_params(d, c, h).attn
    stacked = jnp.asarray(RNG.normal(size=(B, L, d, 2)).astype(np.float32))
    bias = jnp.asarray(RNG.normal(size=(2, h, L, L)).astype(np.float32))
    got = fused_gated_geom_attention(
        stacked, p.qg_weights, p.qg_bias, p.kv_weights, p.kv_bias, bias,
        c=c, scale=c ** (-0.5),
    )
    qg = jnp.einsum("...qar,arhc->...rhqc", stacked, p.qg_weights) + p.qg_bias
    kv = jnp.einsum("...kar,arhc->...rhkc", stacked, p.kv_weights) + p.kv_bias
    ref, _ = attention(qg[..., :c], kv[..., :c], c ** (-0.5), kv[..., c:],
                       bias)
    ref = ref * jax.nn.sigmoid(qg[..., c:])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_geometric_attention_flash_equals_dense():
    """flash=True through the full GeometricAttention (stacked two-axis
    attention + gating + projections + triangle branch) equals dense."""
    L, d, c, h = 8, 6, 4, 2
    p = _rand_params(d, c, h)
    edge = jnp.asarray(RNG.normal(size=(L, L, d)).astype(np.float32))
    mask = jnp.ones((L,), jnp.float32)
    dense = G.geometric_attention(p, edge, mask, c=c, n_head=h, flash=False)
    flash = G.geometric_attention(p, edge, mask, c=c, n_head=h, flash=True)
    np.testing.assert_allclose(
        np.asarray(flash), np.asarray(dense), atol=2e-5
    )


def test_flash_falls_back_to_dense_beyond_max_res():
    """L > MAX_FLASH_RES silently uses the dense path (no kernel error)."""
    L, d, c, h = 8, 6, 4, 2
    p = _rand_params(d, c, h)
    edge = jnp.asarray(RNG.normal(size=(L, L, d)).astype(np.float32))
    mask = jnp.ones((L,), jnp.float32)
    import dynamicpdb_tpu.ops.pallas.geom_attention as K

    orig = K.MAX_FLASH_RES
    try:
        K.MAX_FLASH_RES = 4  # force the fallback branch
        out = G.geometric_attention(p, edge, mask, c=c, n_head=h, flash=True)
    finally:
        K.MAX_FLASH_RES = orig
    dense = G.geometric_attention(p, edge, mask, c=c, n_head=h, flash=False)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(dense))


def test_kernel_rejects_oversize():
    L, d, c, h = MAX_FLASH_RES + 8, 4, 2, 1
    stacked = jnp.zeros((2, L, d, 2))
    w = jnp.zeros((d, 2, h, 2 * c))
    b = jnp.zeros((2, h, 1, 2 * c))
    with pytest.raises(ValueError):
        fused_gated_geom_attention(
            stacked, w, b, w, b, jnp.zeros((2, h, L, L)), c=c, scale=1.0
        )


def test_attention_w_edge_bias_flash_equals_dense():
    """flash path of AttentionWEdgeBias (per-row key masks kept separate
    from the shared edge bias) equals the dense path, including partial
    pseudo-MSA masks."""
    M, L, d, de, c, h = 3, 8, 6, 5, 4, 2
    ks = jax.random.split(jax.random.PRNGKey(2), 8)
    p = G.AttnWEdgeBiasParams(
        proj_edge_w=jax.random.normal(ks[0], (de, h)) * 0.3,
        proj_edge_b=jax.random.normal(ks[1], (h,)) * 0.3,
        attn=G.AttnParams(
            qg_weights=jax.random.normal(ks[2], (d, 1, h, 2 * c)) * 0.3,
            qg_bias=jax.random.normal(ks[3], (1, h, 1, 2 * c)) * 0.1,
            kv_weights=jax.random.normal(ks[4], (d, 1, h, 2 * c)) * 0.3,
            kv_bias=jax.random.normal(ks[5], (1, h, 1, 2 * c)) * 0.1,
            o_weights=jax.random.normal(ks[6], (1, h, c, d)) * 0.3,
            o_bias=jax.random.normal(ks[7], (d, 1)) * 0.1,
        ),
    )
    node = jnp.asarray(RNG.normal(size=(M, L, d)).astype(np.float32))
    edge = jnp.asarray(RNG.normal(size=(L, L, de)).astype(np.float32))
    mask = np.ones((M, L), np.float32)
    mask[1, 5:] = 0  # partial row mask
    mask[2, :2] = 0
    mask = jnp.asarray(mask)
    dense = G.attention_w_edge_bias(p, node, edge, mask, c=c, flash=False)
    flash = G.attention_w_edge_bias(p, node, edge, mask, c=c, flash=True)
    np.testing.assert_allclose(
        np.asarray(flash), np.asarray(dense), atol=2e-5
    )
