"""Shared neural building blocks (flax.linen).

Mirrors the layer zoo of the reference's score model
(/root/reference/src/model/ipa_pytorch_dynamic.py:107-724 and openfold
structure_module AngleResnet) with AF2 initialization conventions:

  "default" — LeCun fan-in truncated normal
  "relu"    — He fan-in truncated normal
  "final"   — zeros (zero-init output layers)
  "glorot"  — Xavier uniform
  "gating"  — zero weights, ones bias

``GlobalStatNorm`` reproduces the reference's parameterless ``MyLayerNorm``
(ipa_pytorch_dynamic.py:709-724): normalization by the *global* mean/std over
the whole tensor (torch.var's unbiased estimator) — deliberately kept
batch-statistics-dependent for parity.
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.nn.initializers import variance_scaling, xavier_uniform, zeros

# AF2's truncated-normal correction: 1 / std of truncnorm(-2, 2)
_TRUNC_CORR = 0.87962566103423978

lecun_init = variance_scaling(1.0, "fan_in", "truncated_normal")
he_init = variance_scaling(2.0, "fan_in", "truncated_normal")
final_init = zeros
glorot_init = xavier_uniform()
normal_init = variance_scaling(1.0, "fan_in", "normal")
# torch.nn.Linear / Conv default (kaiming_uniform with a=sqrt(5))
torch_default_init = variance_scaling(1.0 / 3.0, "fan_in", "uniform")

INITS = {
    "default": lecun_init,
    "relu": he_init,
    "final": final_init,
    "glorot": glorot_init,
    "normal": normal_init,
    "torch": torch_default_init,
}


def Linear(features: int, init: str = "default", use_bias: bool = True,
           name=None, dtype=None):
    """Dense layer with AF2-style init selection; bias always zero-init.
    ``dtype`` is the computation dtype (params stay float32)."""
    return nn.Dense(
        features,
        use_bias=use_bias,
        kernel_init=INITS[init],
        bias_init=zeros,
        name=name,
        dtype=dtype,
    )


class GlobalStatNorm(nn.Module):
    """(x - mean) / sqrt(var + 1e-4) with mean/var over ALL elements,
    unbiased variance — exact MyLayerNorm semantics. Statistics always in
    float32 (stable under bf16 activations)."""

    eps: float = 1e-4

    @nn.compact
    def __call__(self, x):
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32)
        n = x.size
        var = jnp.sum((x32 - mean) ** 2) / jnp.maximum(n - 1, 1)
        return ((x32 - mean) / jnp.sqrt(var + self.eps)).astype(x.dtype)


class MLPEmbedder(nn.Module):
    """Linear -> SiLU -> Linear -> GlobalStatNorm -> SiLU
    (the force/vel/index/rigid/angle embedders, ipa_pytorch_dynamic.py:757-796)."""

    features: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        x = Linear(self.features, "torch", dtype=self.dtype)(x)
        x = nn.silu(x)
        x = Linear(self.features, "torch", dtype=self.dtype)(x)
        x = GlobalStatNorm()(x)
        return nn.silu(x)


def _small_f_conv5x5(x, kernel, bias):
    """5x5 SAME conv over the [F, N] grid, specialized for tiny F.

    With F << 5 the generic conv wastes >=(5-F)/5 of its MACs on zero pad
    rows and leaves the MXU with a height-F image; unfolding the N-axis
    windows instead turns each output frame into F large [N, 5C] @ [5C, O]
    matmuls (2.5x fewer MACs at F=2, far better tiling). Exactly equal to
    nn.Conv(..., (5, 5), padding='SAME') — see
    tests/test_model.py::test_small_f_conv_matches_generic.

    x: [F, N, Cin]; kernel: [5, 5, Cin, Cout] (HWIO); bias: [Cout].
    """
    F, N, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (2, 2), (0, 0)))
    # Xu[f, n, w, c] = xp[f, n + w, c], w in 0..4
    xu = jnp.stack([xp[:, d : d + N] for d in range(5)], axis=2)
    out = []
    for fo in range(F):
        acc = None
        for fi in range(F):
            kh = fi - fo + 2  # kernel row hit by input frame fi at output fo
            if not 0 <= kh < 5:
                continue
            term = jnp.einsum("nwc,wco->no", xu[fi], kernel[kh])
            acc = term if acc is None else acc + term
        out.append(acc)
    return jnp.stack(out) + bias


class _Conv5x5(nn.Module):
    """Drop-in for nn.Conv(features, (5, 5), SAME) with identical params
    (kernel [5, 5, in, out] + bias) so weight-transfer parity mappings are
    unchanged; dispatches to the unfolded small-F path when profitable."""

    features: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):  # x: [F, N, C]
        kernel = self.param(
            "kernel", torch_default_init, (5, 5, x.shape[-1], self.features),
            jnp.float32,
        )
        bias = self.param("bias", zeros, (self.features,), jnp.float32)
        dt = self.dtype or x.dtype
        x = x.astype(dt)
        k = kernel.astype(dt)
        b = bias.astype(dt)
        if x.shape[0] <= 3:
            return _small_f_conv5x5(x, k, b)
        out = jax.lax.conv_general_dilated(
            x[None], k, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0]
        return out + b


class ConvNet(nn.Module):
    """4 residual double-conv 5x5 blocks over the [F, N] grid
    (ipa_pytorch_dynamic.py:664-706). Input/output [F, N, C]; treats frames x
    residues as the spatial plane — the only cross-frame mixing in the model.
    """

    dim: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        h = x
        for i in range(4):
            r = _Conv5x5(self.dim // 2, dtype=self.dtype,
                         name=f"Conv_{2 * i}")(h)
            r = nn.relu(r)
            r = _Conv5x5(self.dim, dtype=self.dtype,
                         name=f"Conv_{2 * i + 1}")(r)
            r = nn.relu(r)
            h = h + r
        return h


class StructureModuleTransition(nn.Module):
    """3-layer residual MLP + LayerNorm (ipa_pytorch_dynamic.py:175-197)."""

    c: int

    @nn.compact
    def __call__(self, s):
        s0 = s
        s = nn.relu(Linear(self.c, "relu")(s))
        s = nn.relu(Linear(self.c, "relu")(s))
        s = Linear(self.c, "final")(s)
        return nn.LayerNorm()(s + s0)


class EdgeTransition(nn.Module):
    """Node-conditioned edge update (ipa_pytorch_dynamic.py:200-239)."""

    node_embed_size: int
    edge_embed_out: int
    num_layers: int = 2
    node_dilation: int = 2

    @nn.compact
    def __call__(self, node_embed, edge_embed):
        bias_size = self.node_embed_size // self.node_dilation
        node_embed = Linear(bias_size, "relu")(node_embed)
        num_res = node_embed.shape[-2]
        edge_bias = jnp.concatenate(
            [
                jnp.tile(node_embed[..., :, None, :], (1,) * (node_embed.ndim - 2) + (1, num_res, 1)),
                jnp.tile(node_embed[..., None, :, :], (1,) * (node_embed.ndim - 2) + (num_res, 1, 1)),
            ],
            axis=-1,
        )
        edge_embed = jnp.concatenate([edge_embed, edge_bias], axis=-1)
        h = edge_embed
        for _ in range(self.num_layers):
            h = nn.relu(Linear(edge_embed.shape[-1], "relu")(h))
        out = Linear(self.edge_embed_out, "final")(h + edge_embed)
        return nn.LayerNorm()(out)


class BackboneUpdate(nn.Module):
    """Zero-init Linear c -> 6 quaternion+translation update
    (ipa_pytorch_dynamic.py:575-602)."""

    @nn.compact
    def __call__(self, s):
        return Linear(6, "final")(s)


class AngleResnetBlock(nn.Module):
    c_hidden: int
    dtype: object = None

    @nn.compact
    def __call__(self, a):
        s = nn.relu(a)
        s = Linear(self.c_hidden, "relu", dtype=self.dtype)(s)
        s = nn.relu(s)
        s = Linear(self.c_hidden, "final", dtype=self.dtype)(s)
        return a + s


class AngleResnet(nn.Module):
    """AF2 Algorithm 20 lines 11-14 (openfold structure_module.py:75-160);
    used with c_in = c_hidden = 5*c_s, no_blocks=2, no_angles=7."""

    c_hidden: int
    no_blocks: int = 2
    no_angles: int = 7
    eps: float = 1e-12
    dtype: object = None

    @nn.compact
    def __call__(self, s, s_initial):
        s_initial = Linear(self.c_hidden, dtype=self.dtype)(nn.relu(s_initial))
        s = Linear(self.c_hidden, dtype=self.dtype)(nn.relu(s))
        s = s + s_initial
        for _ in range(self.no_blocks):
            s = AngleResnetBlock(self.c_hidden, dtype=self.dtype)(s)
        s = Linear(self.no_angles * 2)(nn.relu(s)).astype(jnp.float32)
        s = s.reshape(s.shape[:-1] + (self.no_angles, 2))
        unnormalized = s
        norm = jnp.sqrt(jnp.clip(jnp.sum(s**2, -1, keepdims=True), self.eps))
        return unnormalized, s / norm


def timestep_embedding(t, dim: int, max_positions: int = 10000):
    """Sinusoidal diffusion-time embedding (src/model/utils.py:46-59):
    t in [0,1] scaled by max_positions."""
    t = jnp.atleast_1d(t) * max_positions
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_positions) * jnp.arange(half, dtype=jnp.float32) / (half - 1)
    )
    args = t[:, None].astype(jnp.float32) * freqs[None]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def index_embedding(indices, embed_size: int, max_len: int = 2056):
    """Sinusoidal positional embedding over integer indices
    (src/model/utils.py:5-24)."""
    K = jnp.arange(embed_size // 2, dtype=jnp.float32)
    scale = indices[..., None].astype(jnp.float32) * jnp.pi / (
        max_len ** (2 * K[None] / embed_size)
    )
    return jnp.concatenate([jnp.sin(scale), jnp.cos(scale)], axis=-1)
