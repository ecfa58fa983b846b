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
    """(x - mean) / sqrt(var + 1e-4) with mean/var over all REAL elements,
    unbiased variance — exact MyLayerNorm semantics on unpadded tensors.
    Statistics always in float32 (stable under bf16 activations).

    mask ([..., N], broadcastable over x's leading dims) excludes padded
    residues from the statistics. The reference's MyLayerNorm only ever
    sees unpadded tensors; with fixed-shape TPU padding, pad rows carry
    bias-derived constants whose count scales with pad_to — without
    masking, real-residue outputs would depend on the padding size
    (round-3 review finding; regression: tests/test_pad_invariance.py::
    test_model_forward_pad_invariant). With mask=None or all-ones this is
    bit-equivalent to the reference statistics up to summation order.
    """

    eps: float = 1e-4

    @nn.compact
    def __call__(self, x, mask=None):
        x32 = x.astype(jnp.float32)
        if mask is None:
            mean = jnp.mean(x32)
            n = x.size
            var = jnp.sum((x32 - mean) ** 2) / jnp.maximum(n - 1, 1)
        else:
            m = jnp.broadcast_to(
                mask.astype(jnp.float32)[..., None], x32.shape
            )
            n = jnp.sum(m)
            mean = jnp.sum(x32 * m) / jnp.maximum(n, 1.0)
            var = jnp.sum((x32 - mean) ** 2 * m) / jnp.maximum(n - 1.0, 1.0)
        return ((x32 - mean) / jnp.sqrt(var + self.eps)).astype(x.dtype)


class MLPEmbedder(nn.Module):
    """Linear -> SiLU -> Linear -> GlobalStatNorm -> SiLU
    (the force/vel/index/rigid/angle embedders, ipa_pytorch_dynamic.py:757-796)."""

    features: int
    dtype: object = None

    @nn.compact
    def __call__(self, x, mask=None):
        x = Linear(self.features, "torch", dtype=self.dtype)(x)
        x = nn.silu(x)
        x = Linear(self.features, "torch", dtype=self.dtype)(x)
        x = GlobalStatNorm()(x, mask=mask)
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
    def __call__(self, x, mask=None):
        """mask ([F, N]) re-zeroes pad rows after EVERY conv: each 5x5
        SAME conv writes bias-derived values into pad rows, and the next
        conv would bleed them back into boundary real residues — with the
        mask, every conv input is zero at pad rows, so real-row outputs
        are identical for any pad_to (including none). No-op on unpadded
        input."""
        z = None if mask is None else mask[..., None].astype(x.dtype)

        def m(v):
            return v if z is None else v * z

        h = m(x)
        for i in range(4):
            r = _Conv5x5(self.dim // 2, dtype=self.dtype,
                         name=f"Conv_{2 * i}")(h)
            r = m(nn.relu(r))
            r = _Conv5x5(self.dim, dtype=self.dtype,
                         name=f"Conv_{2 * i + 1}")(r)
            r = m(nn.relu(r))
            h = h + r
        return h


# NOTE: the reference also defines StructureModuleTransition (:175),
# EdgeTransition (:200), timestep_embedding and index_embedding
# (src/model/utils.py) — all DEAD on its active DFOLDv2 path (proven by
# weight-transfer parity: every used parameter is mapped and outputs match
# to <=1e-5, tools/parity_model.py). They are intentionally not mirrored
# here; a round-3 review found the previous dead mirrors harbored a latent
# ZeroDivisionError no test could ever reach.


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
