"""Fused GeometricAttention attended-branch for the OmegaFold GeoFormer
(Pallas/TPU).

Motivation (measured, tools/profile_geoformer.py + HLO at release dims
L=256): the attended branch materializes a [L, 2, H, L, L] f32 logits tensor
(537 MB) and streams it through separate dot / exp / divide fusions — >60%
of GeoFormer device time, which is itself 86% of an OmegaFold recycling
cycle. A first kernel fusing only logits+softmax+values was DMA-bound (one
tiny 32 KB transfer per (batch, head) cell) and barely beat XLA. This
version fuses the WHOLE gated attention for one batch row per grid cell:

    per cell b:  x = stacked[b]            [L, d, 2]   (one 256 KB read)
      for (r, h):  qg = x_r @ Wqg + bqg    (q | gate)
                   kv = x_r @ Wkv + bkv    (k | v)
                   out[r,h] = softmax(q k^T/sqrt(c) + bias[r,h]) v
                              * sigmoid(gate)

Projection weights (~1 MB) and the shared bias [2, H, L, L] stay resident in
VMEM across the whole grid (their index maps are constant), so HBM traffic
is just stacked-in + gated-out — the [L,2,H,L,L] logits and the projected
q/k/v/gate tensors never exist in HBM. The output projection
("...rhqc,rhco->...qor") remains outside (a single large XLA matmul).

Forward-only by design: the GeoFormer runs inference-only in this framework
(embedding extraction); differentiate the dense path instead
(geoformer.gated_attention with flash=False).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# bias [2, H, L, L] must stay VMEM-resident; past this many residues fall
# back to the dense XLA path (at large L the dense einsums are MXU-bound
# anyway, cf. the IPA kernel study in docs/DESIGN.md)
MAX_FLASH_RES = 512


def _kernel(x_ref, qg_w_ref, qg_b_ref, kv_w_ref, kv_b_ref, bias_ref, o_ref,
            *, scale, n_axis, n_head, c):
    for r in range(n_axis):
        x = x_ref[0, :, :, r].astype(jnp.float32)  # [L, d]
        for h in range(n_head):
            qg = jax.lax.dot_general(
                x, qg_w_ref[:, r, h, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + qg_b_ref[r, h]  # [L, 2c]
            kv = jax.lax.dot_general(
                x, kv_w_ref[:, r, h, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + kv_b_ref[r, h]
            q, gate = qg[:, :c], qg[:, c:]
            k, v = kv[:, :c], kv[:, c:]
            logits = jax.lax.dot_general(
                q * scale, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bias_ref[r, h].astype(jnp.float32)  # [L, L]
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            out = jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) / jnp.sum(p, axis=-1, keepdims=True)
            out = out * jax.nn.sigmoid(gate)
            o_ref[0, r, h] = out.astype(o_ref.dtype)


def fused_gated_geom_attention(stacked, qg_w, qg_b, kv_w, kv_b, bias, *,
                               c: int, scale, interpret: bool | None = None):
    """Gated two-axis attention of GeometricAttention, fully fused.

    stacked [B, L, d, n_axis] (B == L: each row attends within its row/col);
    qg_w/kv_w [d, n_axis, H, 2c]; qg_b/kv_b [n_axis, H, 1, 2c];
    bias [n_axis, H, L, L] shared over B. Returns the GATED attention output
    [B, n_axis, H, L, c] (pre output-projection), matching
    core.attention's softmax sequence + sigmoid gating to fp reassociation.

    interpret=None auto-selects the Pallas interpreter off-TPU (same code
    path testable on CPU).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, L, d, n_axis = stacked.shape
    H, two_c = qg_w.shape[2], qg_w.shape[3]
    assert two_c == 2 * c, (two_c, c)
    if L > MAX_FLASH_RES:
        raise ValueError(
            f"L={L} > MAX_FLASH_RES={MAX_FLASH_RES}; use the dense path"
        )

    qg_b = qg_b.reshape(n_axis, H, two_c)
    kv_b = kv_b.reshape(n_axis, H, two_c)
    kernel = functools.partial(
        _kernel, scale=scale, n_axis=n_axis, n_head=H, c=c
    )
    full = lambda *shape: pl.BlockSpec(shape, lambda b: (0,) * len(shape))
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, L, d, n_axis), lambda b: (b, 0, 0, 0)),
            full(d, n_axis, H, two_c),
            full(n_axis, H, two_c),
            full(d, n_axis, H, two_c),
            full(n_axis, H, two_c),
            full(n_axis, H, L, L),
        ],
        out_specs=pl.BlockSpec(
            (1, n_axis, H, L, c), lambda b: (b, 0, 0, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((B, n_axis, H, L, c), stacked.dtype),
        interpret=interpret,
    )(stacked, qg_w, qg_b, kv_w, kv_b, bias)
    return out
