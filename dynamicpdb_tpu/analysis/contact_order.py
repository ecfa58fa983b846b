"""Contact matrix / contact order on C-alpha coordinates.

Equivalent of /root/reference/src/toolbox/calculate_contact_order.py:1-27 in
jnp: contact = pair distance below cutoff (excluding |i-j| < min_separation);
contact order = mean sequence separation of contacting pairs / N.
"""
from __future__ import annotations

import jax.numpy as jnp


def contact_matrix(ca: jnp.ndarray, cutoff: float = 8.0,
                   min_separation: int = 1) -> jnp.ndarray:
    """[..., N, 3] -> [..., N, N] boolean contact matrix."""
    d = jnp.linalg.norm(ca[..., :, None, :] - ca[..., None, :, :], axis=-1)
    n = ca.shape[-2]
    idx = jnp.arange(n)
    sep = jnp.abs(idx[:, None] - idx[None, :])
    return (d < cutoff) & (sep >= min_separation)


def contact_order(ca: jnp.ndarray, cutoff: float = 8.0,
                  min_separation: int = 1) -> jnp.ndarray:
    """Relative contact order in [0, 1]."""
    contacts = contact_matrix(ca, cutoff, min_separation)
    n = ca.shape[-2]
    idx = jnp.arange(n)
    sep = jnp.abs(idx[:, None] - idx[None, :]).astype(jnp.float32)
    total = jnp.sum(contacts, axis=(-1, -2))
    return jnp.sum(sep * contacts, axis=(-1, -2)) / (
        jnp.maximum(total, 1) * n
    )
