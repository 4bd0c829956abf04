"""Masked reductions — the padding discipline of the shape-static rebuild.

SURVEY.md §7 hard part #2: padded points must never win an argmax, join a
ball, or pollute a max-pool. These helpers centralize the sentinel
convention: -inf for max-pools, 0-weight for means. An all-invalid group
max-pools to 0 (not -inf) so empty proposal groups stay finite.
"""

from __future__ import annotations

import jax.numpy as jnp

NEG_INF = -1e30  # finite sentinel: keeps bf16/fp32 arithmetic NaN-free


def masked_max(x: jnp.ndarray, mask: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Max over `axis` counting only mask=True slots; all-invalid -> 0."""
    mask = jnp.expand_dims(mask, -1) if mask.ndim == x.ndim - 1 else mask
    filled = jnp.where(mask, x, NEG_INF)
    out = jnp.max(filled, axis=axis)
    any_valid = jnp.any(mask, axis=axis)
    return jnp.where(any_valid, out, 0.0)


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Mean over `axis` counting only mask=True slots; all-invalid -> 0."""
    mask = jnp.expand_dims(mask, -1) if mask.ndim == x.ndim - 1 else mask
    m = mask.astype(x.dtype)
    total = jnp.sum(x * m, axis=axis)
    cnt = jnp.maximum(jnp.sum(m, axis=axis), 1.0)
    return total / cnt
