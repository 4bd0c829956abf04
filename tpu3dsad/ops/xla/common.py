"""Shared helpers for the XLA point ops."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_sqdist(
    a: jnp.ndarray, b: jnp.ndarray, exact: bool = True
) -> jnp.ndarray:
    """Squared euclidean distances between two point sets.

    a: [..., M, 3], b: [..., N, 3] -> [..., M, N].

    Uses the |a|^2 + |b|^2 - 2 a.b^T expansion so the inner product lands on
    the MXU, and clamps at zero against catastrophic cancellation.

    exact=True → Precision.HIGHEST: radius thresholds are compared in fp32
    downstream; the TPU default (bf16 multiplies) flips in/out-of-ball
    decisions near the boundary. The contraction dim is 3, so full precision
    is cheap. exact=False (fast-grouping mode) uses the bf16 default —
    boundary membership noise ~1e-2 relative, harmless to max-pooled groups.
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)  # [..., M, 1]
    b2 = jnp.sum(b * b, axis=-1, keepdims=True)  # [..., N, 1]
    cross = jnp.einsum(
        "...mc,...nc->...mn",
        a,
        b,
        preferred_element_type=jnp.float32,
        precision=(
            jax.lax.Precision.HIGHEST if exact else jax.lax.Precision.DEFAULT
        ),
    )
    d2 = a2 + jnp.swapaxes(b2, -1, -2) - 2.0 * cross
    return jnp.maximum(d2, 0.0)


def valid_mask(mask, batch_shape_n, dtype=jnp.bool_):
    """Normalize an optional [B, N] validity mask to bool, defaulting to all-valid."""
    if mask is None:
        return jnp.ones(batch_shape_n, dtype=dtype)
    return mask.astype(dtype)
