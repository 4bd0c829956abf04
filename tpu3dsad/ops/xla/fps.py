"""Furthest point sampling — pure-XLA reference implementation.

Semantics match the lineage CUDA kernel (SURVEY.md §2.1,
pointnet2/_ext_src/src/sampling_gpu.cu): start at index 0, then npoint-1
iterations of "update running min-distance to the chosen set, pick the
argmax" with ties broken toward the lower index. Padded (mask=False) points
carry -inf running distance so they can never be selected.

The loop is a `lax.fori_loop` over the sample count with the [B, N] running
distance vector as carry — one fused XLA program, no host round-trips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu3dsad.ops.xla.common import valid_mask


def furthest_point_sample(
    xyz: jnp.ndarray, npoint: int, mask: jnp.ndarray | None = None
) -> jnp.ndarray:
    """xyz [B, N, 3] (+mask [B, N]) -> idx [B, npoint] int32."""
    B, N, _ = xyz.shape
    xyz = xyz.astype(jnp.float32)
    valid = valid_mask(mask, (B, N))

    # Running min squared distance to the selected set; padded points -inf.
    dist0 = jnp.where(valid, jnp.inf, -jnp.inf)
    idx0 = jnp.zeros((B, npoint), jnp.int32)  # seed index 0, like the kernel
    last0 = xyz[:, 0, :]

    def body(i, carry):
        dist, last, idx = carry
        d2 = jnp.sum((xyz - last[:, None, :]) ** 2, axis=-1)  # [B, N]
        dist = jnp.minimum(dist, jnp.where(valid, d2, -jnp.inf))
        nxt = jnp.argmax(dist, axis=-1).astype(jnp.int32)  # ties -> low index
        idx = jax.lax.dynamic_update_slice_in_dim(
            idx, nxt[:, None], i, axis=1
        )
        last = jnp.take_along_axis(xyz, nxt[:, None, None], axis=1)[:, 0, :]
        return dist, last, idx

    _, _, idx = jax.lax.fori_loop(1, npoint, body, (dist0, last0, idx0))
    return idx
