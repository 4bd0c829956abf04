"""k-nearest-neighbor search and three_nn — pure-XLA reference implementation.

three_nn semantics follow the lineage CUDA kernel (SURVEY.md §2.1,
pointnet2/_ext_src/src/interpolate_gpu.cu): 3 nearest supports per query,
distance ties broken toward the lower support index (`lax.top_k` breaks ties
the same way). Masked (invalid) support points sit at +inf distance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu3dsad.ops.xla.common import pairwise_sqdist, valid_mask


def knn(
    query: jnp.ndarray,
    support: jnp.ndarray,
    k: int,
    support_mask: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """query [B,M,3], support [B,N,3] -> (d2 [B,M,k], idx [B,M,k] int32)."""
    B, N, _ = support.shape
    valid = valid_mask(support_mask, (B, N))
    d2 = pairwise_sqdist(query, support)  # [B, M, N]
    d2 = jnp.where(valid[:, None, :], d2, jnp.inf)
    neg_top, idx = jax.lax.top_k(-d2, k)
    return -neg_top, idx.astype(jnp.int32)


def three_nn(
    query: jnp.ndarray,
    support: jnp.ndarray,
    support_mask: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """3-NN used by feature propagation. Returns (d2 [B,M,3], idx [B,M,3])."""
    return knn(query, support, 3, support_mask)
