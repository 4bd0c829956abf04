"""k-nearest-neighbor search and three_nn — pure-XLA reference implementation.

three_nn semantics follow the lineage CUDA kernel (SURVEY.md §2.1,
pointnet2/_ext_src/src/interpolate_gpu.cu): 3 nearest supports per query,
distance ties broken toward the lower support index (`lax.top_k` breaks ties
the same way). Masked (invalid) support points sit at +inf distance.

Large support sets (SURVEY.md:104 "tiled variant for 40k+ pts", VERDICT r1
#5) run BLOCKWISE: the support axis is scanned in slabs with a running
best-k merge, so the full [M,N] distance matrix never materializes —
O(B·M·slab) memory at any N, same blockwise-N story as ball_query's
_SLAB_LIMIT. Tie-breaking stays lower-index because slabs are visited in
index order and the running best is concatenated BEFORE the new slab's
candidates (top_k prefers earlier positions on ties).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu3dsad.ops.xla.common import pairwise_sqdist, valid_mask

# cap on B*M*slab elements of the per-slab distance matrix (~1GB fp32)
_SLAB_LIMIT = 1 << 28


def _knn_direct(query, support, k, valid):
    d2 = pairwise_sqdist(query, support)  # [B, M, N]
    d2 = jnp.where(valid[:, None, :], d2, jnp.inf)
    neg_top, idx = jax.lax.top_k(-d2, k)
    return -neg_top, idx.astype(jnp.int32)


def _knn_chunked(query, support, k, valid):
    """Scan support slabs, merging a running best-k. Exact, O(B·M·S) mem."""
    B, M = query.shape[:2]
    N = support.shape[1]
    s = max(k, _SLAB_LIMIT // max(B * M, 1))
    n_chunks = -(-N // s)
    pad = n_chunks * s - N
    sup = jnp.pad(support, ((0, 0), (0, pad), (0, 0)))
    val = jnp.pad(valid, ((0, 0), (0, pad)))
    # [n_chunks, B, s, ...] slabs in index order + their global offsets
    sup = sup.reshape(B, n_chunks, s, 3).transpose(1, 0, 2, 3)
    val = val.reshape(B, n_chunks, s).transpose(1, 0, 2)
    offsets = jnp.arange(n_chunks, dtype=jnp.int32) * s

    def body(carry, slab):
        best_d, best_i = carry  # [B,M,k]
        chunk, cval, off = slab
        d2 = pairwise_sqdist(query, chunk)
        d2 = jnp.where(cval[:, None, :], d2, jnp.inf)
        nd, ci = jax.lax.top_k(-d2, k)
        cand_d = jnp.concatenate([best_d, -nd], axis=-1)  # best first: ties
        cand_i = jnp.concatenate([best_i, ci.astype(jnp.int32) + off], -1)
        nb, sel = jax.lax.top_k(-cand_d, k)
        return (-nb, jnp.take_along_axis(cand_i, sel, axis=-1)), None

    init = (
        jnp.full((B, M, k), jnp.inf, jnp.float32),
        jnp.zeros((B, M, k), jnp.int32),
    )
    (d, i), _ = jax.lax.scan(body, init, (sup, val, offsets))
    return d, i


def knn(
    query: jnp.ndarray,
    support: jnp.ndarray,
    k: int,
    support_mask: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """query [B,M,3], support [B,N,3] -> (d2 [B,M,k], idx [B,M,k] int32)."""
    B, N, _ = support.shape
    M = query.shape[1]
    valid = valid_mask(support_mask, (B, N))
    if B * M * N <= _SLAB_LIMIT:
        return _knn_direct(query, support, k, valid)
    return _knn_chunked(query, support, k, valid)


def three_nn(
    query: jnp.ndarray,
    support: jnp.ndarray,
    support_mask: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """3-NN used by feature propagation. Returns (d2 [B,M,3], idx [B,M,3])."""
    return knn(query, support, 3, support_mask)
