"""Ball query — pure-XLA reference implementation.

Reproduces the lineage CUDA semantics (SURVEY.md §2.1,
pointnet2/_ext_src/src/ball_query_gpu.cu): for each center, the first K
points (in index scan order 0..N-1) with squared distance < radius^2; slots
past the hit count are padded with the FIRST hit's index; an empty ball
yields all-zero indices.

Vectorized first-K-in-order selection without sorting: score each in-ball
point by (N - its index) and take `lax.top_k` — descending scores are exactly
ascending scan order, scores are distinct, misses score 0.

Fast mode (exact=False): `lax.top_k` on TPU costs ~K passes over N (376 of
the 394ms of a 2048×20480×K64 ball query, measured); `lax.approx_max_k`
is the TPU-native single-pass selector, applied to the same scan-order
score. Membership stays radius-thresholded; WHICH K of the in-ball points
fill the slots can differ slightly (~99.9%% recall) — a max-pool over the
group is insensitive to that. Exact mode remains the parity tier.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu3dsad.ops.xla.common import pairwise_sqdist, valid_mask

import os

# fast-mode selector recall: lower is faster (0.8 ≈ -30%% selector time at
# b=32) and only drops members (never admits out-of-ball points); learning
# quality validated at 0.9 (docs/experiments)
_APPROX_RECALL = float(os.environ.get("TPU3DSAD_APPROX_RECALL", "0.9"))

# keep the [B, M_chunk, N] distance slab under ~256M elements (~1GB fp32);
# beyond that, centers are processed in serial chunks (blockwise-N story of
# SURVEY.md §5: the full M×N matrix never materializes at 120k-pt scale)
_SLAB_LIMIT = 1 << 28


def ball_query(
    xyz: jnp.ndarray,
    centers: jnp.ndarray,
    radius: float,
    nsample: int,
    mask: jnp.ndarray | None = None,
    exact: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """xyz [B,N,3], centers [B,M,3] -> (idx [B,M,K] int32, cnt [B,M] int32)."""
    B, N, _ = xyz.shape
    M = centers.shape[1]
    if B * M * N > _SLAB_LIMIT and M > 1:
        n_chunks = -(-(B * M * N) // _SLAB_LIMIT)
        mc = -(-M // n_chunks)
        n_chunks = -(-M // mc)
        pad = n_chunks * mc - M
        c = jnp.pad(centers, ((0, 0), (0, pad), (0, 0)))
        c = c.reshape(B, n_chunks, mc, 3).transpose(1, 0, 2, 3)

        def one(chunk):  # [B, mc, 3]
            return ball_query(xyz, chunk, radius, nsample, mask, exact)

        idx, cnt = jax.lax.map(one, c)  # [nc, B, mc, K], [nc, B, mc]
        idx = idx.transpose(1, 0, 2, 3).reshape(B, n_chunks * mc, nsample)
        cnt = cnt.transpose(1, 0, 2).reshape(B, n_chunks * mc)
        return idx[:, :M], cnt[:, :M]

    valid = valid_mask(mask, (B, N))
    k_eff = min(nsample, N)  # nsample may exceed N (CUDA pads w/ first hit)
    r2 = radius * radius

    if exact:
        # elementwise dx²+dy²+dz² in the SAME summation order as the Pallas
        # kernel, the numpy oracle, and the lineage CUDA. The MXU-friendly
        # |a|²+|b|²−2a·b expansion loses ~|a|²·2⁻²³ to cancellation on
        # off-origin scenes — enough to flip in/out-of-ball membership at
        # the boundary and break cross-tier equality. The exact tier's cost
        # is the K-pass top_k, not this fused broadcast-subtract-reduce.
        c = centers.astype(jnp.float32)
        x = xyz.astype(jnp.float32)
        dx = c[..., :, None, 0] - x[..., None, :, 0]
        dy = c[..., :, None, 1] - x[..., None, :, 1]
        dz = c[..., :, None, 2] - x[..., None, :, 2]
        d2 = dx * dx + dy * dy + dz * dz  # [B, M, N]
    else:
        d2 = pairwise_sqdist(centers, xyz, exact=False)  # [B, M, N]
    within = (d2 < r2) & valid[:, None, :]
    point_rank = jax.lax.broadcasted_iota(jnp.int32, within.shape, 2)
    score = jnp.where(within, N - point_rank, 0)  # distinct positive on hits

    if exact:
        top_vals, _ = jax.lax.top_k(score, k_eff)  # [B,M,k_eff], scan order
    else:
        # single-pass approx selection by the same scan-order score. (An
        # approx-NEAREST-K variant over -d2 measured ~15% slower end-to-end
        # — see docs/kernel_notes.md.)
        top_vals, _ = jax.lax.approx_max_k(
            score.astype(jnp.float32), k_eff, recall_target=_APPROX_RECALL
        )
        top_vals = top_vals.astype(jnp.int32)

    if k_eff < nsample:
        pad = jnp.zeros(top_vals.shape[:-1] + (nsample - k_eff,), top_vals.dtype)
        top_vals = jnp.concatenate([top_vals, pad], axis=-1)
    hit = top_vals > 0
    idx = jnp.where(hit, N - top_vals, 0).astype(jnp.int32)
    idx = jnp.where(hit, idx, idx[..., :1])  # pad with first hit (0 if ∅)
    if exact:
        cnt = jnp.minimum(jnp.sum(within, axis=-1), nsample).astype(jnp.int32)
    else:
        cnt = jnp.sum(hit, axis=-1).astype(jnp.int32)  # approx may drop hits
    return idx, cnt
