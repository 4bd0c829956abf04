"""Point-dimension (N) sharding across chips — the CP/SP analogue, for real.

Implements the design in docs/context_parallel.md: the point axis of a
cloud is sharded over a mesh axis; each chip computes its local pairwise
slab, and per-center candidates are merged with one small `all_gather`
(M·K·p integers — tiny vs the N-sized tensors). Because shards partition N
contiguously and in order, global scan order == shard order, so the merged
result is EXACTLY the unsharded exact ball query / kNN (tested on the
8-virtual-device mesh).

Use when a single cloud exceeds one chip's HBM, or to parallelize the
quadratic grouping stage of very large outdoor scenes. Entry points take
GLOBAL arrays and a mesh; sharding/unsharding happens inside.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tpu3dsad.ops.xla.ball_query import ball_query as _local_ball_query
from tpu3dsad.ops.xla.common import pairwise_sqdist


def sharded_ball_query(
    xyz: jnp.ndarray,
    centers: jnp.ndarray,
    radius: float,
    nsample: int,
    mesh: Mesh,
    mask: jnp.ndarray | None = None,
    axis: str = "points",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact ball query with N sharded over `axis`.

    xyz [B,N,3] (N divisible by the axis size), centers [B,M,3] replicated.
    Returns (idx [B,M,K] int32 GLOBAL indices, cnt [B,M]) — bitwise equal to
    ops.ball_query(..., exact=True).
    """
    B, N, _ = xyz.shape
    p = mesh.shape[axis]
    shard_n = N // p
    if mask is None:
        mask = jnp.ones((B, N), bool)

    def local(xyz_l, mask_l, centers_l):
        # local exact first-K + count on this chip's contiguous N-shard
        idx_l, cnt_l = _local_ball_query(
            xyz_l, centers_l, radius, nsample, mask=mask_l, exact=True
        )
        shard = jax.lax.axis_index(axis)
        idx_g = idx_l + shard * shard_n  # globalize
        # gather every shard's candidates (tiny: [p, B, M, K])
        all_idx = jax.lax.all_gather(idx_g, axis)
        all_cnt = jax.lax.all_gather(cnt_l, axis)
        return _merge_scan_order(all_idx, all_cnt, nsample)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P()),
        out_specs=(P(), P()),
        check_vma=False,  # outputs are replicated by the all_gather merge
    )
    return fn(xyz, mask, centers)


def _merge_scan_order(all_idx, all_cnt, nsample):
    """Merge per-shard first-K candidate lists into global first-K.

    all_idx [p,B,M,K] (global indices, scan-ordered within shard),
    all_cnt [p,B,M]. Shards partition N contiguously, so concatenating in
    shard order preserves global scan order; take the first K valid.
    """
    p, B, M, K = all_idx.shape
    # [B, M, p*K] candidates in global scan order with validity
    cand = jnp.transpose(all_idx, (1, 2, 0, 3)).reshape(B, M, p * K)
    slot = jax.lax.broadcasted_iota(jnp.int32, (p, B, M, K), 3)
    valid = slot < all_cnt[..., None]
    valid = jnp.transpose(valid, (1, 2, 0, 3)).reshape(B, M, p * K)

    # first-K-valid selection via the same descending-score trick the exact
    # single-chip path uses (candidate count p*K is small)
    score = jnp.where(valid, p * K - jax.lax.broadcasted_iota(
        jnp.int32, valid.shape, 2), 0)
    top, pos = jax.lax.top_k(score, min(nsample, p * K))
    hit = top > 0
    sel = jnp.take_along_axis(cand, pos, axis=-1)
    idx = jnp.where(hit, sel, sel[..., :1])  # pad with first hit
    idx = jnp.where(jnp.any(hit, -1, keepdims=True), idx, 0)
    cnt = jnp.minimum(jnp.sum(valid, axis=-1), nsample).astype(jnp.int32)
    if idx.shape[-1] < nsample:
        pad = jnp.repeat(idx[..., :1], nsample - idx.shape[-1], -1)
        idx = jnp.concatenate([idx, pad], -1)
    return idx.astype(jnp.int32), cnt


def sharded_knn(
    query: jnp.ndarray,
    support: jnp.ndarray,
    k: int,
    mesh: Mesh,
    support_mask: jnp.ndarray | None = None,
    axis: str = "points",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact kNN with the support set sharded over `axis`.

    query [B,M,3] replicated, support [B,N,3] sharded. Returns
    (d2 [B,M,k], idx [B,M,k] global) == ops.knn(..., k)."""
    B, N, _ = support.shape
    p = mesh.shape[axis]
    shard_n = N // p
    if support_mask is None:
        support_mask = jnp.ones((B, N), bool)

    def local(sup_l, mask_l, q_l):
        d2 = pairwise_sqdist(q_l, sup_l)
        d2 = jnp.where(mask_l[:, None, :], d2, jnp.inf)
        k_eff = min(k, sup_l.shape[1])
        neg, idx_l = jax.lax.top_k(-d2, k_eff)
        shard = jax.lax.axis_index(axis)
        idx_g = idx_l + shard * shard_n
        all_d2 = jax.lax.all_gather(-neg, axis)  # [p,B,M,k]
        all_idx = jax.lax.all_gather(idx_g, axis)
        # merge p·k candidates; tie-break (distance, then global index)
        P_, B_, M_, K_ = all_d2.shape
        cd = jnp.transpose(all_d2, (1, 2, 0, 3)).reshape(B_, M_, P_ * K_)
        ci = jnp.transpose(all_idx, (1, 2, 0, 3)).reshape(B_, M_, P_ * K_)
        # stable argsort on distance: within-shard exact ties already
        # resolved low-index-first by top_k; cross-shard exact ties resolve
        # by shard-major concat order == global index order
        order = jnp.argsort(cd, axis=-1, stable=True)
        cd_s = jnp.take_along_axis(cd, order[..., :k], -1)
        ci_s = jnp.take_along_axis(ci, order[..., :k], -1)
        return cd_s, ci_s.astype(jnp.int32)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P()),
        out_specs=(P(), P()),
        check_vma=False,  # outputs are replicated by the all_gather merge
    )
    return fn(support, support_mask, query)
