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

Hybrid DP x CP: every entry point takes `batch_axis` — on a 2D mesh
(('data', 'points')) the batch dim shards over `batch_axis` while N shards
over `axis`; collectives stay on the `points` axis only, so data-parallel
groups never talk to each other. batch_axis=None (default) replicates the
batch (pure-CP, the 1D case).
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
    batch_axis: str | None = None,
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
        in_specs=(P(batch_axis, axis), P(batch_axis, axis), P(batch_axis)),
        out_specs=(P(batch_axis), P(batch_axis)),
        check_vma=False,  # replicated within a points group by the merge
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


def sharded_fps(
    xyz: jnp.ndarray,
    npoint: int,
    mesh: Mesh,
    mask: jnp.ndarray | None = None,
    axis: str = "points",
    batch_axis: str | None = None,
) -> jnp.ndarray:
    """Exact FPS with N sharded over `axis` (docs/context_parallel.md).

    Per pick: local min-dist update + local argmax, then ONE tiny all_gather
    of each shard's packed candidate record (value, global index, candidate
    coords) — [B,5] fp32 per shard. Ties resolve to the lowest GLOBAL index,
    matching the single-device rule; the winner's coordinates come from the
    proposing shard's record, so no second collective (the r1 design used
    two all_gathers + a one-hot psum per pick — 3 collectives; the sequential
    loop is collective-latency-bound, so packing is a direct ~3× on the
    per-pick floor). Indices ride the fp32 payload exactly (N < 2²⁴).
    Returns idx [B, npoint] global, == ops.furthest_point_sample.
    """
    B, N, _ = xyz.shape
    assert N < (1 << 24), "global index must be exact in fp32 payload"
    p = mesh.shape[axis]
    shard_n = N // p
    if mask is None:
        mask = jnp.ones((B, N), bool)

    def local(xyz_l, mask_l):
        shard = jax.lax.axis_index(axis)
        b_l, n_l = xyz_l.shape[:2]  # batch may itself be sharded (batch_axis)
        lane = jax.lax.broadcasted_iota(jnp.int32, (b_l, n_l), 1)
        glane = lane + shard * shard_n

        def coords_of(g):
            """[B] global index -> [B,3] coords via one-hot psum (setup only)."""
            onehot = (glane == g[:, None]).astype(xyz_l.dtype)  # [B,n_l]
            local_sum = jnp.einsum("bn,bnc->bc", onehot, xyz_l)
            return jax.lax.psum(local_sum, axis)

        dist0 = jnp.where(mask_l, jnp.inf, -jnp.inf)
        idx0 = jnp.zeros((b_l, npoint), jnp.int32)  # seed: global index 0
        c0 = coords_of(jnp.zeros((b_l,), jnp.int32))

        def body(i, carry):
            dist, lastc, idx = carry
            d2 = jnp.sum((xyz_l - lastc[:, None, :]) ** 2, axis=-1)
            dist = jnp.minimum(dist, jnp.where(mask_l, d2, -jnp.inf))
            lbest = jnp.max(dist, axis=1)  # [B]
            lidx = jnp.min(
                jnp.where(dist == lbest[:, None], glane, jnp.int32(N)), axis=1
            )
            # candidate's own coords via local one-hot (exact copy of xyz)
            oh = (glane == lidx[:, None]).astype(xyz_l.dtype)
            cand_c = jnp.einsum("bn,bnc->bc", oh, xyz_l)  # [B,3]
            payload = jnp.concatenate(
                [lbest[:, None], lidx[:, None].astype(jnp.float32), cand_c],
                axis=1,
            )  # [B, 5]
            rec = jax.lax.all_gather(payload, axis)  # [p, B, 5]
            vals, fids = rec[..., 0], rec[..., 1]
            best = jnp.max(vals, axis=0)
            g = jnp.min(
                jnp.where(vals == best[None, :], fids, float(N)), axis=0
            ).astype(jnp.int32)
            # exactly one shard proposed g (shard index ranges are disjoint,
            # and g is the min of the gathered ids, so its proposer matches)
            win = (vals == best[None, :]) & (fids == g[None, :].astype(
                jnp.float32))
            nextc = jnp.einsum("pb,pbc->bc", win.astype(xyz_l.dtype),
                               rec[..., 2:5])
            idx = jax.lax.dynamic_update_slice_in_dim(idx, g[:, None], i, 1)
            return dist, nextc, idx

        _, _, idx = jax.lax.fori_loop(1, npoint, body, (dist0, c0, idx0))
        return idx

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(batch_axis, axis), P(batch_axis, axis)),
        out_specs=P(batch_axis),
        check_vma=False,  # every points-shard computes the same winners
    )
    return fn(xyz, mask)


def sharded_knn(
    query: jnp.ndarray,
    support: jnp.ndarray,
    k: int,
    mesh: Mesh,
    support_mask: jnp.ndarray | None = None,
    axis: str = "points",
    batch_axis: str | None = None,
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
        in_specs=(P(batch_axis, axis), P(batch_axis, axis), P(batch_axis)),
        out_specs=(P(batch_axis), P(batch_axis)),
        check_vma=False,  # replicated within a points group by the merge
    )
    return fn(support, support_mask, query)


def sharded_group(
    points: jnp.ndarray,
    idx: jnp.ndarray,
    mesh: Mesh,
    axis: str = "points",
    batch_axis: str | None = None,
) -> jnp.ndarray:
    """Gather [B,M,K] GLOBAL indices from N-sharded points [B,N,C].

    Each shard gathers the subset of indices that land in its contiguous
    N-range (out-of-range indices clamp and contribute zero) and the
    results combine with one psum — no N-sized all_gather, so the sharded
    array never materializes on one chip. == ops.group(points, idx).
    """
    B, N, C = points.shape
    p = mesh.shape[axis]
    shard_n = N // p

    def local(pts_l, idx_g):
        shard = jax.lax.axis_index(axis)
        lo = shard * shard_n
        local_idx = idx_g - lo
        mine = (local_idx >= 0) & (local_idx < shard_n)
        safe = jnp.clip(local_idx, 0, shard_n - 1)
        Bm, M, K = idx_g.shape
        flat = jnp.take_along_axis(
            pts_l, safe.reshape(Bm, M * K, 1).astype(jnp.int32), axis=1
        ).reshape(Bm, M, K, -1)
        contrib = jnp.where(mine[..., None], flat, 0.0)
        return jax.lax.psum(contrib, axis)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(batch_axis, axis), P(batch_axis)),
        out_specs=P(batch_axis),
        check_vma=False,  # psum replicates within a points group
    )
    return fn(points, idx)


def sharded_query_and_group(
    xyz: jnp.ndarray,
    centers: jnp.ndarray,
    radius: float,
    nsample: int,
    mesh: Mesh,
    features: jnp.ndarray | None = None,
    mask: jnp.ndarray | None = None,
    use_xyz: bool = True,
    normalize_xyz: bool = False,
    axis: str = "points",
    batch_axis: str | None = None,
):
    """query_and_group with the point axis sharded over the mesh — the
    giant-cloud SA grouping stage (VERDICT r1 #7). Semantics identical to
    ops.xla.group.query_and_group(exact=True); outputs bitwise equal
    (tests/distributed/test_sharded_model_path.py)."""
    from tpu3dsad.ops.xla.group import group_epilogue

    idx, cnt = sharded_ball_query(
        xyz, centers, radius, nsample, mesh, mask=mask, axis=axis,
        batch_axis=batch_axis,
    )
    src = xyz if features is None else jnp.concatenate([xyz, features], -1)
    gathered = sharded_group(src, idx, mesh, axis=axis,
                             batch_axis=batch_axis)
    grouped, group_mask = group_epilogue(
        gathered, centers, cnt, radius, nsample,
        has_features=features is not None, use_xyz=use_xyz,
        normalize_xyz=normalize_xyz,
    )
    return grouped, idx, group_mask


def sharded_centers(
    xyz: jnp.ndarray,
    inds: jnp.ndarray,
    mesh: Mesh,
    mask: jnp.ndarray | None = None,
    axis: str = "points",
    batch_axis: str | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Gather sampled centers (+validity) from the sharded cloud with ONE
    collective: xyz and the mask bit ride a single concatenated
    sharded_group (the psum path is latency-bound; two separate gathers
    would double the per-level collective count).

    Returns (new_xyz [B,M,3], new_mask [B,M])."""
    if mask is None:
        new_xyz = sharded_group(
            xyz, inds[..., None], mesh, axis=axis, batch_axis=batch_axis
        )[:, :, 0, :]
        return new_xyz, jnp.ones(inds.shape, bool)
    src = jnp.concatenate([xyz, mask[..., None].astype(xyz.dtype)], -1)
    g = sharded_group(
        src, inds[..., None], mesh, axis=axis, batch_axis=batch_axis
    )[:, :, 0, :]
    return g[..., :3], g[..., 3] > 0.5


def sharded_sa_stage(
    xyz: jnp.ndarray,
    features: jnp.ndarray | None,
    npoint: int,
    radius: float,
    nsample: int,
    mesh: Mesh,
    mask: jnp.ndarray | None = None,
    normalize_xyz: bool = True,
    axis: str = "points",
    batch_axis: str | None = None,
):
    """The N-touching half of a SetAbstraction layer on an N-sharded cloud:
    sharded FPS -> center gather -> sharded query_and_group. Everything
    downstream (shared MLP + masked max over [B,M,K,C]) is N-free and runs
    replicated. Returns (new_xyz, grouped, inds, group_mask, new_mask)."""
    inds = sharded_fps(xyz, npoint, mesh, mask=mask, axis=axis,
                       batch_axis=batch_axis)
    new_xyz, new_mask = sharded_centers(
        xyz, inds, mesh, mask=mask, axis=axis, batch_axis=batch_axis
    )
    grouped, _, gmask = sharded_query_and_group(
        xyz, new_xyz, radius, nsample, mesh, features=features, mask=mask,
        normalize_xyz=normalize_xyz, axis=axis, batch_axis=batch_axis,
    )
    gmask = gmask & new_mask[:, :, None]
    return new_xyz, grouped, inds, gmask, new_mask
