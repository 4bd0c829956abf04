"""Exact ball query as a Pallas TPU kernel — first-K scan-order selection
WITHOUT the K-pass cost that makes `lax.top_k` slow.

Lineage semantics (SURVEY.md §2.1, ball_query_gpu.cu): for each center, the
first K points in index order 0..N-1 with d² < r²; remaining slots replicate
the first hit; empty ball → all-zero indices. The XLA exact tier implements
this with `lax.top_k` over a scan-order score, which costs ~K passes over N
(376 of the 394ms of a b=8 SA1-scale exact grouping — docs/kernel_notes.md).

The kernel removes the K-pass cost with rank-scatter-by-matmul:

  1. d² tile [Mt,Nt] elementwise on the VPU (fp32, same summation order as
     the numpy oracle).
  2. Each in-ball point's SLOT is its in-ball rank = running count (carried
     across N-tiles in VMEM scratch) + exclusive prefix count within the
     tile. The prefix sum is a triangular matmul on the MXU
     (within_bf16 @ U, fp32 accumulate — exact for counts ≤ Nt).
  3. Scatter idx+1 into its slot via a two-level one-hot decomposition
     rank = 8·q + r: one 8-wide one-hot over r (built once per tile,
     [Mt,8,Nt]) and a K/8-iteration q loop whose 8-wide reductions are
     batched mat-vecs on the MXU. VPU cost is ~(16 + 2·K/8) ops/element
     instead of top_k's ~6·K — the selection leaves the VPU.

Each (center-tile, point-tile) is visited once; the output block stays
resident in VMEM across the (innermost) N-tile sweep and accumulates
slot values; at most one tile contributes to any slot, so the accumulation
is exact. Post-processing (pad-with-first-hit, counts) is cheap XLA.

Measured (TPU v5e, docs/kernel_notes.md §ball-query-kernel): see the
benchmark table committed with this kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu3dsad.ops.xla.common import valid_mask

_R_WIDTH = 8  # r-level of the two-level one-hot; K must be a multiple

# fast_mode='sorted' only engages above this support size: the AABB tile
# skip needs many point tiles to pay for the sort/remap overhead; small
# SA2-4 layers (N<=2048 => <=2 tiles) stay on the approx selector
import os as _os

_SORTED_MIN_N = int(_os.environ.get("TPU3DSAD_SORTED_MIN_N", "8192"))


def _kernel(skip_ref, c_ref, xT_ref, u_ref, out_ref, run_ref, *, r2: float,
            k: int):
    """One (batch, center-tile, point-tile) grid step.

    skip_ref: scalar-prefetched int32 [B*MT*NT] — 1 where the center-tile
    and point-tile AABBs are provably further apart than r (computed in
    XLA by `_tile_skip`); c_ref [1,Mt,3] centers, xT_ref [1,3,Nt] points
    (transposed), u_ref [Nt,Nt] upper-triangular ones (incl. diagonal),
    out_ref [1,Mt,K] slot accumulator (idx+1, 0=empty), run_ref [Mt,1]
    running in-ball count.
    """
    ni = pl.program_id(2)
    nt = xT_ref.shape[-1]
    mt = c_ref.shape[1]

    @pl.when(ni == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)
        run_ref[...] = jnp.zeros_like(run_ref)

    # Two skips, both exact:
    #  - saturation: once every center in this block holds K points (min
    #    running count ≥ K) later tiles can write nothing: rank ≥ run ≥ K
    #    kills every `ok`, and run itself is only read through rank.
    #  - AABB disjointness: no point of this tile can be inside any ball of
    #    this center tile, so `within` would be all-false — no slot writes
    #    AND no run_ref change. Pays off when the caller spatially sorts
    #    points and centers (sorted fast tier below): a ball's members then
    #    concentrate in a few point tiles and the rest of the sweep skips.
    flat = (pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)) \
        * pl.num_programs(2) + ni

    @pl.when((jnp.min(run_ref[...]) < k) & (skip_ref[flat] == 0))
    def _tile_body():
        c = c_ref[0]  # [Mt, 3]
        x = xT_ref[0]  # [3, Nt]
        # same per-point summation order as the numpy oracle: dx²+dy²+dz²
        d2 = (
            (c[:, 0:1] - x[0:1, :]) ** 2
            + (c[:, 1:2] - x[1:2, :]) ** 2
            + (c[:, 2:3] - x[2:3, :]) ** 2
        )  # [Mt, Nt] fp32
        within = d2 < r2
        wf = within.astype(jnp.float32)

        # exclusive in-ball rank = carried count + (inclusive prefix - self).
        # 0/1 bf16 matmul with fp32 accumulation is exact for counts ≤ Nt.
        # Precision pinned to DEFAULT: the fp32-parity mode's global
        # jax_default_matmul_precision=highest would otherwise leak in and
        # ask Mosaic for an fp32-contract bf16 matmul it cannot lower
        # ("Bad lhs type") — and exactness here never needed it.
        incl = jnp.dot(
            within.astype(jnp.bfloat16), u_ref[...],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        rank = run_ref[...] + incl - wf  # [Mt, Nt]

        ok = within & (rank < k)
        okf = ok.astype(jnp.float32)

        # Ranks touched by this tile span a narrow window (each center's
        # ranks move by its per-tile hit count), so most of the K/8 q-slices
        # have no writer. Two scalar reductions bound the active q range and
        # gate each iteration; a third skips the scatter stage entirely when
        # the tile contributes nothing (common late in the sweep).
        q_of = jnp.floor(rank * (1.0 / _R_WIDTH))  # exact: power-of-2 scale
        qlo = jnp.min(jnp.where(ok, q_of, jnp.float32(k)))
        qhi = jnp.max(jnp.where(ok, q_of, jnp.float32(-1.0)))

        @pl.when(qhi >= 0.0)
        def _scatter():
            lane = jax.lax.broadcasted_iota(
                jnp.int32, (mt, nt), 1
            ).astype(jnp.float32)
            val = okf * (lane + (ni * nt + 1.0))  # global idx + 1, 0 if !ok
            r_arr = rank - _R_WIDTH * q_of
            r_iota = jax.lax.broadcasted_iota(
                jnp.int32, (mt, _R_WIDTH, nt), 1
            ).astype(jnp.float32)
            oh_r = (r_arr[:, None, :] == r_iota).astype(jnp.float32)

            # K/8 batched mat-vecs on the MXU; at most one n contributes per
            # (m, r) so the sums are exact. (A single fused [nq,Nt]@[Nt,8]
            # dot_general was tried; Mosaic rejects the 3D lane reshape.)
            for q in range(k // _R_WIDTH):
                @pl.when((qlo <= q) & (q <= qhi))
                def _(q=q):
                    vq = jnp.where(q_of == q, val, 0.0)  # [Mt, Nt]
                    contrib = jax.lax.dot_general(
                        oh_r, vq,
                        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                    )  # [Mt, 8]
                    sl = slice(q * _R_WIDTH, (q + 1) * _R_WIDTH)
                    out_ref[0, :, sl] += contrib

        run_ref[...] += jnp.sum(wf, axis=1, keepdims=True)


def _pick_tiles(m: int, n: int) -> tuple[int, int] | None:
    """Largest (Mt, Nt) dividing (M, N) within the VMEM budget, or None."""
    for mt in (256, 128, 64, 32, 16, 8):
        if m % mt:
            continue
        for nt in (1024, 512, 256, 128):
            if n % nt:
                continue
            # dominant buffers: oh_r fp32 [Mt,8,Nt], U bf16 [Nt,Nt],
            # ~8 fp32 [Mt,Nt] temporaries
            vmem = mt * 8 * nt * 4 + nt * nt * 2 + 8 * mt * nt * 4
            if vmem <= 10 * 1024 * 1024:
                return mt, nt
        return None
    return None


def _tile_skip(centers, xyz, mt: int, nt: int, r2: float) -> jnp.ndarray:
    """int32 [B * M//mt * N//nt]: 1 where the center-tile and point-tile
    axis-aligned bounding boxes are separated by more than r, so no point
    of the tile can fall inside any ball of the center tile. The 1e-3
    relative slack keeps the test conservative against fp32 rounding
    (boundary membership is decided by the kernel's elementwise d², never
    here — a 0 flag only means "must look")."""
    B = xyz.shape[0]
    cb = centers.reshape(B, -1, mt, 3)
    xb = xyz.reshape(B, -1, nt, 3)
    cmin, cmax = cb.min(2), cb.max(2)  # [B, MT, 3]
    xmin, xmax = xb.min(2), xb.max(2)  # [B, NT, 3]
    sep = jnp.maximum(
        0.0,
        jnp.maximum(
            cmin[:, :, None, :] - xmax[:, None, :, :],
            xmin[:, None, :, :] - cmax[:, :, None, :],
        ),
    )  # [B, MT, NT, 3]
    d2 = jnp.sum(sep * sep, axis=-1)
    return (d2 > r2 * (1.0 + 1e-3)).astype(jnp.int32).reshape(-1)


@functools.partial(jax.jit, static_argnames=("radius", "nsample", "interpret"))
def _ball_query_kernel(xyz, centers, radius: float, nsample: int,
                       interpret: bool = False):
    B, N, _ = xyz.shape
    M = centers.shape[1]
    tiles = _pick_tiles(M, N)
    assert tiles is not None, "caller must check supported()"
    Mt, Nt = tiles

    xyz = xyz.astype(jnp.float32)
    centers = centers.astype(jnp.float32)
    xT = jnp.swapaxes(xyz, 1, 2)  # [B, 3, N]
    u = jnp.triu(jnp.ones((Nt, Nt), jnp.bfloat16))  # n ≤ j
    r2 = float(radius) * float(radius)
    skip = _tile_skip(centers, xyz, Mt, Nt, r2)

    grid = (B, M // Mt, N // Nt)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Mt, 3), lambda b, mi, ni, *_: (b, mi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, Nt), lambda b, mi, ni, *_: (b, 0, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Nt, Nt), lambda b, mi, ni, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Mt, nsample), lambda b, mi, ni, *_: (b, mi, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((Mt, 1), jnp.float32)],
    )
    slots = pl.pallas_call(
        functools.partial(_kernel, r2=r2, k=nsample),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, M, nsample), jnp.float32),
        interpret=interpret,
    )(skip, centers, xT, u)

    hit = slots > 0
    idx = jnp.where(hit, slots - 1.0, 0.0).astype(jnp.int32)
    idx = jnp.where(hit, idx, idx[..., :1])  # pad with first hit (0 if ∅)
    cnt = jnp.sum(hit, axis=-1).astype(jnp.int32)  # = min(total_within, K)
    return idx, cnt


def _aligned(m: int, n: int) -> tuple[int, int]:
    """Pad targets (Mp, Np) for arbitrary (M, N): the kernel requires M
    divisible by one of {256..8} and N by one of {1024..128}; rather than
    silently falling back to the 417-1100ms top_k tier for a user's
    N=20000, pad up to the next multiple (padded support points sit at the
    1e9 sentinel and can never join a ball; padded center rows are sliced
    off). N pads to 512-multiples (128 for small clouds) so _pick_tiles
    still lands on large tiles; M to 64 (8 for small M)."""
    mq = 64 if m >= 64 else _R_WIDTH
    nq = 512 if n >= 512 else 128
    return -(-m // mq) * mq, -(-n // nq) * nq


def supported(xyz, centers, nsample: int) -> bool:
    B, N, _ = xyz.shape
    M = centers.shape[1]
    return (
        nsample % _R_WIDTH == 0
        and nsample <= N
        and _pick_tiles(*_aligned(M, N)) is not None
    )


def _spread_bits(v: jnp.ndarray) -> jnp.ndarray:
    """int32 in [0,256): place bit i at position 3i (Morton component)."""
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def _morton_codes(pts, mn, inv_cell) -> jnp.ndarray:
    """[...,3] fp32 -> int32 Z-order codes on a 256³ grid anchored at mn."""
    q = jnp.clip((pts - mn) * inv_cell, 0.0, 255.0).astype(jnp.int32)
    return (
        _spread_bits(q[..., 0])
        | (_spread_bits(q[..., 1]) << 1)
        | (_spread_bits(q[..., 2]) << 2)
    )


def sorted_ball_query(xyz, centers, radius, nsample, *, mask=None,
                      interpret=False):
    """Fast tier: the exact kernel on SPATIALLY SORTED views of points and
    centers, results mapped back to the caller's order.

    Unsorted inputs defeat the kernel's AABB tile skip — every point tile
    holds points near every center tile, so all B·(M/Mt)·(N/Nt) tile pairs
    pay the full body. Z-order (Morton) sorting both arrays concentrates a
    ball's members in a few point tiles per center tile and the rest of the
    sweep skips. Membership and counts are EXACT (order-invariant, unlike
    the ~99.9%-recall approx_max_k tier); only WHICH K of >K in-ball
    members fill the slots differs from the lineage first-K-in-index-order
    rule — the kernel's scan order is the sorted order, i.e. near-first
    spatially. Deterministic for fixed input (stable sorts; the grid is
    anchored to the valid-point bounding box, so padding cannot move it).
    """
    B, N, _ = xyz.shape
    M = centers.shape[1]
    valid = valid_mask(mask, (B, N))
    x = jnp.where(valid[..., None], xyz.astype(jnp.float32),
                  jnp.float32(1e9))
    x = jax.lax.stop_gradient(x)
    c = jax.lax.stop_gradient(centers.astype(jnp.float32))

    big = jnp.float32(3e38)
    mn = jnp.min(jnp.where(valid[..., None], x, big), axis=1, keepdims=True)
    mx = jnp.max(jnp.where(valid[..., None], x, -big), axis=1, keepdims=True)
    inv_cell = 256.0 / jnp.maximum(mx - mn, 1e-6)  # [B,1,3]

    codes_x = jnp.where(valid, _morton_codes(x, mn, inv_cell),
                        jnp.int32(1 << 30))  # invalid points sort last
    iota_n = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))
    _, perm = jax.lax.sort_key_val(codes_x, iota_n, is_stable=True)
    xs = jnp.take_along_axis(x, perm[..., None], axis=1)

    codes_c = _morton_codes(c, mn, inv_cell)
    iota_m = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32), (B, M))
    _, perm_c = jax.lax.sort_key_val(codes_c, iota_m, is_stable=True)
    cs = jnp.take_along_axis(c, perm_c[..., None], axis=1)
    _, inv_c = jax.lax.sort_key_val(perm_c, iota_m, is_stable=True)

    Mp, Np = _aligned(M, N)
    if Np != N:  # sentinel pads can never be within any real ball
        xs = jnp.concatenate(
            [xs, jnp.full((B, Np - N, 3), 1e9, jnp.float32)], axis=1)
    if Mp != M:  # repeat the last sorted center: keeps the tail tile's
        # AABB tight (zero-pads would drag it to the origin)
        cs = jnp.concatenate(
            [cs, jnp.broadcast_to(cs[:, -1:], (B, Mp - M, 3))], axis=1)
    idx_s, cnt_s = _ball_query_kernel(xs, cs, float(radius), int(nsample),
                                      interpret=interpret)
    if Mp != M:
        idx_s, cnt_s = idx_s[:, :M], cnt_s[:, :M]

    # sorted support slots -> original point ids; empty balls stay 0
    perm_pad = perm if Np == N else jnp.concatenate(
        [perm, jnp.zeros((B, Np - N), perm.dtype)], axis=1)
    mapped = jnp.take_along_axis(
        perm_pad, idx_s.reshape(B, M * nsample), axis=1
    ).reshape(B, M, nsample)
    mapped = jnp.where(cnt_s[..., None] > 0, mapped, 0).astype(jnp.int32)

    # sorted center rows -> the caller's center order
    idx = jnp.take_along_axis(mapped, inv_c[..., None], axis=1)
    cnt = jnp.take_along_axis(cnt_s, inv_c, axis=1)
    return idx, cnt


def ball_query(xyz, centers, radius, nsample, *, mask=None, exact=True,
               interpret=False):
    """Pallas-tier ball query. Exact scan-order semantics; same signature as
    the XLA tier. Fast mode dispatches on ops.get_fast_mode(): 'sorted'
    runs the exact kernel on Z-ordered views (exact membership/counts, see
    sorted_ball_query); 'approx' falls back to the XLA approx_max_k tier.
    Unsupported shapes fall back to XLA either way."""
    if (not exact and xyz.shape[1] >= _SORTED_MIN_N
            and supported(xyz, centers, nsample)):
        from tpu3dsad import ops as _ops

        if _ops.get_fast_mode() == "sorted":
            return sorted_ball_query(xyz, centers, radius, nsample,
                                     mask=mask, interpret=interpret)
    if not exact or not supported(xyz, centers, nsample):
        from tpu3dsad.ops.xla.ball_query import ball_query as xla_bq

        return xla_bq(xyz, centers, radius, nsample, mask=mask, exact=exact)
    if mask is not None:
        # invalid points are pushed out of every ball; (1e9)² stays finite
        far = jnp.asarray(1e9, xyz.dtype)
        xyz = jnp.where(valid_mask(mask, xyz.shape[:2])[..., None], xyz, far)
    # indices/counts are piecewise-constant in the coordinates (zero grad
    # a.e.), and pallas_call has no autodiff rule — cut the tape here, like
    # the XLA tier's int top_k path does implicitly. Gradients flow through
    # the downstream gather, exactly the lineage ball_query semantics.
    xyz = jax.lax.stop_gradient(xyz)
    centers = jax.lax.stop_gradient(centers)
    B, N, _ = xyz.shape
    M = centers.shape[1]
    Mp, Np = _aligned(M, N)
    if Np != N:  # sentinel pads can never be within any real ball
        pad = jnp.full((B, Np - N, 3), 1e9, xyz.dtype)
        xyz = jnp.concatenate([xyz, pad], axis=1)
    if Mp != M:  # dummy centers; their output rows are sliced off below
        cpad = jnp.zeros((B, Mp - M, 3), centers.dtype)
        centers = jnp.concatenate([centers, cpad], axis=1)
    idx, cnt = _ball_query_kernel(xyz, centers, float(radius), int(nsample),
                                  interpret=interpret)
    if Mp != M:
        idx, cnt = idx[:, :M], cnt[:, :M]
    return idx, cnt


def query_and_group(xyz, centers, radius, nsample, features=None, mask=None,
                    use_xyz=True, normalize_xyz=False, exact=True):
    """Fused query-and-group, Pallas selection + XLA single-gather epilogue
    (gathers are per-row latency-bound and already optimal in XLA —
    docs/kernel_notes.md)."""
    from tpu3dsad.ops.xla.group import group, group_epilogue

    idx, cnt = ball_query(xyz, centers, radius, nsample, mask=mask,
                          exact=exact)
    src = xyz if features is None else jnp.concatenate([xyz, features], -1)
    gathered = group(src, idx)
    grouped, group_mask = group_epilogue(
        gathered, centers, cnt, radius, nsample,
        has_features=features is not None, use_xyz=use_xyz,
        normalize_xyz=normalize_xyz,
    )
    return grouped, idx, group_mask
