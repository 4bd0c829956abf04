"""Pallas ball-query kernel parity vs oracle + XLA exact tier (interpret
mode on CPU). The kernel is the exact-semantics fast path (VERDICT r1 #1):
rank-scatter-by-matmul replaces top_k's K-pass selection."""

import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from tpu3dsad.ops.oracle import ball_query_oracle
from tpu3dsad.ops.pallas.ball_query import ball_query as bq_pallas
from tpu3dsad.ops.pallas.ball_query import supported
from tpu3dsad.ops.xla.ball_query import ball_query as bq_xla


@pytest.fixture(autouse=True)
def _interpret():
    with pltpu.force_tpu_interpret_mode():
        yield


def _mk(rng, B=2, N=256, M=32, spread=1.0):
    xyz = rng.uniform(-spread, spread, (B, N, 3)).astype(np.float32)
    centers = xyz[:, :M] + rng.normal(0, 0.05, (B, M, 3)).astype(np.float32)
    return jnp.asarray(xyz), jnp.asarray(centers)


def test_kernel_matches_oracle(rng):
    xyz, centers = _mk(rng)
    assert supported(xyz, centers, 16)
    idx, cnt = bq_pallas(xyz, centers, 0.5, 16)
    idx, cnt = np.asarray(idx), np.asarray(cnt)
    for b in range(2):
        oi, oc = ball_query_oracle(np.asarray(xyz)[b], np.asarray(centers)[b],
                                   0.5, 16)
        np.testing.assert_array_equal(idx[b], oi)
        np.testing.assert_array_equal(cnt[b], oc)


def test_kernel_matches_xla_masked(rng):
    xyz, centers = _mk(rng)
    mask = np.ones((2, 256), bool)
    mask[:, 190:] = False
    m = jnp.asarray(mask)
    pi, pc = bq_pallas(xyz, centers, 0.4, 16, mask=m)
    xi, xc = bq_xla(xyz, centers, 0.4, 16, mask=m)
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(xi))
    np.testing.assert_array_equal(np.asarray(pc), np.asarray(xc))


def test_kernel_multi_tile_rank_carry(rng):
    """Counts must carry across N-tiles: big ball that spans several tiles
    (K smaller than the per-tile hit count exercises the rank<K cut)."""
    xyz, centers = _mk(rng, N=512, M=8, spread=0.3)
    pi, pc = bq_pallas(xyz, centers, 0.8, 32)
    xi, xc = bq_xla(xyz, centers, 0.8, 32)
    assert np.asarray(pc).min() == 32  # dense cloud: every ball saturates
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(xi))
    np.testing.assert_array_equal(np.asarray(pc), np.asarray(xc))


def test_kernel_true_multi_tile_saturation_and_skip(rng):
    """N=2048/M=256 compiles to 4 N-tiles (Mt=256, Nt=512): exercises the
    run-count carry, the whole-tile-body skip once a block saturates, and
    the qlo/qhi scatter gating across the full q range (K=64 → q∈0..7)."""
    from tpu3dsad.ops.pallas.ball_query import _pick_tiles

    assert _pick_tiles(256, 2048) == (256, 512)  # pin the multi-tile layout
    xyz, centers = _mk(rng, B=2, N=2048, M=256, spread=0.35)
    pi, pc = bq_pallas(xyz, centers, 0.7, 64)
    xi, xc = bq_xla(xyz, centers, 0.7, 64)
    assert np.asarray(pc).min() == 64  # dense: every center saturates
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(xi))
    np.testing.assert_array_equal(np.asarray(pc), np.asarray(xc))


def test_kernel_mixed_saturated_and_sparse_block(rng):
    """Half the centers saturate early, half see few/no points: the block
    never qualifies for the whole-tile skip (min run < K), sparse centers
    keep low-q scatter active while saturated ones must stop writing."""
    xyz = rng.uniform(-0.25, 0.25, (1, 2048, 3)).astype(np.float32)
    centers = np.concatenate(
        [
            xyz[:, :128] * 0.9,              # dense: saturate fast
            np.full((1, 96, 3), 3.0, np.float32),   # empty balls
            xyz[:, 128:160] + 0.52,          # grazing: a few members
        ],
        axis=1,
    )
    xyz_j, c_j = jnp.asarray(xyz), jnp.asarray(centers)
    pi, pc = bq_pallas(xyz_j, c_j, 0.55, 64)
    xi, xc = bq_xla(xyz_j, c_j, 0.55, 64)
    pc_np = np.asarray(pc)
    assert pc_np[0, :128].min() == 64 and pc_np[0, 128:224].max() == 0
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(xi))
    np.testing.assert_array_equal(pc_np, np.asarray(xc))


def test_kernel_empty_balls(rng):
    xyz, centers = _mk(rng)
    idx, cnt = bq_pallas(xyz, centers + 50.0, 0.3, 16)
    assert (np.asarray(idx) == 0).all()
    assert (np.asarray(cnt) == 0).all()


def test_query_and_group_pallas_matches_xla(rng):
    from tpu3dsad.ops.pallas.ball_query import query_and_group as qg_pallas
    from tpu3dsad.ops.xla.group import query_and_group as qg_xla

    xyz, centers = _mk(rng)
    feats = jnp.asarray(
        rng.standard_normal((2, 256, 8)).astype(np.float32)
    )
    gp, ip, mp = qg_pallas(xyz, centers, 0.4, 16, features=feats,
                           normalize_xyz=True)
    gx, ix, mx = qg_xla(xyz, centers, 0.4, 16, features=feats,
                        normalize_xyz=True)
    np.testing.assert_array_equal(np.asarray(ip), np.asarray(ix))
    np.testing.assert_array_equal(np.asarray(mp), np.asarray(mx))
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), atol=1e-6)


def test_unsupported_shapes_fall_back(rng):
    # K not a multiple of 8 and ragged N both route to the XLA tier
    xyz = jnp.asarray(rng.uniform(-1, 1, (1, 250, 3)).astype(np.float32))
    centers = xyz[:, :10]
    assert not supported(xyz, centers, 12)
    pi, pc = bq_pallas(xyz, centers, 0.4, 12)
    xi, xc = bq_xla(xyz, centers, 0.4, 12)
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(xi))


def test_kernel_fuzz_sweep_vs_oracle(rng):
    """Seeded sweep over random (B,N,M,K,r,mask) configs — every supported
    draw must match the oracle exactly (interpret mode)."""
    for trial in range(12):
        trng = np.random.default_rng(1000 + trial)
        B = int(trng.integers(1, 3))
        N = int(trng.choice([128, 256, 384, 512, 1024]))
        M = int(trng.choice([8, 16, 24, 32, 64]))
        K = int(trng.choice([8, 16, 32, 64]))
        r = float(trng.uniform(0.1, 1.2))
        spread = float(trng.uniform(0.3, 3.0))
        xyz = trng.uniform(-spread, spread, (B, N, 3)).astype(np.float32)
        centers = trng.uniform(-spread, spread, (B, M, 3)).astype(np.float32)
        use_mask = trng.random() < 0.5
        mask = trng.random((B, N)) < 0.85 if use_mask else None

        xyz_j, c_j = jnp.asarray(xyz), jnp.asarray(centers)
        if not supported(xyz_j, c_j, K):
            continue
        m_j = None if mask is None else jnp.asarray(mask)
        pi, pc = bq_pallas(xyz_j, c_j, r, K, mask=m_j)
        pi, pc = np.asarray(pi), np.asarray(pc)
        for b in range(B):
            x = xyz[b].copy()
            if mask is not None:
                x[~mask[b]] = 1e9  # same sentinel the kernel applies
            oi, oc = ball_query_oracle(x, centers[b], r, K)
            np.testing.assert_array_equal(
                pi[b], oi, err_msg=f"trial {trial} idx"
            )
            np.testing.assert_array_equal(
                pc[b], oc, err_msg=f"trial {trial} cnt"
            )


def test_awkward_shapes_pad_into_kernel(rng):
    """Non-tile-divisible (N, M) budgets (e.g. a user's N=2000, M=100) must
    run through the kernel via internal padding — not silently fall back to
    the 417-1100ms top_k tier (VERDICT r2 weak #4). Padded support points
    sit at the 1e9 sentinel (never in a ball); padded center rows are
    sliced off."""
    for N, M, K, r in ((2000, 100, 16, 0.5), (250, 10, 8, 0.4),
                       (1300, 33, 32, 0.8)):
        xyz = rng.uniform(-1, 1, (2, N, 3)).astype(np.float32)
        centers = xyz[:, :M] + rng.normal(0, 0.05, (2, M, 3)).astype(
            np.float32)
        xyz_j, c_j = jnp.asarray(xyz), jnp.asarray(centers)
        assert supported(xyz_j, c_j, K), (N, M, K)
        pi, pc = bq_pallas(xyz_j, c_j, r, K)
        pi, pc = np.asarray(pi), np.asarray(pc)
        assert pi.shape == (2, M, K) and pc.shape == (2, M)
        for b in range(2):
            oi, oc = ball_query_oracle(xyz[b], centers[b], r, K)
            np.testing.assert_array_equal(pi[b], oi, err_msg=f"N={N} idx")
            np.testing.assert_array_equal(pc[b], oc, err_msg=f"N={N} cnt")


def test_awkward_shapes_with_mask(rng):
    """Padding composes with user masks: both route to the same sentinel."""
    xyz = rng.uniform(-1, 1, (1, 777, 3)).astype(np.float32)
    centers = xyz[:, :41]
    mask = rng.random((1, 777)) < 0.8
    pi, pc = bq_pallas(jnp.asarray(xyz), jnp.asarray(centers), 0.6, 16,
                       mask=jnp.asarray(mask))
    x = xyz[0].copy()
    x[~mask[0]] = 1e9
    oi, oc = ball_query_oracle(x, centers[0], 0.6, 16)
    np.testing.assert_array_equal(np.asarray(pi)[0], oi)
    np.testing.assert_array_equal(np.asarray(pc)[0], oc)


def test_kernel_dense_first_tile_full_q_range(rng):
    """Dense tiles where the first point-tile alone spans ranks 0..K-1
    (every q-slice active — the pre-saturation worst case, kernel_notes r3
    write-off): picks stay exact vs the oracle."""
    from tpu3dsad.ops.oracle import ball_query_oracle
    from tpu3dsad.ops.pallas.ball_query import ball_query

    B, N, M, K, r = 2, 512, 64, 64, 1.5
    xyz = rng.uniform(-1, 1, (B, N, 3)).astype(np.float32)
    centers = xyz[:, :M].copy()
    idx, cnt = ball_query(jnp.asarray(xyz), jnp.asarray(centers), r, K,
                          interpret=True)
    for b in range(B):
        ei, ec = ball_query_oracle(xyz[b], centers[b], r, K)
        np.testing.assert_array_equal(np.asarray(idx[b]), ei)
        np.testing.assert_array_equal(np.asarray(cnt[b]), ec)


def _clustered(rng, B=2, N=512, M=64):
    """Surface-like clustered cloud (what the AABB tile skip is for)."""
    centers3 = rng.uniform(-1, 1, (B, 8, 3)).astype(np.float32)
    pick = rng.integers(0, 8, (B, N))
    xyz = centers3[np.arange(B)[:, None], pick] + rng.normal(
        0, 0.08, (B, N, 3)
    ).astype(np.float32)
    ctr = xyz[:, :M]
    return jnp.asarray(xyz), jnp.asarray(ctr)


def test_sorted_tier_exact_membership_and_counts(rng):
    """The Z-order-sorted fast tier must return EXACT counts and only true
    in-ball members (its advantage over the approx tier); when a ball has
    <= K members the selected SET equals the exact tier's (both take all
    members; only slot order may differ)."""
    from tpu3dsad.ops.pallas.ball_query import sorted_ball_query

    K, r = 16, 0.25
    xyz, ctr = _clustered(rng)
    si, sc = sorted_ball_query(xyz, ctr, r, K)
    xi, xc = bq_xla(xyz, ctr, r, K)
    si, sc, xi, xc = map(np.asarray, (si, sc, xi, xc))
    np.testing.assert_array_equal(sc, xc)  # counts exact

    x = np.asarray(xyz)
    c = np.asarray(ctr)
    d2 = ((c[:, :, None, :] - x[:, None, :, :]) ** 2).sum(-1)
    within = d2 < r * r
    total = within.sum(-1)
    for b in range(x.shape[0]):
        for m in range(c.shape[1]):
            sel = si[b, m, : max(sc[b, m], 1)]
            if sc[b, m] > 0:
                assert within[b, m][sel].all()  # members only
            if total[b, m] <= K:
                assert set(si[b, m].tolist()) == set(xi[b, m].tolist())


def test_sorted_tier_masking_invariance(rng):
    """Appending masked junk must not change the result: junk is excluded
    from the Morton grid anchor, sorts to the end, and cannot join balls."""
    from tpu3dsad.ops.pallas.ball_query import sorted_ball_query

    K, r = 16, 0.3
    xyz, ctr = _clustered(rng, N=384)
    B, N, _ = xyz.shape
    i0, c0 = sorted_ball_query(xyz, ctr, r, K,
                               mask=jnp.ones((B, N), bool))
    junk = jnp.asarray(rng.uniform(-50, 50, (B, 128, 3)).astype(np.float32))
    padded = jnp.concatenate([xyz, junk], axis=1)
    mask = jnp.concatenate(
        [jnp.ones((B, N), bool), jnp.zeros((B, 128), bool)], axis=1)
    i1, c1 = sorted_ball_query(padded, ctr, r, K, mask=mask)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))


def test_fast_mode_dispatch_routes_to_sorted(rng, monkeypatch):
    """ops.ball_query(impl='pallas', exact=False) under fast_mode='sorted'
    must produce the sorted tier's exact counts (the approx tier cannot
    guarantee them) for supports above the size gate, fall back to approx
    below it (small SA2-4 layers have too few tiles for the AABB skip to
    pay), and restore cleanly."""
    import importlib

    import tpu3dsad.ops as ops

    # the function re-export shadows the submodule attribute; go via importlib
    pbq = importlib.import_module("tpu3dsad.ops.pallas.ball_query")

    K, r = 16, 0.25
    xyz, ctr = _clustered(rng)
    want_i, want_c = pbq.sorted_ball_query(xyz, ctr, r, K)
    approx_i, approx_c = bq_xla(xyz, ctr, r, K, exact=False)
    assert ops.get_fast_mode() == "approx"
    ops.set_fast_mode("sorted")
    try:
        monkeypatch.setattr(pbq, "_SORTED_MIN_N", 256)  # N=512 qualifies
        gi, gc = ops.ball_query(xyz, ctr, r, K, impl="pallas", exact=False)
        np.testing.assert_array_equal(np.asarray(gi), np.asarray(want_i))
        np.testing.assert_array_equal(np.asarray(gc), np.asarray(want_c))
        monkeypatch.setattr(pbq, "_SORTED_MIN_N", 4096)  # gate: approx
        ai, ac = ops.ball_query(xyz, ctr, r, K, impl="pallas", exact=False)
        np.testing.assert_array_equal(np.asarray(ai), np.asarray(approx_i))
        np.testing.assert_array_equal(np.asarray(ac), np.asarray(approx_c))
    finally:
        ops.set_fast_mode("approx")
    with pytest.raises(ValueError):
        ops.set_fast_mode("bogus")
