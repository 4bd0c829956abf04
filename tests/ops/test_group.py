"""gather/group/query_and_group + masked reductions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu3dsad import ops

IMPLS = ["xla"]


@pytest.mark.parametrize("impl", IMPLS)
def test_gather_group_semantics(rng, impl):
    B, N, C, M, K = 2, 40, 5, 7, 4
    pts = rng.standard_normal((B, N, C)).astype(np.float32)
    idx2 = rng.integers(0, N, (B, M)).astype(np.int32)
    idx3 = rng.integers(0, N, (B, M, K)).astype(np.int32)

    g2 = np.asarray(ops.gather(jnp.asarray(pts), jnp.asarray(idx2), impl=impl))
    g3 = np.asarray(ops.group(jnp.asarray(pts), jnp.asarray(idx3), impl=impl))
    for b in range(B):
        np.testing.assert_array_equal(g2[b], pts[b][idx2[b]])
        np.testing.assert_array_equal(g3[b], pts[b][idx3[b]])


def test_group_grad_is_scatter_add(rng):
    B, N, C, M, K = 1, 10, 3, 4, 2
    pts = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N, (B, M, K)), dtype=jnp.int32)
    g = jax.grad(lambda p: jnp.sum(ops.group(p, idx)))(pts)
    want = np.zeros((B, N, C), np.float32)
    for m in range(M):
        for k in range(K):
            want[0, int(idx[0, m, k])] += 1.0
    np.testing.assert_allclose(np.asarray(g), want, atol=1e-6)


def test_scatter_rows_matmul_and_scatter_match_oracle(rng, monkeypatch):
    """_scatter_rows has two forms — XLA scatter (CPU default) and the
    one-hot MXU matmul (TPU default; the replacement for XLA's per-row-
    serializing scatter on TPU). Both must compute the lineage
    gather_points_grad sums; they may differ from each other only in
    summation order (the lineage bwd is an unordered atomicAdd). Weighted
    cotangents + colliding indices exercise real accumulation; N spans
    more than one one-hot tile via a shrunk tile width."""
    import importlib

    # the function re-export shadows the submodule attribute; go via importlib
    group_mod = importlib.import_module("tpu3dsad.ops.xla.group")

    B, U, N, C = 3, 55, 37, 6
    idx = jnp.asarray(rng.integers(0, 7, (B, U)), dtype=jnp.int32)
    g = jnp.asarray(rng.standard_normal((B, U, C)).astype(np.float32))
    want = np.zeros((B, N, C), np.float32)
    gn = np.asarray(g)
    for b in range(B):
        for u in range(U):
            want[b, int(idx[b, u])] += gn[b, u]

    monkeypatch.setattr(group_mod, "_ONEHOT_TILE_N", 16)
    for mode in ("0", "1"):  # 0 = force matmul, 1 = force scatter
        monkeypatch.setenv("TPU3DSAD_SCATTER_VJP", mode)
        out = np.asarray(group_mod._scatter_rows(g, idx, N))
        np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)


def test_weighted_vjp_matches_scatter_reference(rng):
    """The grad of group() through the custom VJP (whichever _scatter_rows
    form the platform selects) equals the hand-rolled scatter oracle."""
    B, N, C, M, K = 3, 37, 6, 11, 5
    pts = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32))
    # force collisions: indices drawn from a small range
    idx = jnp.asarray(rng.integers(0, 7, (B, M, K)), dtype=jnp.int32)
    w = jnp.asarray(rng.standard_normal((B, M, K, C)).astype(np.float32))

    g = jax.grad(lambda p: jnp.sum(ops.group(p, idx) * w))(pts)
    want = np.zeros((B, N, C), np.float32)
    wn = np.asarray(w)
    for b in range(B):
        for m in range(M):
            for k in range(K):
                want[b, int(idx[b, m, k])] += wn[b, m, k]
    np.testing.assert_allclose(np.asarray(g), want, rtol=1e-5, atol=1e-5)

    # flat gather VJP through jit, and under vmap (CP/shard paths)
    idx2 = jnp.asarray(rng.integers(0, N, (B, M)), dtype=jnp.int32)
    g2 = jax.jit(jax.grad(lambda p: jnp.sum(ops.gather(p, idx2) ** 2) / 2))(pts)
    want2 = np.zeros((B, N, C), np.float32)
    pn = np.asarray(pts)
    for b in range(B):
        for m in range(M):
            want2[b, int(idx2[b, m])] += pn[b, int(idx2[b, m])]
    np.testing.assert_allclose(np.asarray(g2), want2, rtol=1e-5, atol=1e-6)

    gv = jax.vmap(
        lambda p, i: jax.grad(lambda q: jnp.sum(ops.gather(q[None], i[None])))(p)
    )(pts, idx2)
    want3 = np.zeros((B, N, C), np.float32)
    for b in range(B):
        for m in range(M):
            want3[b, int(idx2[b, m])] += 1.0
    np.testing.assert_allclose(np.asarray(gv), want3, atol=1e-6)


@pytest.mark.parametrize("impl", IMPLS)
def test_query_and_group_shapes_and_relative_xyz(rng, impl):
    B, N, M, K, C = 2, 120, 16, 8, 6
    xyz = rng.uniform(-1, 1, (B, N, 3)).astype(np.float32)
    feats = rng.standard_normal((B, N, C)).astype(np.float32)
    centers = xyz[:, :M, :]  # centers on real points -> never empty
    grouped, idx, gmask = ops.query_and_group(
        jnp.asarray(xyz), jnp.asarray(centers), 0.5, K,
        features=jnp.asarray(feats), impl=impl,
    )
    assert grouped.shape == (B, M, K, 3 + C)
    assert gmask.shape == (B, M, K)
    # slot 0 of a center sitting on a point: relative xyz of 1st hit
    grouped = np.asarray(grouped)
    idx = np.asarray(idx)
    for b in range(B):
        for m in range(M):
            rel = xyz[b, idx[b, m, 0]] - centers[b, m]
            np.testing.assert_allclose(grouped[b, m, 0, :3], rel, atol=1e-6)
            np.testing.assert_allclose(
                grouped[b, m, 0, 3:], feats[b, idx[b, m, 0]], atol=1e-6
            )
    assert np.asarray(gmask)[:, :, 0].all()  # center point itself always hits


def test_masked_max_mean(rng):
    B, M, K, C = 2, 5, 8, 4
    x = rng.standard_normal((B, M, K, C)).astype(np.float32)
    mask = rng.random((B, M, K)) < 0.6
    mask[0, 0, :] = False  # an all-invalid group
    got_max = np.asarray(ops.masked_max(jnp.asarray(x), jnp.asarray(mask), axis=2))
    got_mean = np.asarray(ops.masked_mean(jnp.asarray(x), jnp.asarray(mask), axis=2))
    for b in range(B):
        for m in range(M):
            sel = x[b, m][mask[b, m]]
            if sel.size == 0:
                np.testing.assert_array_equal(got_max[b, m], 0.0)
                np.testing.assert_array_equal(got_mean[b, m], 0.0)
            else:
                np.testing.assert_allclose(got_max[b, m], sel.max(0), atol=1e-6)
                np.testing.assert_allclose(got_mean[b, m], sel.mean(0), atol=1e-6)
