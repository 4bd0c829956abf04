"""Ball query: oracle parity incl. pad-with-first-hit, masking invariance."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu3dsad import ops
from tpu3dsad.ops.oracle import ball_query_oracle

IMPLS = ["xla"]
RADIUS = 0.4
K = 16


def _safe_cloud(rng, b, n, m, radius, margin=1e-3):
    """Random cloud/centers with no pair near the radius boundary, so the
    MXU-form distance (|a|^2+|b|^2-2ab) can't flip a threshold vs the oracle."""
    xyz = rng.uniform(-1, 1, (b, n, 3)).astype(np.float32)
    centers = rng.uniform(-1, 1, (b, m, 3)).astype(np.float32)
    for _ in range(50):
        d2 = np.sum((centers[:, :, None] - xyz[:, None]) ** 2, -1)
        bad = np.abs(d2 - radius * radius) < margin
        if not bad.any():
            return xyz, centers
        for b_, j in zip(*np.nonzero(bad.any(axis=1))):
            xyz[b_, j] = rng.uniform(-1, 1, 3).astype(np.float32)
    raise RuntimeError("could not generate boundary-safe cloud")


@pytest.mark.parametrize("impl", IMPLS)
def test_ball_query_matches_oracle(rng, impl):
    B, N, M = 2, 300, 40
    xyz, centers = _safe_cloud(rng, B, N, M, RADIUS)
    idx, cnt = ops.ball_query(
        jnp.asarray(xyz), jnp.asarray(centers), RADIUS, K, impl=impl
    )
    idx, cnt = np.asarray(idx), np.asarray(cnt)
    for b in range(B):
        widx, wcnt = ball_query_oracle(xyz[b], centers[b], RADIUS, K)
        np.testing.assert_array_equal(cnt[b], wcnt)
        np.testing.assert_array_equal(idx[b], widx)


@pytest.mark.parametrize("impl", IMPLS)
def test_ball_query_empty_ball_is_zero(rng, impl):
    B, N, M = 1, 64, 4
    xyz = rng.uniform(-1, 1, (B, N, 3)).astype(np.float32)
    centers = np.full((B, M, 3), 50.0, np.float32)  # far from everything
    idx, cnt = ops.ball_query(
        jnp.asarray(xyz), jnp.asarray(centers), RADIUS, K, impl=impl
    )
    assert np.all(np.asarray(cnt) == 0)
    assert np.all(np.asarray(idx) == 0)


@pytest.mark.parametrize("impl", IMPLS)
def test_ball_query_mask_invariance(rng, impl):
    B, N, M, PAD = 2, 200, 30, 56
    xyz, centers = _safe_cloud(rng, B, N, M, RADIUS)
    base_idx, base_cnt = ops.ball_query(
        jnp.asarray(xyz), jnp.asarray(centers), RADIUS, K, impl=impl
    )
    # pad with points sitting INSIDE many balls — mask must exclude them
    garbage = np.repeat(centers[:, :1, :], PAD, axis=1).astype(np.float32)
    padded = np.concatenate([xyz, garbage], axis=1)
    mask = np.concatenate([np.ones((B, N), bool), np.zeros((B, PAD), bool)], 1)
    idx, cnt = ops.ball_query(
        jnp.asarray(padded),
        jnp.asarray(centers),
        RADIUS,
        K,
        mask=jnp.asarray(mask),
        impl=impl,
    )
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(base_idx))
    np.testing.assert_array_equal(np.asarray(cnt), np.asarray(base_cnt))
