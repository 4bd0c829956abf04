"""Point-dimension sharding (CP analogue): sharded ball query / kNN must be
EXACTLY the single-device result (8-virtual-device mesh)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu3dsad import ops
from tpu3dsad.parallel.mesh import make_mesh
from tpu3dsad.parallel.point_sharded import (
    sharded_ball_query,
    sharded_fps,
    sharded_knn,
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh((-1,), ("points",))


def test_sharded_ball_query_exact(rng, mesh):
    B, N, M, K, R = 2, 512, 40, 16, 0.45  # N divisible by 8
    xyz = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)).astype(np.float32))
    centers = jnp.asarray(rng.uniform(-1, 1, (B, M, 3)).astype(np.float32))
    mask = jnp.asarray(rng.random((B, N)) < 0.9)

    want_idx, want_cnt = ops.ball_query(xyz, centers, R, K, mask=mask, exact=True)
    got_idx, got_cnt = sharded_ball_query(xyz, centers, R, K, mesh, mask=mask)
    np.testing.assert_array_equal(np.asarray(got_cnt), np.asarray(want_cnt))
    np.testing.assert_array_equal(np.asarray(got_idx), np.asarray(want_idx))


def test_sharded_ball_query_empty_and_overflow(rng, mesh):
    B, N, K, R = 1, 256, 8, 0.3
    xyz = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)).astype(np.float32))
    centers = jnp.concatenate(
        [xyz[:, :4], jnp.full((B, 2, 3), 40.0)], axis=1
    )  # 4 dense hits + 2 empty balls
    want = ops.ball_query(xyz, centers, R, K, exact=True)
    got = sharded_ball_query(xyz, centers, R, K, mesh)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))


def test_sharded_fps_exact(rng, mesh):
    B, N, M = 2, 512, 48
    xyz = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)).astype(np.float32))
    mask = np.ones((B, N), bool)
    mask[:, 450:] = False
    mask_j = jnp.asarray(mask)

    want = ops.furthest_point_sample(xyz, M, mask=mask_j)
    got = sharded_fps(xyz, M, mesh, mask=mask_j)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_sharded_fps_one_collective_per_pick(rng, mesh):
    """The pick loop is collective-latency-bound; the packed-payload design
    must keep it at exactly ONE all_gather per pick (value+index+coords ride
    one [B,5] record), with the seed psum hoisted outside the loop."""
    import re

    import jax

    xyz = jnp.asarray(rng.uniform(-1, 1, (2, 512, 3)).astype(np.float32))
    txt = jax.jit(lambda x: sharded_fps(x, 48, mesh)).lower(xyz).as_text()
    # one while loop; its body region holds the per-pick collectives
    body = txt[txt.index("stablehlo.while") :]
    assert len(re.findall(r'"stablehlo\.all_gather"', body)) == 1
    assert len(re.findall(r'"stablehlo\.all_reduce"', body)) == 0


def test_sharded_knn_exact(rng, mesh):
    B, M, N, k = 2, 33, 512, 3
    q = jnp.asarray(rng.uniform(-1, 1, (B, M, 3)).astype(np.float32))
    s = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)).astype(np.float32))
    mask = jnp.asarray(rng.random((B, N)) < 0.85)

    want_d2, want_idx = ops.knn(q, s, k, support_mask=mask)
    got_d2, got_idx = sharded_knn(q, s, k, mesh, support_mask=mask)
    np.testing.assert_array_equal(np.asarray(got_idx), np.asarray(want_idx))
    np.testing.assert_allclose(
        np.asarray(got_d2), np.asarray(want_d2), atol=1e-6
    )
