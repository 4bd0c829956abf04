"""FPS: oracle parity, set properties, masking invariance (SURVEY.md §4.1/4.3)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu3dsad import ops
from tpu3dsad.ops.oracle import fps_oracle

IMPLS = ["xla"]


@pytest.mark.parametrize("impl", IMPLS)
def test_fps_matches_oracle(rng, impl):
    B, N, M = 3, 257, 64
    xyz = rng.standard_normal((B, N, 3)).astype(np.float32)
    got = np.asarray(ops.furthest_point_sample(jnp.asarray(xyz), M, impl=impl))
    for b in range(B):
        want = fps_oracle(xyz[b], M)
        np.testing.assert_array_equal(got[b], want)


@pytest.mark.parametrize("impl", IMPLS)
def test_fps_properties(rng, impl):
    B, N, M = 2, 200, 50
    xyz = rng.standard_normal((B, N, 3)).astype(np.float32)
    idx = np.asarray(ops.furthest_point_sample(jnp.asarray(xyz), M, impl=impl))
    assert idx.dtype == np.int32
    assert (idx >= 0).all() and (idx < N).all()
    # seed index 0, and all picks distinct (generic positions)
    assert (idx[:, 0] == 0).all()
    for b in range(B):
        assert len(set(idx[b].tolist())) == M


@pytest.mark.parametrize("impl", IMPLS)
def test_fps_mask_invariance(rng, impl):
    """Appending padded garbage points must not change the sample."""
    B, N, M, PAD = 2, 128, 32, 96
    xyz = rng.standard_normal((B, N, 3)).astype(np.float32)
    base = np.asarray(ops.furthest_point_sample(jnp.asarray(xyz), M, impl=impl))

    garbage = 100.0 * rng.standard_normal((B, PAD, 3)).astype(np.float32)
    padded = np.concatenate([xyz, garbage], axis=1)
    mask = np.concatenate(
        [np.ones((B, N), bool), np.zeros((B, PAD), bool)], axis=1
    )
    got = np.asarray(
        ops.furthest_point_sample(
            jnp.asarray(padded), M, mask=jnp.asarray(mask), impl=impl
        )
    )
    np.testing.assert_array_equal(got, base)
