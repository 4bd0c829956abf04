"""Chunked (blockwise-M) ball query must equal the direct path."""

import jax.numpy as jnp
import numpy as np

import importlib

# the package __init__ shadows the submodule name with the function
bq = importlib.import_module("tpu3dsad.ops.xla.ball_query")


def test_chunked_equals_direct(rng, monkeypatch):
    B, N, M, K, R = 2, 400, 37, 8, 0.5  # M deliberately not chunk-divisible
    xyz = rng.uniform(-1, 1, (B, N, 3)).astype(np.float32)
    centers = rng.uniform(-1, 1, (B, M, 3)).astype(np.float32)
    mask = rng.random((B, N)) < 0.9

    direct = bq.ball_query(
        jnp.asarray(xyz), jnp.asarray(centers), R, K, jnp.asarray(mask)
    )
    monkeypatch.setattr(bq, "_SLAB_LIMIT", 4096)  # forces ~8-way chunking
    chunked = bq.ball_query(
        jnp.asarray(xyz), jnp.asarray(centers), R, K, jnp.asarray(mask)
    )
    np.testing.assert_array_equal(np.asarray(direct[0]), np.asarray(chunked[0]))
    np.testing.assert_array_equal(np.asarray(direct[1]), np.asarray(chunked[1]))
