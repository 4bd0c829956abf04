"""kNN / three_nn / three_interpolate: oracle parity + gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu3dsad import ops
from tpu3dsad.ops.oracle import (
    interp_weights_oracle,
    knn_oracle,
    three_interpolate_oracle,
)

IMPLS = ["xla"]


@pytest.mark.parametrize("impl", IMPLS)
def test_knn_matches_oracle(rng, impl):
    B, M, N, k = 2, 37, 211, 3
    q = rng.standard_normal((B, M, 3)).astype(np.float32)
    s = rng.standard_normal((B, N, 3)).astype(np.float32)
    d2, idx = ops.knn(jnp.asarray(q), jnp.asarray(s), k, impl=impl)
    d2, idx = np.asarray(d2), np.asarray(idx)
    for b in range(B):
        wd2, widx = knn_oracle(q[b], s[b], k)
        np.testing.assert_array_equal(idx[b], widx)
        np.testing.assert_allclose(d2[b], wd2, atol=1e-4)


@pytest.mark.parametrize("impl", IMPLS)
def test_knn_support_mask(rng, impl):
    B, M, N, PAD = 1, 10, 50, 30
    q = rng.standard_normal((B, M, 3)).astype(np.float32)
    s = rng.standard_normal((B, N, 3)).astype(np.float32)
    _, base_idx = ops.knn(jnp.asarray(q), jnp.asarray(s), 3, impl=impl)
    # pad support with copies of the queries themselves (would all be 0-dist)
    padded = np.concatenate([s, np.repeat(q[:, :1], PAD, 1)], axis=1)
    mask = np.concatenate([np.ones((B, N), bool), np.zeros((B, PAD), bool)], 1)
    _, idx = ops.knn(
        jnp.asarray(q), jnp.asarray(padded), 3,
        support_mask=jnp.asarray(mask), impl=impl,
    )
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(base_idx))


@pytest.mark.parametrize("impl", IMPLS)
def test_three_interpolate_matches_oracle(rng, impl):
    B, N, M, C = 2, 64, 100, 7
    feats = rng.standard_normal((B, N, C)).astype(np.float32)
    q = rng.standard_normal((B, M, 3)).astype(np.float32)
    s = rng.standard_normal((B, N, 3)).astype(np.float32)
    d2, idx = ops.three_nn(jnp.asarray(q), jnp.asarray(s), impl=impl)
    w = ops.interp_weights(d2)
    out = np.asarray(ops.three_interpolate(jnp.asarray(feats), idx, w, impl=impl))
    for b in range(B):
        wd2, widx = knn_oracle(q[b], s[b], 3)
        ww = interp_weights_oracle(wd2)
        want = three_interpolate_oracle(feats[b], widx, ww)
        np.testing.assert_allclose(out[b], want, atol=1e-4)


def test_three_interpolate_grad_is_scatter_add(rng):
    """VJP w.r.t. features must scatter each output grad to its 3 supports."""
    B, N, M, C = 1, 16, 5, 4
    feats = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N, (B, M, 3)), dtype=jnp.int32)
    w = jax.nn.softmax(jnp.asarray(rng.standard_normal((B, M, 3))), axis=-1)

    g = jax.grad(lambda f: jnp.sum(ops.three_interpolate(f, idx, w)))(feats)
    want = np.zeros((B, N, C), np.float32)
    for m in range(M):
        for k in range(3):
            want[0, int(idx[0, m, k])] += float(w[0, m, k])
    np.testing.assert_allclose(np.asarray(g), want, atol=1e-5)
