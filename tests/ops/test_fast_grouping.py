"""Fast (approx_max_k) grouping mode: members stay in-ball, switch works."""

import jax.numpy as jnp
import numpy as np

from tpu3dsad import ops


def test_fast_mode_members_in_ball(rng):
    B, N, M, K, R = 2, 500, 32, 16, 0.5
    xyz = rng.uniform(-1, 1, (B, N, 3)).astype(np.float32)
    centers = xyz[:, :M]
    idx, cnt = ops.ball_query(
        jnp.asarray(xyz), jnp.asarray(centers), R, K, exact=False
    )
    idx, cnt = np.asarray(idx), np.asarray(cnt)
    grouped = np.stack([xyz[b][idx[b]] for b in range(B)])
    d = np.linalg.norm(grouped - centers[:, :, None, :], axis=-1)
    slot_real = np.arange(K)[None, None, :] < cnt[:, :, None]
    assert (d[slot_real] < R + 1e-5).all()
    assert cnt.max() <= K and (cnt >= 1).all()  # center itself always hits


def test_global_switch(rng):
    xyz = jnp.asarray(rng.uniform(-1, 1, (1, 100, 3)).astype(np.float32))
    assert not ops.get_fast_grouping()
    ops.set_fast_grouping(True)
    try:
        assert ops.get_fast_grouping()
        idx, cnt = ops.ball_query(xyz, xyz[:, :4], 0.4, 8)
        assert idx.shape == (1, 4, 8)
    finally:
        ops.set_fast_grouping(False)
    assert not ops.get_fast_grouping()
