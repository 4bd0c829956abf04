"""Pallas FPS kernel parity vs oracle + XLA tier (interpret mode on CPU —
catches OOB/masking bugs per SURVEY.md §5 'race detection' analogue)."""

import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from tpu3dsad.ops.oracle import fps_oracle
from tpu3dsad.ops.pallas.fps import furthest_point_sample as fps_pallas
from tpu3dsad.ops.xla.fps import furthest_point_sample as fps_xla


@pytest.fixture(autouse=True)
def _interpret():
    with pltpu.force_tpu_interpret_mode():
        yield


def test_pallas_fps_matches_oracle(rng):
    B, N, M = 2, 300, 64
    xyz = rng.uniform(-2, 2, (B, N, 3)).astype(np.float32)
    got = np.asarray(fps_pallas(jnp.asarray(xyz), M))
    for b in range(B):
        np.testing.assert_array_equal(got[b], fps_oracle(xyz[b], M))


def test_pallas_fps_masked_matches_xla(rng):
    B, N, M, PAD = 2, 200, 48, 56
    xyz = rng.uniform(-2, 2, (B, N, 3)).astype(np.float32)
    garbage = 100.0 * np.ones((B, PAD, 3), np.float32)
    padded = np.concatenate([xyz, garbage], 1)
    mask = np.concatenate([np.ones((B, N), bool), np.zeros((B, PAD), bool)], 1)
    a = np.asarray(fps_pallas(jnp.asarray(padded), M, mask=jnp.asarray(mask)))
    b = np.asarray(fps_xla(jnp.asarray(padded), M, mask=jnp.asarray(mask)))
    np.testing.assert_array_equal(a, b)


def test_pallas_fps_flat_large_n_path(rng, monkeypatch):
    """B=1 large-N variant ([S,L] plane layout) matches the oracle."""
    import tpu3dsad.ops.pallas.fps as pf

    monkeypatch.setattr(pf, "MAX_KERNEL_N", 128)  # force the flat path
    N, M = 1000, 48
    xyz = rng.uniform(-2, 2, (1, N, 3)).astype(np.float32)
    mask = np.ones((1, N), bool)
    mask[0, 800:] = False
    got = np.asarray(
        pf.furthest_point_sample(jnp.asarray(xyz), M, mask=jnp.asarray(mask))
    )
    np.testing.assert_array_equal(got[0], fps_oracle(xyz[0], M, mask[0]))


def test_pallas_fps_nonaligned_n(rng):
    """N not a multiple of 128 exercises the internal lane padding."""
    B, N, M = 1, 131, 16
    xyz = rng.uniform(-2, 2, (B, N, 3)).astype(np.float32)
    got = np.asarray(fps_pallas(jnp.asarray(xyz), M))
    np.testing.assert_array_equal(got[0], fps_oracle(xyz[0], M))
