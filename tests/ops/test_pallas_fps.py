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


def test_fps_kernel_fuzz_sweep_vs_oracle(rng):
    """Seeded sweep over random (B,N,M,mask) configs — the Pallas FPS must
    match the numpy oracle exactly on every draw (interpret mode)."""
    import numpy as np

    from tpu3dsad.ops.oracle import fps_oracle

    for trial in range(10):
        trng = np.random.default_rng(2000 + trial)
        B = int(trng.integers(1, 4))
        N = int(trng.choice([64, 128, 200, 256, 512]))
        M = int(trng.integers(4, min(N, 64)))
        spread = float(trng.uniform(0.3, 4.0))
        xyz = trng.uniform(-spread, spread, (B, N, 3)).astype(np.float32)
        mask = (
            trng.random((B, N)) < 0.8 if trng.random() < 0.5 else None
        )
        if mask is not None:
            mask[:, 0] = True  # seed index 0 must be valid (CUDA semantics)
        got = np.asarray(
            fps_pallas(
                jnp.asarray(xyz), M,
                mask=None if mask is None else jnp.asarray(mask),
            )
        )
        for b in range(B):
            want = fps_oracle(xyz[b], M, mask=None if mask is None else mask[b])
            np.testing.assert_array_equal(
                got[b], want, err_msg=f"trial {trial}"
            )


def test_pallas_fps_operand_chunking_path(rng, monkeypatch):
    """Large-operand batches split into per-group pallas calls (the whole
    [3,Bp,Np] operand otherwise lands as one scoped-VMEM stack copy —
    b=32 N=40960 overflowed the 16MB limit by 44K). Forcing the threshold
    down must give bitwise-identical picks to the unchunked call."""
    import tpu3dsad.ops.pallas.fps as pf

    B, N, M = 16, 256, 32
    xyz = rng.uniform(-2, 2, (B, N, 3)).astype(np.float32)
    ref = np.asarray(fps_pallas(jnp.asarray(xyz), M))
    monkeypatch.setattr(pf, "_OPERAND_STACK_LIMIT", 1)  # force chunking
    monkeypatch.setattr(pf, "MAX_KERNEL_N", 256)  # G=8 → nG=2 at B=16
    pf._fps_call.clear_cache()
    got = np.asarray(fps_pallas(jnp.asarray(xyz), M))
    pf._fps_call.clear_cache()
    np.testing.assert_array_equal(got, ref)
    for b in range(B):
        np.testing.assert_array_equal(got[b], fps_oracle(xyz[b], M))
