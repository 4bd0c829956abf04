"""Native C++ preproc library vs numpy oracles (builds with g++ on first use)."""

import numpy as np
import pytest

from tpu3dsad.utils import native


@pytest.fixture(scope="module", autouse=True)
def _require_native():
    if not native.available():
        pytest.skip("g++ build unavailable — numpy fallbacks cover the API")


def test_native_fps_matches_oracle(rng):
    from tpu3dsad.ops.oracle import fps_oracle

    pts = rng.standard_normal((500, 3)).astype(np.float32)
    np.testing.assert_array_equal(native.fps(pts, 64), fps_oracle(pts, 64))
    mask = np.ones(500, bool)
    mask[400:] = False
    np.testing.assert_array_equal(
        native.fps(pts, 64, mask), fps_oracle(pts, 64, mask)
    )


def test_native_vote_targets_matches_python(rng):
    from tpu3dsad.data.sunrgbd import points_in_oriented_box

    pts = rng.uniform(-3, 3, (400, 3)).astype(np.float32)
    boxes = np.array(
        [
            [0, 0, 0, 2, 1.5, 1, 0.4, 1],
            [1, 1, 0.2, 1, 1, 0.8, -0.3, 0],
        ],
        np.float32,
    )
    votes, vmask = native.vote_targets(pts, boxes)

    want_votes = np.zeros((400, 3), np.float32)
    want_mask = np.zeros(400, bool)
    for b in boxes:
        inside = points_in_oriented_box(pts, b[:3], b[3:6], b[6])
        want_votes[inside] = b[:3] - pts[inside]
        want_mask |= inside
    np.testing.assert_array_equal(vmask, want_mask)
    np.testing.assert_allclose(votes, want_votes, atol=1e-6)


def test_native_range_crop(rng):
    pts = rng.uniform(-10, 10, (300, 3)).astype(np.float32)
    lo, hi = [-2, -3, -1], [5, 4, 2]
    got = native.range_crop(pts, lo, hi)
    want = np.nonzero(np.all((pts >= lo) & (pts <= hi), -1))[0]
    np.testing.assert_array_equal(got, want)


def test_native_fps_speed_at_kitti_scale(rng):
    """Sanity: native FPS should chew 120k→2k in well under a second."""
    import time

    pts = rng.standard_normal((122880, 3)).astype(np.float32)
    t0 = time.time()
    idx = native.fps(pts, 2048)
    dt = time.time() - t0
    assert len(set(idx.tolist())) == 2048
    assert dt < 5.0, dt


def test_native_fps_degenerate_sizes():
    """m=0 -> empty; n=0 with m>0 -> defined zeros (regression: the early
    return left np.empty garbage indices)."""
    import numpy as np

    from tpu3dsad.utils import native

    pts = np.zeros((0, 3), np.float32)
    out = native.fps(pts, 4)
    assert out.shape == (4,) and (out == 0).all()
    assert native.fps(np.zeros((5, 3), np.float32), 0).shape == (0,)
