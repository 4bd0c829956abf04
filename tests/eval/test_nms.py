"""Shape-static NMS vs a numpy greedy oracle (SURVEY.md §4.4)."""

import jax.numpy as jnp
import numpy as np

from tpu3dsad.ops.nms import nms_aabb


def _nms_oracle(bmin, bmax, scores, valid, thresh):
    """Greedy numpy NMS, score-desc, ties to lower index."""
    K = len(scores)
    order = np.argsort(-np.where(valid, scores, -np.inf), kind="stable")
    keep = np.zeros(K, bool)
    suppressed = np.zeros(K, bool)
    for i in order:
        if not valid[i] or suppressed[i]:
            continue
        keep[i] = True
        for j in range(K):
            if j == i:
                continue
            lo = np.maximum(bmin[i], bmin[j])
            hi = np.minimum(bmax[i], bmax[j])
            inter = np.prod(np.maximum(hi - lo, 0))
            va = np.prod(bmax[i] - bmin[i])
            vb = np.prod(bmax[j] - bmin[j])
            iou = inter / (va + vb - inter) if va + vb - inter > 0 else 0.0
            if iou > thresh:
                suppressed[j] = True
    return keep


def _random_boxes(rng, B, K):
    c = rng.uniform(-2, 2, (B, K, 3)).astype(np.float32)
    s = rng.uniform(0.3, 1.2, (B, K, 3)).astype(np.float32)
    return (c - s / 2), (c + s / 2)


def test_nms_matches_oracle(rng):
    B, K = 3, 40
    bmin, bmax = _random_boxes(rng, B, K)
    scores = rng.random((B, K)).astype(np.float32)
    valid = rng.random((B, K)) < 0.85
    keep = np.asarray(
        nms_aabb(
            jnp.asarray(bmin), jnp.asarray(bmax), jnp.asarray(scores),
            jnp.asarray(valid), 0.25,
        )
    )
    for b in range(B):
        want = _nms_oracle(bmin[b], bmax[b], scores[b], valid[b], 0.25)
        np.testing.assert_array_equal(keep[b], want)


def test_nms_identical_boxes_keep_best():
    bmin = np.zeros((1, 5, 3), np.float32)
    bmax = np.ones((1, 5, 3), np.float32)
    scores = np.array([[0.1, 0.9, 0.5, 0.3, 0.7]], np.float32)
    keep = np.asarray(
        nms_aabb(
            jnp.asarray(bmin), jnp.asarray(bmax), jnp.asarray(scores),
            jnp.ones((1, 5), bool), 0.25,
        )
    )
    np.testing.assert_array_equal(keep[0], [False, True, False, False, False])


def test_class_aware_nms_keeps_other_classes():
    bmin = np.zeros((1, 2, 3), np.float32)
    bmax = np.ones((1, 2, 3), np.float32)
    scores = np.array([[0.9, 0.8]], np.float32)
    sem = np.array([[0, 1]], np.int32)
    keep_agnostic = np.asarray(
        nms_aabb(jnp.asarray(bmin), jnp.asarray(bmax), jnp.asarray(scores),
                 jnp.ones((1, 2), bool), 0.25)
    )
    keep_cls = np.asarray(
        nms_aabb(jnp.asarray(bmin), jnp.asarray(bmax), jnp.asarray(scores),
                 jnp.ones((1, 2), bool), 0.25, sem_cls=jnp.asarray(sem))
    )
    np.testing.assert_array_equal(keep_agnostic[0], [True, False])
    np.testing.assert_array_equal(keep_cls[0], [True, True])


def test_oriented_bev_iou_matches_host_evaluator(rng):
    """jit oriented IoU (polygon clip on device) vs eval/ap.py's numpy
    box3d_iou_oriented on random rotated boxes."""
    from tpu3dsad.eval.ap import box3d_iou_oriented
    from tpu3dsad.ops.boxes import box_corners, oriented_bev_iou

    K = 12
    centers = rng.uniform(-1, 1, (1, K, 3)).astype(np.float32)
    sizes = rng.uniform(0.4, 1.5, (1, K, 3)).astype(np.float32)
    headings = rng.uniform(-np.pi, np.pi, (1, K)).astype(np.float32)
    corners = box_corners(
        jnp.asarray(centers), jnp.asarray(sizes), jnp.asarray(headings)
    )
    import jax

    got = np.asarray(jax.jit(oriented_bev_iou)(corners, corners))[0]
    c_np = np.asarray(corners)[0]
    for i in range(K):
        for j in range(K):
            want = box3d_iou_oriented(c_np[i], c_np[j])
            assert abs(got[i, j] - want) < 1e-4, (i, j, got[i, j], want)
    np.testing.assert_allclose(np.diag(got), 1.0, atol=1e-5)


def test_oriented_nms_suppresses_rotated_duplicates(rng):
    """Two near-identical boxes at 45°: AABB hulls inflate the overlap the
    same way, but a rotated near-duplicate pair with low AABB IoU is only
    suppressed by the oriented path."""
    from tpu3dsad.ops.boxes import box_corners, corners_to_aabb
    from tpu3dsad.ops.nms import nms_aabb, nms_oriented

    # long thin boxes crossing at ±45°: tiny oriented IoU, but both AABB
    # hulls inflate to the same fat square -> huge AABB IoU
    centers = np.zeros((1, 2, 3), np.float32)
    sizes = np.tile(np.array([3.0, 0.3, 0.5], np.float32), (1, 2, 1))
    headings = np.array([[np.pi / 4, -np.pi / 4]], np.float32)
    corners = box_corners(
        jnp.asarray(centers), jnp.asarray(sizes), jnp.asarray(headings)
    )
    scores = jnp.asarray([[0.9, 0.8]])
    valid = jnp.ones((1, 2), bool)

    keep_o = np.asarray(nms_oriented(corners, scores, valid, 0.25))
    assert keep_o.sum() == 2  # crossing boxes overlap ~3% oriented — both kept

    bmin, bmax = corners_to_aabb(corners)
    keep_a = np.asarray(nms_aabb(bmin, bmax, scores, valid, 0.25))
    assert keep_a.sum() == 1  # AABB hulls are near-identical squares

    # true duplicates (same pose, slight shift) are suppressed by both
    centers2 = np.array([[[0, 0, 0], [0.05, 0, 0]]], np.float32)
    sizes2 = np.tile(np.array([1.0, 0.6, 0.5], np.float32), (1, 2, 1))
    headings2 = np.array([[0.7, 0.7]], np.float32)
    c2 = box_corners(jnp.asarray(centers2), jnp.asarray(sizes2),
                     jnp.asarray(headings2))
    keep2 = np.asarray(nms_oriented(c2, scores, valid, 0.25))
    assert keep2.tolist() == [[True, False]]


def test_oriented_nms_class_aware(rng):
    from tpu3dsad.ops.boxes import box_corners
    from tpu3dsad.ops.nms import nms_oriented

    centers = np.zeros((1, 2, 3), np.float32)
    sizes = np.ones((1, 2, 3), np.float32)
    headings = np.zeros((1, 2), np.float32)
    corners = box_corners(jnp.asarray(centers), jnp.asarray(sizes),
                          jnp.asarray(headings))
    scores = jnp.asarray([[0.9, 0.8]])
    valid = jnp.ones((1, 2), bool)
    # identical boxes, different classes -> both survive class-aware NMS
    keep = np.asarray(
        nms_oriented(corners, scores, valid, 0.25,
                     sem_cls=jnp.asarray([[0, 1]]))
    )
    assert keep.sum() == 2


def test_bev_nms_ignores_z(rng):
    """eval.use_3d_nms=False: two boxes overlapping in BEV but stacked at
    different heights ARE suppressed by BEV NMS, kept by 3D NMS."""
    from tpu3dsad.ops.nms import nms_bev

    bmin = jnp.asarray([[[0, 0, 0], [0.1, 0.1, 5.0]]], jnp.float32)
    bmax = jnp.asarray([[[1, 1, 1], [1.1, 1.1, 6.0]]], jnp.float32)
    scores = jnp.asarray([[0.9, 0.8]])
    valid = jnp.ones((1, 2), bool)
    keep3d = np.asarray(nms_aabb(bmin, bmax, scores, valid, 0.25))
    keep2d = np.asarray(nms_bev(bmin, bmax, scores, valid, 0.25))
    assert keep3d.sum() == 2  # no 3D overlap (disjoint z)
    assert keep2d.tolist() == [[True, False]]  # ~0.66 BEV IoU
