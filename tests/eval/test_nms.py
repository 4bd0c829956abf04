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
