"""parse_predictions / predictions_to_lists semantics."""

import jax.numpy as jnp
import numpy as np

from tpu3dsad.config import EvalConfig
from tpu3dsad.eval.parse import parse_predictions, predictions_to_lists


def _end_points(rng, B=1, P=6, NC=3, NH=12):
    """Proposals: two overlapping confident boxes + one far low-conf box +
    padded/invalid slots."""
    centers = np.zeros((B, P, 3), np.float32)
    centers[0, 0] = [0, 0, 0]
    centers[0, 1] = [0.05, 0, 0]  # near-duplicate of 0
    centers[0, 2] = [5, 5, 0]     # distinct, low confidence
    centers[0, 3:] = 50.0

    obj = np.full((B, P, 2), 0.0, np.float32)
    obj[0, 0] = [0, 4.0]   # conf ~0.98
    obj[0, 1] = [0, 3.0]   # conf ~0.95, suppressed by NMS vs 0
    obj[0, 2] = [2.0, 0]   # conf ~0.12 > 0.05 threshold
    obj[0, 3:] = [9.0, 0]  # conf ~0 -> below objectness threshold

    ep = {
        "proposal_xyz": jnp.asarray(centers),
        "proposal_mask": jnp.asarray(np.ones((B, P), bool)),
        "center": jnp.asarray(centers),
        "objectness_scores": jnp.asarray(obj),
        "heading_scores": jnp.asarray(np.zeros((B, P, NH), np.float32)),
        "heading_residuals_normalized": jnp.asarray(np.zeros((B, P, NH), np.float32)),
        "heading_residuals": jnp.asarray(np.zeros((B, P, NH), np.float32)),
        "size_scores": jnp.asarray(np.zeros((B, P, NC), np.float32)),
        "size_residuals_normalized": jnp.asarray(np.zeros((B, P, NC, 3), np.float32)),
        "size_residuals": jnp.asarray(np.zeros((B, P, NC, 3), np.float32)),
        "sem_cls_scores": jnp.asarray(np.zeros((B, P, NC), np.float32)),
        "scale_logits": jnp.asarray(np.zeros((B, P, 3), np.float32)),
    }
    return ep


def test_parse_thresholds_and_nms(rng):
    mean_sizes = np.ones((3, 3), np.float32)
    cfg = EvalConfig(cls_nms=False, per_class_proposal=False)
    parsed = parse_predictions(_end_points(rng), mean_sizes, 12, cfg)
    keep = np.asarray(parsed["keep"])[0]
    assert keep[0]  # highest conf survives
    assert not keep[1]  # duplicate suppressed
    assert keep[2]  # distinct box above objectness threshold
    assert not keep[3:].any()  # below threshold


def test_predictions_to_lists_per_class(rng):
    mean_sizes = np.ones((3, 3), np.float32)
    cfg = EvalConfig(cls_nms=False, per_class_proposal=True, conf_thresh=0.01)
    parsed = parse_predictions(_end_points(rng), mean_sizes, 12, cfg)
    lists = predictions_to_lists(parsed, cfg, num_classes=3)
    assert len(lists) == 1
    kept = int(np.asarray(parsed["keep"]).sum())
    # per-class proposal: every kept box contributes one entry per class
    # above conf threshold (uniform sem -> all 3 classes)
    assert len(lists[0]) == kept * 3
    cls_set = {c for c, _, _ in lists[0]}
    assert cls_set == {0, 1, 2}
    for _, corners, score in lists[0]:
        assert corners.shape == (8, 3)
        assert 0 < score <= 1


def test_predictions_to_lists_matches_reference_loop(rng):
    """Vectorized emission == the original triple loop, including order."""
    from tpu3dsad.config import EvalConfig
    from tpu3dsad.eval.parse import predictions_to_lists

    B, P, C = 3, 32, 6
    parsed = {
        "keep": rng.random((B, P)) < 0.5,
        "corners": rng.standard_normal((B, P, 8, 3)).astype(np.float32),
        "obj_prob": rng.random((B, P)).astype(np.float32),
        "sem_prob": rng.random((B, P, C)).astype(np.float32),
        "sem_cls": rng.integers(0, C, (B, P)).astype(np.int32),
    }

    def reference(cfg):
        # the lineage ap_helper loop: conf gate on obj_prob alone;
        # per_class_proposal iterates class-major and emits EVERY class of
        # a kept proposal at sem_prob[c]*obj_prob; otherwise obj_prob scores
        out = []
        for b in range(B):
            dets = []
            if cfg.per_class_proposal:
                for c in range(C):
                    for p in range(P):
                        if (parsed["keep"][b, p]
                                and parsed["obj_prob"][b, p] > cfg.conf_thresh):
                            s = parsed["obj_prob"][b, p] * parsed["sem_prob"][b, p, c]
                            dets.append((c, parsed["corners"][b, p], float(s)))
            else:
                for p in range(P):
                    if (parsed["keep"][b, p]
                            and parsed["obj_prob"][b, p] > cfg.conf_thresh):
                        sc = int(parsed["sem_cls"][b, p])
                        dets.append((sc, parsed["corners"][b, p],
                                     float(parsed["obj_prob"][b, p])))
            out.append(dets)
        return out

    for pcp in (True, False):
        cfg = EvalConfig(per_class_proposal=pcp, conf_thresh=0.2)
        got = predictions_to_lists(parsed, cfg, C)
        want = reference(cfg)
        assert len(got) == len(want)
        for gb, wb in zip(got, want):
            assert len(gb) == len(wb)
            for (gc, gcor, gs), (wc, wcor, ws) in zip(gb, wb):
                assert gc == wc and abs(gs - ws) < 1e-6
                np.testing.assert_array_equal(gcor, wcor)
