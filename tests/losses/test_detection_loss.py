"""Golden loss tests: hand-built perfect predictions → near-zero losses;
known corruptions move the right component (SURVEY.md §4.4)."""

import jax.numpy as jnp
import numpy as np

from tpu3dsad import losses
from tpu3dsad.data.synthetic import class_mean_sizes
from tpu3dsad.ops.boxes import angle_to_bin

NH = 12
NC = 4
MS = class_mean_sizes(NC)


def _scene(rng, B=1, P=8, G=3, S=16, N=64):
    """Perfect end_points/batch pair: first G proposals sit on the G GT."""
    gt_centers = rng.uniform(-2, 2, (B, G, 3)).astype(np.float32)
    gt_classes = rng.integers(0, NC, (B, G)).astype(np.int32)
    gt_sizes = (MS[gt_classes] * rng.uniform(0.9, 1.1, (B, G, 3))).astype(
        np.float32
    )
    gt_headings = rng.uniform(-np.pi, np.pi, (B, G)).astype(np.float32)

    pad = 5  # max_boxes = G + pad
    batch = {
        "gt_centers": np.concatenate(
            [gt_centers, np.zeros((B, pad, 3), np.float32)], 1
        ),
        "gt_sizes": np.concatenate([gt_sizes, np.zeros((B, pad, 3), np.float32)], 1),
        "gt_headings": np.concatenate(
            [gt_headings, np.zeros((B, pad), np.float32)], 1
        ),
        "gt_classes": np.concatenate(
            [gt_classes, np.zeros((B, pad), np.int32)], 1
        ),
        "gt_mask": np.concatenate([np.ones((B, G), bool), np.zeros((B, pad), bool)], 1),
        "vote_targets": np.zeros((B, N, 3), np.float32),
        "vote_mask": np.zeros((B, N), bool),
    }

    # proposals: first G exactly on GT centers, the rest far away
    prop_xyz = np.full((B, P, 3), 50.0, np.float32)
    prop_xyz[:, :G] = gt_centers
    BIG = 10.0

    hbin, hres = angle_to_bin(jnp.asarray(gt_headings), NH)
    hbin, hres = np.asarray(hbin), np.asarray(hres)

    heading_scores = np.zeros((B, P, NH), np.float32)
    heading_res_norm = np.zeros((B, P, NH), np.float32)
    size_scores = np.zeros((B, P, NC), np.float32)
    size_res_norm = np.zeros((B, P, NC, 3), np.float32)
    sem_scores = np.zeros((B, P, NC), np.float32)
    objectness = np.zeros((B, P, 2), np.float32)
    objectness[:, :, 0] = BIG  # default: confident negative
    scale_logits = np.zeros((B, P, 3), np.float32)
    bank = np.array([0.15, 0.3, 0.6], np.float32)

    for b in range(B):
        for g in range(G):
            heading_scores[b, g, hbin[b, g]] = BIG
            heading_res_norm[b, g, hbin[b, g]] = hres[b, g] / (np.pi / NH)
            cls = gt_classes[b, g]
            size_scores[b, g, cls] = BIG
            size_res_norm[b, g, cls] = (gt_sizes[b, g] - MS[cls]) / MS[cls]
            sem_scores[b, g, cls] = BIG
            objectness[b, g] = [0.0, BIG]
            tgt = np.argmin(np.abs(0.5 * gt_sizes[b, g, :2].mean() - bank))
            scale_logits[b, g, tgt] = BIG

    end_points = {
        "proposal_xyz": prop_xyz,
        "proposal_mask": np.ones((B, P), bool),
        "center": prop_xyz.copy(),
        "objectness_scores": objectness,
        "heading_scores": heading_scores,
        "heading_residuals_normalized": heading_res_norm,
        "heading_residuals": heading_res_norm * (np.pi / NH),
        "size_scores": size_scores,
        "size_residuals_normalized": size_res_norm,
        "size_residuals": size_res_norm * MS[None, None],
        "sem_cls_scores": sem_scores,
        "scale_logits": scale_logits,
        "seed_xyz": np.zeros((B, S, 3), np.float32),
        "seed_inds": np.zeros((B, S), np.int32),
        "seed_mask": np.ones((B, S), bool),
        "vote_xyz": np.zeros((B, S, 3), np.float32),
    }
    ep = {k: jnp.asarray(v) for k, v in end_points.items()}
    bj = {k: jnp.asarray(v) for k, v in batch.items()}
    return ep, bj


def test_perfect_predictions_near_zero_loss(rng):
    ep, batch = _scene(rng)
    total, m = losses.detection_loss(ep, batch, MS, NH, (0.15, 0.3, 0.6))
    for k in [
        "objectness_loss", "heading_cls_loss", "heading_reg_loss",
        "size_cls_loss", "size_reg_loss", "sem_cls_loss", "scale_sel_loss",
    ]:
        assert float(m[k]) < 1e-3, (k, float(m[k]))
    # forward center chamfer is 0; backward (GT→pred) is 0 too
    assert float(m["center_loss"]) < 1e-3
    assert float(m["obj_acc"]) == 1.0


def test_corrupted_center_moves_center_loss(rng):
    ep, batch = _scene(rng)
    ep2 = dict(ep)
    ep2["center"] = ep["center"] + 0.5
    _, m0 = losses.detection_loss(ep, batch, MS, NH, (0.15, 0.3, 0.6))
    _, m1 = losses.detection_loss(ep2, batch, MS, NH, (0.15, 0.3, 0.6))
    # huber(0.5*sqrt(3)) fwd + bwd on every positive ≈ 0.7; demand a clear move
    assert float(m1["center_loss"]) > float(m0["center_loss"]) + 0.2
    assert abs(float(m1["sem_cls_loss"]) - float(m0["sem_cls_loss"])) < 1e-6


def test_wrong_semantics_moves_sem_loss(rng):
    ep, batch = _scene(rng)
    ep2 = dict(ep)
    ep2["sem_cls_scores"] = jnp.roll(ep["sem_cls_scores"], 1, axis=-1)
    _, m0 = losses.detection_loss(ep, batch, MS, NH, (0.15, 0.3, 0.6))
    _, m1 = losses.detection_loss(ep2, batch, MS, NH, (0.15, 0.3, 0.6))
    assert float(m1["sem_cls_loss"]) > 1.0


def test_vote_loss_multi_gt_takes_min(rng):
    """[B,N,V,3] vote targets: loss uses the nearest of the V candidates."""
    ep, batch = _scene(rng)
    B, S, _ = np.asarray(ep["seed_xyz"]).shape
    N = 64
    vt = np.zeros((B, N, 2, 3), np.float32)
    vt[:, :, 0, 0] = 5.0  # far candidate
    vt[:, :, 1, 0] = 1.0  # near candidate -> min |err| = 1
    vm = np.ones((B, N), bool)
    batch = dict(batch)
    batch["vote_targets"] = jnp.asarray(vt)
    batch["vote_mask"] = jnp.asarray(vm)
    ep = dict(ep)
    ep["seed_inds"] = jnp.asarray(np.tile(np.arange(S, dtype=np.int32), (B, 1)))
    v = losses.vote_loss(ep, batch)
    np.testing.assert_allclose(float(v), 1.0, atol=1e-6)


def test_vote_loss_golden(rng):
    ep, batch = _scene(rng)
    B, S, _ = ep["seed_xyz"].shape
    # seeds at origin, GT offset = +1 in x for the first half of seeds
    vt = np.zeros((B, 64, 3), np.float32)
    vt[:, :, 0] = 1.0
    vm = np.zeros((B, 64), bool)
    vm[:, :32] = True
    batch = dict(batch)
    batch["vote_targets"] = jnp.asarray(vt)
    batch["vote_mask"] = jnp.asarray(vm)
    ep = dict(ep)
    ep["seed_inds"] = jnp.asarray(np.tile(np.arange(S, dtype=np.int32), (B, 1)))
    # predicted votes = seeds (zero offset) -> |error| = 1 per voting seed
    v = losses.vote_loss(ep, batch)
    np.testing.assert_allclose(float(v), 1.0, atol=1e-6)


def test_vote_loss_factor_min_over_copies(rng):
    """vote_factor F>1: only the BEST of the F vote copies per seed is
    penalized (lineage compute_vote_loss min-over-votes; ADVICE r1)."""
    ep, batch = _scene(rng)
    B, S, _ = np.asarray(ep["seed_xyz"]).shape
    vt = np.zeros((B, 64, 3), np.float32)
    vt[:, :, 0] = 1.0  # GT offset +1 in x for every point
    vm = np.ones((B, 64), bool)
    batch = dict(batch)
    batch["vote_targets"] = jnp.asarray(vt)
    batch["vote_mask"] = jnp.asarray(vm)
    ep = dict(ep)
    ep["seed_inds"] = jnp.asarray(np.tile(np.arange(S, dtype=np.int32), (B, 1)))
    # two vote copies per seed, F innermost (VotingModule layout):
    # copy 0 perfect (at GT center), copy 1 off by 3 -> min => loss 0
    votes = np.zeros((B, S, 2, 3), np.float32)
    votes[:, :, 0, 0] = 1.0   # perfect
    votes[:, :, 1, 0] = -2.0  # |(-2) - 1| = 3 ignored by the min
    ep["vote_xyz"] = jnp.asarray(votes.reshape(B, S * 2, 3))
    v = losses.vote_loss(ep, batch)
    np.testing.assert_allclose(float(v), 0.0, atol=1e-6)
    # averaging instead of min would give 1.5


def test_scene_mask_excludes_padded_scenes_exactly(rng):
    """batch["scene_mask"] must remove padded (wrap-around duplicate)
    scenes' contribution EXACTLY: loss over [real ; corrupted-duplicates]
    with scene_mask == loss over the real scenes alone."""
    ep4, b4 = _scene(rng, B=4)
    # make the padded half (scenes 2,3) maximally wrong so any leakage
    # into the loss is visible
    ep_bad = dict(ep4)
    ep_bad["center"] = ep4["center"].at[2:].add(37.0)
    ep_bad["objectness_scores"] = ep4["objectness_scores"].at[2:].multiply(-1)
    ep_bad["sem_cls_scores"] = ep4["sem_cls_scores"].at[2:].multiply(-1)
    b_masked = dict(b4)
    b_masked["scene_mask"] = jnp.array([True, True, False, False])

    ep2 = {k: v[:2] for k, v in ep4.items()}
    b2 = {k: v[:2] for k, v in b4.items()}

    loss_masked, m_masked = losses.detection_loss(
        ep_bad, b_masked, MS, NH, (0.15, 0.3, 0.6)
    )
    loss_real, m_real = losses.detection_loss(ep2, b2, MS, NH, (0.15, 0.3, 0.6))
    np.testing.assert_allclose(
        float(loss_masked), float(loss_real), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(m_masked["obj_acc"]), float(m_real["obj_acc"]), rtol=1e-6
    )


def test_assign_thresholds_configurable(rng):
    """model.assign_near/far scale the objectness zone (the lineage's
    0.3/0.6 m indoor constants assign nothing at outdoor scale)."""
    ep, batch = _scene(rng, B=1)
    # push proposals ~1 m off their GT centers: indoor thresholds see no
    # positives, a 2 m near-zone recovers them
    ep2 = dict(ep)
    ep2["proposal_xyz"] = ep["proposal_xyz"] + 1.0
    ep2["center"] = ep2["proposal_xyz"]
    pos_i, neg_i, _ = losses.assign_proposals(ep2, batch)
    pos_o, neg_o, _ = losses.assign_proposals(ep2, batch, near=2.0, far=4.0)
    assert not bool(pos_i.any())  # indoor constants: nothing positive
    assert bool(pos_o.any())      # outdoor zone: the shifted matches count
    _, m_i = losses.detection_loss(ep2, batch, MS, NH, (0.15, 0.3, 0.6))
    _, m_o = losses.detection_loss(ep2, batch, MS, NH, (0.15, 0.3, 0.6),
                                   near=2.0, far=4.0)
    assert float(m_o["pos_ratio"]) > float(m_i["pos_ratio"])


def test_center_loss_norm(rng):
    """model.center_loss_norm rescales the chamfer unit: norm=1 is the
    lineage recipe BITWISE; norm=c divides the squared chamfer by c²
    (outdoor configs keep car-scale distances at the indoor magnitude)."""
    ep, batch = _scene(rng)
    ep2 = dict(ep)
    ep2["center"] = ep["center"] + 0.7  # nonzero chamfer
    _, m1 = losses.detection_loss(ep2, batch, MS, NH, (0.15, 0.3, 0.6))
    _, m1b = losses.detection_loss(ep2, batch, MS, NH, (0.15, 0.3, 0.6),
                                   center_norm=1.0)
    assert float(m1["center_loss"]) == float(m1b["center_loss"])  # bitwise
    _, m2 = losses.detection_loss(ep2, batch, MS, NH, (0.15, 0.3, 0.6),
                                  center_norm=2.0)
    np.testing.assert_allclose(
        float(m2["center_loss"]), float(m1["center_loss"]) / 4.0, rtol=1e-6
    )
    # only the center term (and the totals built from it) moves
    assert float(m2["vote_loss"]) == float(m1["vote_loss"])
    assert float(m2["objectness_loss"]) == float(m1["objectness_loss"])
