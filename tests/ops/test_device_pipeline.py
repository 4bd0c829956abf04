"""On-device augmentation + synthetic generation (data/device_pipeline.py).

The key invariant (what makes device augmentation EXACTLY equivalent to the
lineage's recompute-votes-after-augment): vote offsets transform linearly,
so an augmented voting point + its augmented offset must still land on its
owner's augmented center.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tpu3dsad.data.device_pipeline import (
    augment_batch,
    synthetic_detection_batch,
)
from tpu3dsad.data.synthetic import detection_batch


def _vote_consistency(batch):
    """Every voting point + offset lands exactly on a GT center."""
    pts = np.asarray(batch["points"])
    votes = np.asarray(batch["vote_targets"])
    vm = np.asarray(batch["vote_mask"])
    gc = np.asarray(batch["gt_centers"])
    gm = np.asarray(batch["gt_mask"])
    for b in range(pts.shape[0]):
        if not vm[b].any():
            continue
        tgt = pts[b][vm[b]] + votes[b][vm[b]]
        d = np.linalg.norm(tgt[:, None] - gc[b][gm[b]][None], axis=-1)
        assert d.min(axis=-1).max() < 1e-4, d.min(axis=-1).max()


def test_augment_preserves_vote_consistency(rng):
    b = detection_batch(rng, 2, 512, 4, max_boxes=8)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    out = jax.jit(augment_batch)(batch, jax.random.key(3))
    _vote_consistency(out)
    # headings wrapped
    h = np.asarray(out["gt_headings"])
    assert (h >= -np.pi - 1e-6).all() and (h <= np.pi + 1e-6).all()
    # some transform actually happened
    assert not np.allclose(np.asarray(out["points"]), b["points"])


def test_augment_identity_when_disabled(rng):
    b = detection_batch(rng, 1, 256, 4, max_boxes=8)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    out = augment_batch(
        batch, jax.random.key(0), flip_x=False, flip_y=False, rot_range=0.0,
        scale_range=None,
    )
    np.testing.assert_allclose(np.asarray(out["points"]), b["points"],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["gt_sizes"]), b["gt_sizes"])


def test_augment_scales_everything_together(rng):
    b = detection_batch(rng, 1, 256, 4, max_boxes=8)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    out = augment_batch(batch, jax.random.key(1), flip_x=False, flip_y=False,
                        rot_range=0.0, scale_range=(1.5, 1.5))
    np.testing.assert_allclose(
        np.asarray(out["points"]), 1.5 * b["points"], rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out["gt_sizes"])[:, b["gt_mask"][0]],
        1.5 * b["gt_sizes"][:, b["gt_mask"][0]],
        rtol=1e-6,
    )


def test_augment_multi_candidate_votes(rng):
    """[B,N,V,3] vote targets keep their shape and transform per candidate."""
    b = detection_batch(rng, 1, 128, 4, max_boxes=8)
    vt = np.repeat(b["vote_targets"][:, :, None, :], 2, axis=2)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    batch["vote_targets"] = jnp.asarray(vt)
    out = augment_batch(batch, jax.random.key(2))
    assert out["vote_targets"].shape == vt.shape
    flat = dict(out)
    flat["vote_targets"] = out["vote_targets"][:, :, 0, :]
    _vote_consistency(flat)


def test_device_synthetic_batch(rng):
    batch = synthetic_detection_batch(
        jax.random.key(0), 2, 512, num_classes=4, max_boxes=16
    )
    assert batch["points"].shape == (2, 512, 3)
    assert batch["gt_centers"].shape == (2, 16, 3)
    gm = np.asarray(batch["gt_mask"])
    assert (gm.sum(-1) >= 3).all() and (gm.sum(-1) <= 8).all()
    _vote_consistency(batch)
    # boxes sit on the floor
    gc = np.asarray(batch["gt_centers"])
    gs = np.asarray(batch["gt_sizes"])
    np.testing.assert_allclose(gc[gm][:, 2], gs[gm][:, 2] / 2, rtol=1e-5)


def test_device_synth_train_step(rng):
    """One jitted train step end-to-end on a device-generated batch with
    device augmentation enabled."""
    from tpu3dsad import train_lib
    from tpu3dsad.config import Config, DataConfig, ModelConfig, TrainConfig
    from tpu3dsad.models.detector import SizeAdaptiveDetector

    cfg = Config(
        model=ModelConfig(
            num_classes=4,
            sa_npoints=(64, 32, 16, 8),
            sa_nsamples=(8, 8, 4, 4),
            sa_channels=((16, 16), (16, 32), (16, 32), (16, 32)),
            fp_channels=((32, 32), (32, 32)),
            seed_feat_dim=32,
            num_proposals=16,
            cluster_nsample=4,
        ),
        data=DataConfig(name="synthetic", num_points=256, max_boxes=8,
                        device_synth=True, device_augment=True),
        train=TrainConfig(batch_size=2),
    )
    batch = synthetic_detection_batch(
        jax.random.key(0), 2, 256, num_classes=4, max_boxes=8
    )
    model = SizeAdaptiveDetector(cfg.model)
    v = jax.jit(
        lambda k: model.init(
            k, batch["points"], mask=batch["point_mask"], train=False
        )
    )(jax.random.key(0))
    tx = train_lib.make_optimizer(cfg.train, 10)
    state = train_lib.TrainState.create(
        apply_fn=model.apply, params=v["params"],
        batch_stats=v["batch_stats"], tx=tx,
    )
    train_step, _ = train_lib.make_detector_steps(model, cfg)
    state, metrics = train_step(state, batch, jax.random.key(1), 0.9)
    assert np.isfinite(float(metrics["loss"]))


def test_synthetic_batch_small_max_boxes_truncates(rng):
    """max_boxes < max_objects must truncate like the host path's
    pad_boxes (regression: negative pad traced jnp.zeros((B,-4,3)))."""
    b = synthetic_detection_batch(
        jax.random.key(3), 2, 128, num_classes=4, max_boxes=4
    )
    assert b["gt_centers"].shape == (2, 4, 3)
    assert b["gt_mask"].shape == (2, 4)
    assert bool(b["gt_mask"].any())
    # votes still land on some kept GT center for voting points
    vm = np.asarray(b["vote_mask"][0])
    if vm.any():
        tgt = np.asarray(b["points"][0])[vm] + np.asarray(
            b["vote_targets"][0]
        )[vm]
        gt = np.asarray(b["gt_centers"][0])[np.asarray(b["gt_mask"][0])]
        d = np.min(np.linalg.norm(tgt[:, None] - gt[None], axis=-1), axis=-1)
        # a vote may target a truncated (dropped) box; most should match
        assert np.median(d) < 1.0


def test_device_synth_candidate_votes_match_oracle(rng):
    """vote_candidates>1 on device == pipeline.candidate_votes semantics:
    slot 0 = primary owner; slots 1..V-1 = OTHER containing boxes under
    oriented containment, box-index order; unused slots copy the primary.
    (The device path is cumsum-rank + einsum, not argsort — this pins it
    to the host oracle on the generated scene itself.)"""
    from tpu3dsad.data.pipeline import candidate_votes

    b = synthetic_detection_batch(
        jax.random.key(11), 3, 512, num_classes=4, max_boxes=8,
        vote_candidates=3,
    )
    assert b["vote_targets"].shape == (3, 512, 3, 3)
    pts = np.asarray(b["points"])
    votes = np.asarray(b["vote_targets"])
    vm = np.asarray(b["vote_mask"])
    gc = np.asarray(b["gt_centers"])
    gs = np.asarray(b["gt_sizes"])
    gh = np.asarray(b["gt_headings"])
    gm = np.asarray(b["gt_mask"])
    for bi in range(pts.shape[0]):
        g = int(gm[bi].sum())
        centers, sizes, headings = gc[bi][:g], gs[bi][:g], gh[bi][:g]
        # recover the primary owner from slot 0 (exact: offsets point at
        # the owning center)
        owner = np.full(pts.shape[1], -1, np.int64)
        if vm[bi].any():
            tgt = pts[bi][vm[bi]] + votes[bi][vm[bi], 0]
            owner[vm[bi]] = np.argmin(
                np.sum((tgt[:, None] - centers[None]) ** 2, -1), axis=1
            )
        want = candidate_votes(
            pts[bi], votes[bi, :, 0], vm[bi], owner,
            centers, sizes, headings, 3,
        )
        np.testing.assert_allclose(
            votes[bi][vm[bi]], want[vm[bi]], atol=1e-5
        )
