"""Real-dataset loaders exercised against fabricated on-disk fixtures
(the documented .npy contracts), covering configs #3 (ScanNet), #2 (SUN
RGB-D), #4 (KITTI crop+FPS)."""

import numpy as np
import pytest

from tpu3dsad.config import Config, apply_overrides
from tpu3dsad.data.registry import get_dataset


def _write_scannet(root, split="train", scans=3, n=500):
    d = root / split
    d.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(scans):
        verts = np.concatenate(
            [rng.uniform(-3, 3, (n, 3)), rng.uniform(0, 255, (n, 3))], 1
        ).astype(np.float32)
        ins = rng.integers(0, 4, n)
        sem = np.where(ins > 0, 5, 0)  # nyu40 id 5 = chair
        bbox = np.array(
            [[0.5, 0.5, 0.5, 1, 1, 1, 5], [-1, -1, 0.4, 1, 1, 0.8, 4]],
            np.float32,
        )
        np.save(d / f"scene{i:04d}_vert.npy", verts)
        np.save(d / f"scene{i:04d}_ins_label.npy", ins)
        np.save(d / f"scene{i:04d}_sem_label.npy", sem)
        np.save(d / f"scene{i:04d}_bbox.npy", bbox)


def _write_oriented(root, split="train", scenes=3, n=800, cols=6, nc=10):
    d = root / split
    d.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(scenes):
        pc = rng.uniform(-5, 5, (n, cols)).astype(np.float32)
        pc[:, 0] = np.abs(pc[:, 0]) * 5  # keep some in KITTI front range
        bbox = np.array(
            [
                [2.0, 0.0, 0.5, 1.5, 1.0, 1.0, 0.3, 1 % nc],
                [5.0, 1.0, 0.2, 2.0, 1.2, 0.8, -0.5, 0],
            ],
            np.float32,
        )
        np.save(d / f"{i:06d}_pc.npy", pc)
        np.save(d / f"{i:06d}_bbox.npy", bbox)


def _check_batch(b, B, N, max_boxes, V=3):
    assert b["points"].shape == (B, N, 3)
    assert b["point_mask"].shape == (B, N)
    # default vote_candidates=3 → [B,N,V,3]; V=1 keeps the compact [B,N,3]
    want_vshape = (B, N, 3) if V == 1 else (B, N, V, 3)
    assert b["vote_targets"].shape == want_vshape
    assert b["gt_centers"].shape == (B, max_boxes, 3)
    assert b["gt_mask"].any()
    # votes consistent: voting point + EVERY candidate offset ≈ a GT center
    # (candidates are exact centers of containing boxes or primary copies)
    for bi in range(B):
        vm = b["vote_mask"][bi] & b["point_mask"][bi]
        if not vm.any():
            continue
        vt = b["vote_targets"][bi][vm]
        if vt.ndim == 2:
            vt = vt[:, None, :]
        tgt = b["points"][bi][vm][:, None, :] + vt  # [n,V,3]
        gt = b["gt_centers"][bi][b["gt_mask"][bi]]
        d = np.min(
            np.linalg.norm(tgt[:, :, None] - gt[None, None], axis=-1), axis=-1
        )
        assert d.max() < 0.75, d.max()  # instance medians near a box center


def test_scannet_loader(tmp_path, rng):
    _write_scannet(tmp_path)
    cfg = apply_overrides(
        Config(),
        ["data.name=scannet", f"data.root={tmp_path}", "data.num_points=256",
         "data.max_boxes=8", "data.augment=true"],
    )
    ds = get_dataset(cfg)
    assert ds.num_classes == 18
    b = ds.train_batch(rng, 2)
    _check_batch(b, 2, 256, 8)


def test_sunrgbd_loader(tmp_path, rng):
    _write_oriented(tmp_path)
    cfg = apply_overrides(
        Config(),
        ["data.name=sunrgbd", f"data.root={tmp_path}", "data.num_points=256",
         "data.max_boxes=8"],
    )
    ds = get_dataset(cfg)
    assert ds.num_classes == 10
    b = ds.train_batch(rng, 2)
    _check_batch(b, 2, 256, 8)


def test_kitti_loader_crop_and_fps(tmp_path, rng):
    _write_oriented(tmp_path, n=2000, cols=4, nc=3)
    cfg = apply_overrides(
        Config(),
        ["data.name=kitti", f"data.root={tmp_path}", "data.num_points=512",
         "data.max_boxes=8", "data.augment=false"],
    )
    ds = get_dataset(cfg)
    b = ds.train_batch(rng, 2)
    _check_batch(b, 2, 512, 8)
    # crop guarantee: every valid point inside the range box
    from tpu3dsad.data.kitti import RANGE_MAX, RANGE_MIN

    for bi in range(2):
        pts = b["points"][bi][b["point_mask"][bi]]
        assert (pts >= RANGE_MIN - 1e-5).all() and (pts <= RANGE_MAX + 1e-5).all()


def test_sunrgbd_precomputed_votes(tmp_path, rng):
    """When augmentation is off, <idx>_votes.npy is used verbatim."""
    _write_oriented(tmp_path)
    d = tmp_path / "train"
    for i in range(3):
        n = 800
        votes = np.zeros((n, 4), np.float32)
        votes[:100, 0] = 1.0
        votes[:100, 1:] = 7.0  # sentinel offsets
        np.save(d / f"{i:06d}_votes.npy", votes)
    cfg = apply_overrides(
        Config(),
        ["data.name=sunrgbd", f"data.root={tmp_path}", "data.num_points=256",
         "data.max_boxes=8", "data.augment=false"],
    )
    ds = get_dataset(cfg)
    b = ds.train_batch(rng, 2)
    vm = b["vote_mask"]
    assert vm.any()
    assert (b["vote_targets"][vm] == 7.0).all()


def test_missing_root_raises():
    cfg = apply_overrides(
        Config(), ["data.name=scannet", "data.root=/nonexistent"]
    )
    with pytest.raises(FileNotFoundError):
        get_dataset(cfg)


def test_host_fps_matches_device_semantics(rng):
    from tpu3dsad.data.kitti import device_fps, host_fps
    from tpu3dsad.ops.oracle import fps_oracle

    pts = rng.standard_normal((300, 3)).astype(np.float32)
    np.testing.assert_array_equal(host_fps(pts, 50), fps_oracle(pts, 50))
    np.testing.assert_array_equal(device_fps(pts, 50), fps_oracle(pts, 50))


def test_scannet_color_features_train_step(tmp_path, rng):
    """use_color=true: loaders emit point_features and the detector train
    step consumes them (lineage use_color flag)."""
    import jax
    import jax.numpy as jnp

    from tpu3dsad import train_lib
    from tpu3dsad.train_detector import build_detector

    _write_scannet(tmp_path, scans=2, n=300)
    cfg = apply_overrides(
        Config(),
        ["data.name=scannet", f"data.root={tmp_path}", "data.num_points=256",
         "data.max_boxes=8", "data.use_color=true",
         "model.sa_npoints=(64,32,16,8)", "model.sa_nsamples=(8,8,4,4)",
         "model.sa_channels=((16,16),(16,32),(16,32),(16,32))",
         "model.fp_channels=((32,32),(32,32))", "model.seed_feat_dim=32",
         "model.num_proposals=16", "model.cluster_nsample=4",
         "train.batch_size=2"],
    )
    ds = get_dataset(cfg)
    b = ds.train_batch(rng, 2)
    assert b["point_features"].shape == (2, 256, 3)
    assert b["point_features"].max() <= 1.0

    batch = {k: jnp.asarray(v) for k, v in b.items()}
    model = build_detector(cfg, ds.mean_sizes)
    variables = jax.jit(
        lambda k: model.init(
            k, batch["points"], batch["point_features"],
            mask=batch["point_mask"], train=False,
        )
    )(jax.random.key(0))
    tx = train_lib.make_optimizer(cfg.train, 10)
    state = train_lib.TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables["batch_stats"], tx=tx,
    )
    train_step, _ = train_lib.make_detector_steps(model, cfg)
    state, metrics = train_step(state, batch, jax.random.key(1), 0.9)
    assert np.isfinite(float(metrics["loss"]))


def test_val_batches_cover_remainder(tmp_path, rng):
    """VERDICT r1 weak #3: 5 val scenes at batch_size=2 must all be scored
    exactly once; the tail batch is padded with scene_mask=False."""
    _write_scannet(tmp_path, split="val", scans=5)
    _write_scannet(tmp_path, split="train", scans=1)
    cfg = apply_overrides(
        Config(),
        ["data.name=scannet", f"data.root={tmp_path}", "data.num_points=128",
         "data.max_boxes=8"],
    )
    ds = get_dataset(cfg)
    batches = list(ds.val_batches(np.random.default_rng(0), 2))
    assert len(batches) == 3  # ceil(5/2), not floor
    masks = np.concatenate([b["scene_mask"] for b in batches])
    assert masks.sum() == 5
    assert list(masks) == [True, True, True, True, True, False]
    for b in batches:
        assert b["points"].shape[0] == 2  # static batch shape


def test_iter_val_batches_unit():
    from tpu3dsad.data.pipeline import iter_val_batches

    items = list(range(7))
    seen = []
    for b in iter_val_batches(items, lambda i: {"x": np.float32(i)}, 3):
        assert b["x"].shape == (3,)
        seen += [int(v) for v, m in zip(b["x"], b["scene_mask"]) if m]
    assert seen == items  # every item once, in order
    # exact multiple: no padded batch
    bs = list(iter_val_batches(items[:6], lambda i: {"x": np.float32(i)}, 3))
    assert len(bs) == 2 and all(b["scene_mask"].all() for b in bs)
    # empty: no batches
    assert list(iter_val_batches([], lambda i: {"x": np.float32(i)}, 3)) == []


def test_scannet_multi_candidate_votes(tmp_path, rng):
    """data.vote_candidates>1: [N,V,3] targets; slot 0 is the instance
    vote; extra slots hold other containing boxes or copy the primary
    (losses.py vote_loss min-over-candidates convention)."""
    _write_scannet(tmp_path)
    cfg = apply_overrides(
        Config(),
        ["data.name=scannet", f"data.root={tmp_path}", "data.num_points=256",
         "data.max_boxes=8", "data.augment=false", "data.vote_candidates=3"],
    )
    ds = get_dataset(cfg)
    b = ds.train_batch(rng, 2)
    assert b["vote_targets"].shape == (2, 256, 3, 3)
    # every candidate of a voting point lands on SOME GT center
    for bi in range(2):
        vm = b["vote_mask"][bi]
        if not vm.any():
            continue
        pts = b["points"][bi][vm]  # [n,3]
        for v in range(3):
            tgt = pts + b["vote_targets"][bi][vm][:, v]
            gt = b["gt_centers"][bi][b["gt_mask"][bi]]
            d = np.min(np.linalg.norm(tgt[:, None] - gt[None], axis=-1), axis=-1)
            assert d.max() < 0.75
    # the DEFAULT is the lineage GT_VOTE_FACTOR=3 ([N,3,3]); an explicit
    # vote_candidates=1 gives the compact single-owner [N,3]
    cfg_def = apply_overrides(
        Config(),
        ["data.name=scannet", f"data.root={tmp_path}", "data.num_points=256",
         "data.max_boxes=8"],
    )
    assert get_dataset(cfg_def).train_batch(rng, 1)[
        "vote_targets"
    ].shape == (1, 256, 3, 3)
    cfg1 = apply_overrides(
        Config(),
        ["data.name=scannet", f"data.root={tmp_path}", "data.num_points=256",
         "data.max_boxes=8", "data.vote_candidates=1"],
    )
    assert get_dataset(cfg1).train_batch(rng, 1)["vote_targets"].shape == (1, 256, 3)


def test_scannet_overlap_extra_candidate_is_other_box(tmp_path, rng):
    """Regression: a voting point inside TWO boxes must carry the other
    containing box in an extra slot — the primary owner (slot 0) used to
    crowd it out because cands included the owner itself."""
    d = tmp_path / "train"
    d.mkdir(parents=True)
    n = 64
    verts = np.zeros((n, 6), np.float32)
    verts[:, :3] = [0.4, 0.0, 0.0]  # inside both boxes below
    ins = np.ones(n, np.int64)
    sem = np.full(n, 5, np.int64)  # nyu40 5 = chair
    bbox = np.array(
        [[0.0, 0.0, 0.0, 2, 2, 2, 5],    # box A
         [0.5, 0.0, 0.0, 2, 2, 2, 4]],   # box B (closer to the instance)
        np.float32,
    )
    np.save(d / "scene0000_vert.npy", verts)
    np.save(d / "scene0000_ins_label.npy", ins)
    np.save(d / "scene0000_sem_label.npy", sem)
    np.save(d / "scene0000_bbox.npy", bbox)

    cfg = apply_overrides(
        Config(),
        ["data.name=scannet", f"data.root={tmp_path}", "data.num_points=64",
         "data.max_boxes=4", "data.augment=false", "data.vote_candidates=2"],
    )
    b = get_dataset(cfg).train_batch(rng, 1)
    vm = b["vote_mask"][0]
    assert vm.all()
    pts = b["points"][0]
    # slot 0 = primary owner (B, nearest to the instance median)
    np.testing.assert_allclose(
        pts + b["vote_targets"][0][:, 0],
        np.tile([0.5, 0, 0], (len(pts), 1)), atol=1e-6,
    )
    # slot 1 = the OTHER containing box (A), not a copy of the owner
    np.testing.assert_allclose(
        pts + b["vote_targets"][0][:, 1],
        np.tile([0.0, 0, 0], (len(pts), 1)), atol=1e-6,
    )
