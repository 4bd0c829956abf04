"""Packed memory-mapped dataset format (data/packed.py): pack → reload
fidelity, registry integration, val coverage, device prefetch."""

import numpy as np
import pytest

from tests.e2e.test_datasets import _write_scannet

from tpu3dsad.config import Config, apply_overrides
from tpu3dsad.data.packed import PackedSplit, device_prefetch, pack_dataset
from tpu3dsad.data.registry import get_dataset


def _scannet_cfg(root, extra=()):
    return apply_overrides(
        Config(),
        ["data.name=scannet", f"data.root={root}", "data.num_points=256",
         "data.max_boxes=8", "data.augment=false", *extra],
    )


@pytest.fixture
def packed_root(tmp_path):
    src = tmp_path / "src"
    _write_scannet(src, split="train", scans=5)
    _write_scannet(src, split="val", scans=3)
    dst = tmp_path / "packed"
    counts = pack_dataset(get_dataset(_scannet_cfg(src)), str(dst))
    assert counts == {"train": 5, "val": 3}
    return src, dst


def test_pack_is_bitwise_the_source_loader(packed_root):
    """Scene i of the pack == _load_scene with rng(pack_seed + i): packing
    freezes exactly what the source loader produces."""
    src, dst = packed_root
    ds = get_dataset(_scannet_cfg(src))
    split = PackedSplit(str(dst / "train"))
    assert len(split) == 5
    for i in (0, 2, 4):
        want = ds._load_scene(
            *ds.train_scans[i], np.random.default_rng(i), False
        )
        got = split.scene(i)
        assert set(got) == set(want)
        for k in want:
            np.testing.assert_array_equal(np.asarray(got[k]), want[k], err_msg=k)


def test_packed_dataset_protocol(packed_root, rng):
    src, dst = packed_root
    cfg = apply_overrides(
        Config(),
        ["data.name=packed", f"data.root={dst}", "data.num_points=256",
         "data.max_boxes=8"],
    )
    ds = get_dataset(cfg)
    assert ds.num_classes == 18
    assert ds.mean_sizes.shape == (18, 3)
    assert ds.steps_per_epoch(2) == 2
    b = ds.train_batch(rng, 3)
    assert b["points"].shape == (3, 256, 3)
    assert b["points"].dtype == np.float32
    assert b["gt_mask"].any()

    # every val scene scored exactly once, tail batch padded + masked
    seen = 0
    for batch in ds.val_batches(rng, 2):
        assert batch["points"].shape[0] == 2
        seen += int(batch["scene_mask"].sum())
    assert seen == 3


def test_packed_num_points_mismatch_raises(packed_root):
    _, dst = packed_root
    cfg = apply_overrides(
        Config(),
        ["data.name=packed", f"data.root={dst}", "data.num_points=512"],
    )
    with pytest.raises(ValueError, match="num_points"):
        get_dataset(cfg)


def test_packed_missing_root_raises(tmp_path):
    cfg = apply_overrides(
        Config(), ["data.name=packed", f"data.root={tmp_path / 'nope'}"]
    )
    with pytest.raises(FileNotFoundError):
        get_dataset(cfg)


def test_device_prefetch_order_and_content(packed_root, rng):
    """The double-buffered feed changes WHEN transfers dispatch, never what
    arrives: same batches, same order, nothing dropped."""
    _, dst = packed_root
    cfg = apply_overrides(
        Config(),
        ["data.name=packed", f"data.root={dst}", "data.num_points=256",
         "data.max_boxes=8"],
    )
    ds = get_dataset(cfg)
    host = [ds.train_batch(np.random.default_rng(7), 2) for _ in range(5)]
    out = list(device_prefetch(iter(host), mesh=None, depth=2))
    assert len(out) == 5
    for h, d in zip(host, out):
        assert set(h) == set(d)
        np.testing.assert_array_equal(np.asarray(d["points"]), h["points"])
        np.testing.assert_array_equal(np.asarray(d["gt_classes"]), h["gt_classes"])


def test_packed_train_smoke(packed_root, tmp_path):
    """One real detector epoch from the packed form via the train CLI path."""
    _, dst = packed_root
    from tpu3dsad.config import parse_cli
    from tpu3dsad.train_detector import run_detector

    cfg = parse_cli(
        ["model.name=detector", "data.name=packed", f"data.root={dst}",
         "data.num_points=256", "data.max_boxes=8",
         "data.device_augment=true",
         "model.sa_npoints=(64,32,16,8)", "model.sa_nsamples=(8,8,4,4)",
         "model.sa_channels=((16,16),(16,32),(16,32),(16,32))",
         "model.fp_channels=((32,32),(32,32))", "model.seed_feat_dim=32",
         "model.num_proposals=16", "model.cluster_nsample=4",
         "train.batch_size=8", "train.num_epochs=1",
         "train.eval_every=1000", f"train.ckpt_dir={tmp_path / 'ckpt'}"]
    )
    run_detector(cfg)


def test_packed_max_boxes_mismatch_raises(packed_root):
    _, dst = packed_root
    cfg = apply_overrides(
        Config(),
        ["data.name=packed", f"data.root={dst}", "data.num_points=256",
         "data.max_boxes=16"],
    )
    with pytest.raises(ValueError, match="max_boxes"):
        get_dataset(cfg)


def test_packed_use_color_mismatch_raises(packed_root):
    # the pack has no point_features; asking for color must fail loudly
    # instead of silently training colorless
    _, dst = packed_root
    cfg = apply_overrides(
        Config(),
        ["data.name=packed", f"data.root={dst}", "data.num_points=256",
         "data.max_boxes=8", "data.use_color=true"],
    )
    with pytest.raises(ValueError, match="point_features"):
        get_dataset(cfg)
