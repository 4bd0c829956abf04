"""Synthetic indoor generator (data/synthetic_indoor.py): contract with the
ScanNet loader and the packed pipeline — the real-data switchover path
demonstrated end to end on fabricated scenes."""

import numpy as np

from tpu3dsad.config import Config, apply_overrides
from tpu3dsad.data.packed import PackedSplit, pack_dataset
from tpu3dsad.data.registry import get_dataset
from tpu3dsad.data.scannet import NYU40_IDS, SCANNET_MEAN_SIZES
from tpu3dsad.data.synthetic_indoor import indoor_scene, write_dataset


def test_scene_contract(rng):
    verts, ins, sem, bbox = indoor_scene(rng, num_points=4000)
    assert verts.shape == (4000, 6) and verts.dtype == np.float32
    assert ins.shape == (4000,) and sem.shape == (4000,)
    g = len(bbox)
    assert 3 <= g <= 8 and bbox.shape == (g, 7)
    # rgb in range, nyu40 class column valid
    assert (verts[:, 3:] >= 0).all() and (verts[:, 3:] <= 255).all()
    assert all(int(b[6]) in NYU40_IDS for b in bbox)
    # structure points are unannotated; object points carry 1-based ids
    assert (ins >= 0).all() and ins.max() == g
    assert set(np.unique(sem[ins == 0])) <= {1, 2}
    # every labeled point sits on (within noise of) its box surface
    for i in range(g):
        p = verts[ins == i + 1, :3]
        assert len(p) > 100
        slack = np.abs(p - bbox[i, :3]) - bbox[i, 3:6] / 2
        assert slack.max() <= 0.05, f"object {i} points leak outside the box"
    # sizes track the real ScanNet priors (the bank sees its templates)
    cls = np.array([NYU40_IDS.index(int(b[6])) for b in bbox])
    ratio = bbox[:, 3:6] / SCANNET_MEAN_SIZES[cls]
    assert (ratio >= 0.8 - 1e-6).all() and (ratio <= 1.25 + 1e-6).all()


def test_writes_load_and_pack(tmp_path, rng):
    root = tmp_path / "indoor"
    write_dataset(str(root), scenes=3, val_scenes=2, num_points=1500, seed=7)
    cfg = apply_overrides(
        Config(),
        ["data.name=scannet", f"data.root={root}", "data.num_points=512",
         "data.max_boxes=16", "data.vote_candidates=3",
         "data.augment=false"],
    )
    ds = get_dataset(cfg)
    assert len(ds.train_scans) == 3 and len(ds.val_scans) == 2
    batch = ds.train_batch(rng, 2)
    assert batch["points"].shape == (2, 512, 3)
    assert batch["vote_targets"].shape == (2, 512, 3, 3)
    assert batch["vote_mask"].any(), "annotated objects must produce votes"
    assert batch["gt_mask"].sum(-1).min() >= 3  # every scene kept its boxes

    dst = tmp_path / "pack"
    counts = pack_dataset(ds, str(dst), source_dataset="scannet")
    assert counts == {"train": 3, "val": 2}
    split = PackedSplit(str(dst / "train"))
    want = ds._load_scene(*ds.train_scans[1], np.random.default_rng(1), False)
    got = split.scene(1)
    for k in want:
        np.testing.assert_array_equal(np.asarray(got[k]), want[k], err_msg=k)
