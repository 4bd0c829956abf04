"""Synthetic oriented generator (data/synthetic_sunrgbd.py): contract with
the SUN RGB-D loader, the validate CLI, and the packed pipeline — the
ORIENTED real-data switchover path demonstrated on fabricated scenes."""

import numpy as np
import pytest

from tpu3dsad.config import Config, apply_overrides
from tpu3dsad.data.packed import PackedSplit, pack_dataset
from tpu3dsad.data.registry import get_dataset
from tpu3dsad.data.sunrgbd import (
    SUNRGBD_MEAN_SIZES,
    points_in_oriented_box,
)
from tpu3dsad.data.synthetic_sunrgbd import oriented_scene, write_dataset
from tpu3dsad.data.validate import validate_root


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_scene_contract(rng):
    pc, bbox, votes = oriented_scene(rng, num_points=4000)
    assert pc.shape == (4000, 6) and pc.dtype == np.float32
    g = len(bbox)
    assert 3 <= g <= 8 and bbox.shape == (g, 8)
    assert votes.shape == (4000, 10) and votes.dtype == np.float32
    # rgb stored 0-1 (the sunrgbd contract), classes 0..9, real headings
    assert (pc[:, 3:] >= 0).all() and (pc[:, 3:] <= 1).all()
    assert set(bbox[:, 7].astype(int)) <= set(range(10))
    assert np.abs(bbox[:, 6]).max() > 0.3, "headings should span rotations"
    # sizes track the real SUN RGB-D priors
    cls = bbox[:, 7].astype(int)
    ratio = bbox[:, 3:6] / SUNRGBD_MEAN_SIZES[cls]
    assert (ratio >= 0.8 - 1e-6).all() and (ratio <= 1.25 + 1e-6).all()


def test_votes_oriented_containment(rng):
    """Vote rows agree with oriented containment, and candidate-0 offsets
    point at a real box center."""
    pc, bbox, votes = oriented_scene(rng, num_points=3000)
    inside_any = np.zeros(len(pc), bool)
    for row in bbox:
        inside_any |= points_in_oriented_box(
            pc[:, :3].astype(np.float64), row[:3], row[3:6], row[6]
        )
    np.testing.assert_array_equal(votes[:, 0] > 0.5, inside_any)
    voters = votes[:, 0] > 0.5
    assert voters.sum() > 200
    target = pc[voters, :3] + votes[voters, 1:4]
    d = np.linalg.norm(target[:, None, :] - bbox[None, :, :3], axis=-1)
    assert d.min(axis=1).max() < 1e-4, "candidate-0 must hit a box center"


def test_writes_validate_load_and_pack(tmp_path, rng):
    root = tmp_path / "sun"
    write_dataset(str(root), scenes=3, val_scenes=2, num_points=1500, seed=7)

    rep = validate_root("sunrgbd", str(root))
    assert not rep.errors, rep.errors
    assert rep.scenes == 5

    cfg = apply_overrides(
        Config(),
        ["data.name=sunrgbd", f"data.root={root}", "data.num_points=512",
         "data.max_boxes=16", "data.vote_candidates=3",
         "data.use_color=true", "data.augment=false"],
    )
    ds = get_dataset(cfg)
    batch = ds.train_batch(rng, 2)
    assert batch["points"].shape == (2, 512, 3)
    assert batch["vote_targets"].shape == (2, 512, 3, 3)
    assert batch["vote_mask"].any()
    assert np.abs(batch["gt_headings"]).max() > 0.1, "oriented GT expected"
    assert batch["point_features"].shape == (2, 512, 3)  # rgb kept

    dst = tmp_path / "pack"
    counts = pack_dataset(ds, str(dst), source_dataset="sunrgbd")
    assert counts == {"train": 3, "val": 2}
    split = PackedSplit(str(dst / "train"))
    want = ds._load_scene(*ds.train_items[1], np.random.default_rng(1), False)
    got = split.scene(1)
    for k in want:
        np.testing.assert_allclose(
            got[k], want[k], err_msg=k, rtol=1e-6, atol=1e-6
        )
