"""Raw SUN RGB-D → .npy contract (data/preproc_sunrgbd.py): the MATLAB-free
depth back-projection (toolbox bit-rotation, 1-based pixel grid, Rtilt
upright transform), OBB conversion self-consistency against the loader's
own containment test, the lineage 10-col votes layout, and the full
meta.mat → exporter → sunrgbd loader path."""

import os

import numpy as np
import pytest
from scipy.io import savemat

from tpu3dsad.config import Config, apply_overrides
from tpu3dsad.data.preproc_sunrgbd import (
    convert_box,
    depth_to_points,
    export_all,
    lineage_votes,
    read_depth,
)
from tpu3dsad.data.registry import get_dataset
from tpu3dsad.data.augment import rot_z
from tpu3dsad.data.sunrgbd import points_in_oriented_box


def _encode_depth(mm: np.ndarray) -> np.ndarray:
    """Inverse of the toolbox read rotation: store mm rotated left by 3."""
    mm = mm.astype(np.uint16)
    return (mm << 3) | (mm >> 13)


def _write_depth_png(path, mm):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(_encode_depth(mm), mode="I;16").save(path)


def _basis_rows(heading):
    c, s = np.cos(heading), np.sin(heading)
    return np.array([[c, s, 0.0], [-s, c, 0.0], [0.0, 0.0, 1.0]])


def test_read_depth_bit_rotation_and_cap(tmp_path):
    mm = np.array([[2000, 9000], [0, 137]], np.uint16)
    _write_depth_png(str(tmp_path / "d.png"), mm)
    meters = read_depth(str(tmp_path / "d.png"))
    np.testing.assert_allclose(
        meters, [[2.0, 8.0], [0.0, 0.137]], atol=1e-6  # 9 m caps at 8
    )


def test_depth_backprojection_analytic():
    h, w = 4, 6
    fx, fy, cx, cy = 100.0, 110.0, 3.0, 2.0
    k = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    ang = 0.1  # gravity tilt about the camera x axis
    rtilt = np.array(
        [[1, 0, 0],
         [0, np.cos(ang), -np.sin(ang)],
         [0, np.sin(ang), np.cos(ang)]]
    )
    depth = np.full((h, w), 2.0, np.float32)
    depth[0, 0] = 0.0  # dropped
    rgb = np.full((h, w, 3), 128, np.uint8)
    pc = depth_to_points(depth, k, rtilt, rgb)
    assert pc.shape == (h * w - 1, 6)
    np.testing.assert_allclose(pc[:, 3:], 128 / 255.0, atol=1e-6)
    # pixel (u=2, v=1) 1-based → flat index 1 (pixel 0 was dropped)
    d = 2.0
    cam = np.array([(2 - cx) * d / fx, d, -(1 - cy) * d / fy])
    np.testing.assert_allclose(pc[0, :3], rtilt @ cam, atol=1e-5)


@pytest.mark.parametrize("z_row_first", [False, True])
def test_convert_box_matches_loader_containment(z_row_first):
    heading, center = 0.6, np.array([1.0, 2.0, 0.5])
    half = np.array([0.8, 0.4, 0.3])
    basis, coeffs = _basis_rows(heading), half.copy()
    if z_row_first:  # row order must be normalized, not assumed
        basis = basis[[2, 0, 1]]
        coeffs = coeffs[[2, 0, 1]]
    row = convert_box(basis, coeffs, center, "bed")
    np.testing.assert_allclose(row[:3], center, atol=1e-6)
    np.testing.assert_allclose(row[3:6], half * 2, atol=1e-6)
    np.testing.assert_allclose(row[6], heading, atol=1e-6)
    assert row[7] == 0  # bed
    # the loader's containment test accepts the box's own (shrunk) corners
    corners = np.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]
    ) * (half * 0.999)
    world = corners @ rot_z(heading).T + center
    assert points_in_oriented_box(world, row[:3], row[3:6], row[6]).all()
    outside = center + rot_z(heading) @ (half * [1.05, 0, 0])
    assert not points_in_oriented_box(
        outside[None], row[:3], row[3:6], row[6]
    ).any()


def test_convert_box_drops_non_benchmark():
    assert convert_box(np.eye(3), np.ones(3), np.zeros(3), "whiteboard") is None


def test_lineage_votes_candidates():
    # two overlapping axis-aligned boxes; p0 in both, p1 in box A, p2 free
    bbox = np.array(
        [[0, 0, 0, 2, 2, 2, 0.0, 0], [0.5, 0, 0, 2, 2, 2, 0.0, 1]],
        np.float32,
    )
    pts = np.array([[0.4, 0.1, 0.0], [-0.8, 0.0, 0.0], [5.0, 5.0, 5.0]])
    votes = lineage_votes(pts, bbox)
    assert votes.shape == (3, 10)
    np.testing.assert_array_equal(votes[:, 0], [1, 1, 0])
    np.testing.assert_allclose(votes[0, 1:4], bbox[0, :3] - pts[0], atol=1e-6)
    np.testing.assert_allclose(votes[0, 4:7], bbox[1, :3] - pts[0], atol=1e-6)
    np.testing.assert_allclose(votes[0, 7:10], votes[0, 1:4])  # repeat first
    for s in (slice(1, 4), slice(4, 7), slice(7, 10)):  # single box: all =
        np.testing.assert_allclose(votes[1, s], bbox[0, :3] - pts[1], atol=1e-6)
    np.testing.assert_array_equal(votes[2, 1:], 0)


def test_lineage_votes_fourth_box_overwrites_slot3():
    """Lineage sunrgbd_data.py clamps point_vote_idx at 2: a 4th containing
    box OVERWRITES candidate slot 3 (index 2), it is not skipped (ADVICE
    r3 low #2). p0 sits inside four nested boxes."""
    bbox = np.array(
        [[0.0, 0, 0, 8, 8, 8, 0.0, 0],
         [0.1, 0, 0, 8, 8, 8, 0.0, 1],
         [0.2, 0, 0, 8, 8, 8, 0.0, 2],
         [0.3, 0, 0, 8, 8, 8, 0.0, 3]],
        np.float32,
    )
    pts = np.array([[0.0, 0.0, 0.0]])
    votes = lineage_votes(pts, bbox)
    assert votes[0, 0] == 1.0
    np.testing.assert_allclose(votes[0, 1:4], bbox[0, :3], atol=1e-6)
    np.testing.assert_allclose(votes[0, 4:7], bbox[1, :3], atol=1e-6)
    # slot 3 holds the FOURTH box's offset (overwrote the third)
    np.testing.assert_allclose(votes[0, 7:10], bbox[3, :3], atol=1e-6)


def _write_raw_tree(tmp_path, n_scenes=3):
    root = tmp_path / "data"
    k = np.array([[90.0, 0, 8.0], [0, 90.0, 6.0], [0, 0, 1.0]])
    rtilt = np.eye(3)
    heading = 0.3
    # a bed-sized box right in front of the camera (upright y = depth)
    center, half = np.array([0.0, 2.0, 0.0]), np.array([1.05, 0.8, 0.45])
    gt = np.zeros(
        (2,),
        dtype=[("basis", "O"), ("coeffs", "O"), ("centroid", "O"),
               ("classname", "O")],
    )
    gt[0] = (_basis_rows(heading), half, center, "bed")
    gt[1] = (np.eye(3), np.ones(3), np.zeros(3), "whiteboard")  # dropped
    metas = np.zeros(
        (n_scenes,),
        dtype=[("sequenceName", "O"), ("depthpath", "O"), ("rgbpath", "O"),
               ("Rtilt", "O"), ("K", "O"), ("groundtruth3DBB", "O")],
    )
    mm = np.full((12, 16), 2000, np.uint16)
    from PIL import Image

    for i in range(n_scenes):
        seq = f"kv1/scene{i}"
        depth_abs = f"/n/fs/sun3d/data/SUNRGBD/{seq}/depth/0001.png"
        rgb_abs = f"/n/fs/sun3d/data/SUNRGBD/{seq}/image/0001.jpg"
        _write_depth_png(str(root / "SUNRGBD" / seq / "depth" / "0001.png"), mm)
        rgb_dir = root / "SUNRGBD" / seq / "image"
        os.makedirs(rgb_dir, exist_ok=True)
        Image.fromarray(
            np.full((12, 16, 3), 200, np.uint8)
        ).save(str(rgb_dir / "0001.jpg"))
        metas[i] = (seq, depth_abs, rgb_abs, rtilt, k, gt)
    meta_path = str(tmp_path / "SUNRGBDMeta3DBB_v2.mat")
    savemat(meta_path, {"SUNRGBDMeta": metas})
    return meta_path, str(root), (center, half * 2, heading)


def test_export_all_feeds_the_loader(tmp_path, rng):
    meta_path, root, (center, size, heading) = _write_raw_tree(tmp_path)
    (tmp_path / "val.txt").write_text("000003\n")
    out = str(tmp_path / "npy")
    counts = export_all(meta_path, root, out, val_list=str(tmp_path / "val.txt"))
    assert counts == {"train": 2, "val": 1}

    pc = np.load(os.path.join(out, "train", "000001_pc.npy"))
    assert pc.shape == (12 * 16, 6) and pc.dtype == np.float32
    np.testing.assert_allclose(pc[:, 1], 2.0, atol=1e-6)  # flat 2 m plane
    np.testing.assert_allclose(pc[:, 3:], 200 / 255.0, atol=1e-3)
    votes = np.load(os.path.join(out, "train", "000001_votes.npy"))
    assert votes.shape == (12 * 16, 10) and votes[:, 0].any()

    cfg = apply_overrides(
        Config(),
        ["data.name=sunrgbd", f"data.root={out}", "data.num_points=128",
         "data.max_boxes=8", "data.augment=false", "data.vote_candidates=3"],
    )
    ds = get_dataset(cfg)
    assert len(ds.train_items) == 2 and len(ds.val_items) == 1
    batch = ds.train_batch(rng, 2)
    assert batch["points"].shape == (2, 128, 3)
    assert batch["vote_targets"].shape == (2, 128, 3, 3)
    gt = batch["gt_mask"]
    assert gt.sum() == 2  # one benchmark box per scene
    np.testing.assert_allclose(batch["gt_centers"][gt][0], center, atol=1e-5)
    np.testing.assert_allclose(batch["gt_sizes"][gt][0], size, atol=1e-5)
    np.testing.assert_allclose(batch["gt_headings"][gt][0], heading, atol=1e-5)
    assert (batch["gt_classes"][gt] == 0).all()
    # the precomputed 10-col votes drive vote_mask (augment off)
    assert batch["vote_mask"].any()


def test_export_output_passes_validate(tmp_path, rng):
    from tpu3dsad.data.validate import validate_root

    meta_path, root, _ = _write_raw_tree(tmp_path, n_scenes=1)
    out = str(tmp_path / "npy")
    export_all(meta_path, root, out)
    rep = validate_root("sunrgbd", out)
    assert rep.errors == []
